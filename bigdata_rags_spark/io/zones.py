"""Three-zone lake layout + status markers (reference S3-S6, S9-S11).

The reference lays keys out as
``{zone}/{source}/{table}/year=YYYY/month=MM/day=DD/{table}_{YYYYMMDD}.csv``
(reference dag-extract.py:75, dag-transform.py:104-109) and coordinates stages
via ``_SUCCESS``/``_ERROR`` marker objects (reference dag-extract.py:128-132,
dag-transform.py:393-412) checked by gate probes (dag-transform.py:54-63,
dag-load.py:23-39).

Rebuild: same Hive-style layout (so partition pruning works), run date is an
explicit parameter — the reference derives it from module-import-time
``datetime.now()`` (dag-transform.py:44-47), a day-rollover bug (SURVEY §3.2).
Markers are tiny files on any Hadoop-visible filesystem; probes are
``exists()`` checks, no boto3.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import json
import os
from pathlib import Path

SUCCESS, ERROR = "SUCCESS", "ERROR"


@dataclasses.dataclass(frozen=True)
class ZoneLayout:
    """Path builder for one lake root (local path or s3a:// URI)."""

    root: str
    source: str = "mysql"

    def date_part(self, run_date: dt.date) -> str:
        return f"year={run_date.year}/month={run_date.month:02d}/day={run_date.day:02d}"

    def table_dir(self, zone: str, table: str, run_date: dt.date) -> str:
        # reference dag-extract.py:75 / dag-transform.py:104-109
        return f"{self.root}/{zone}/{self.source}/{table}/{self.date_part(run_date)}"

    def status_dir(self, zone: str, run_date: dt.date) -> str:
        # reference dag-extract.py:128-132
        return f"{self.root}/{zone}/{self.source}/status/{self.date_part(run_date)}"

    def marker_path(self, zone: str, name: str, status: str, run_date: dt.date) -> str:
        return f"{self.status_dir(zone, run_date)}/{name}_{status}"


def write_status_marker(
    layout: ZoneLayout,
    zone: str,
    name: str,
    status: str,
    run_date: dt.date,
    detail: dict | None = None,
) -> str:
    """Reference S4/S10: one `{name}_{SUCCESS|ERROR}` object per dataset.

    Carries an optional JSON manifest body (row counts etc.) — the reference's
    markers are empty local files re-uploaded via boto3
    (dag-extract.py:134-156); ours are written directly.
    """
    path = layout.marker_path(zone, name, status, run_date)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(detail or {}, sort_keys=True))
    return path


def read_status(layout: ZoneLayout, zone: str, name: str, run_date: dt.date) -> str | None:
    """Return SUCCESS/ERROR/None for a dataset's marker (probe, reference S5)."""
    for status in (SUCCESS, ERROR):
        if os.path.exists(layout.marker_path(zone, name, status, run_date)):
            return status
    return None


def verify_zone_status(
    layout: ZoneLayout, zone: str, names: list[str], run_date: dt.date
) -> bool:
    """Gate predicate: every dataset must have a SUCCESS marker for the run
    date (reference ShortCircuit gate, dag-transform.py:55-63).  Dedupes the
    name list — the reference extracts ``interception_team`` twice
    (dag-extract.py:31,36), harmless there, deduped here (SURVEY §7.4.5).
    """
    return all(read_status(layout, zone, n, run_date) == SUCCESS for n in dict.fromkeys(names))
