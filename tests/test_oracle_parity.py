"""Local replica of the driver's t2 oracle-differential gate.

Every catalog query that declares oracle SQL must hash-match DuckDB on the
same parquet fixtures (row count + column set + order-insensitive values).
"""

from __future__ import annotations

import pytest

from bigdata_rags_spark.queries.catalog import REGISTRY
from bigdata_rags_spark.testing import run_parity

ORACLE_SPECS = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_parity(spark, sf_oracle, name):
    problems = run_parity(REGISTRY[name], spark, sf_oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark, sf_smoke):
    for name, spec in REGISTRY.items():
        df = spec.spark(spark, sf_smoke)
        assert df.count() >= 0, name
