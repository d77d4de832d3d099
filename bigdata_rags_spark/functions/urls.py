"""URL/domain column expressions for web-corpus curation.

Standard web-pipeline curation steps (CCNet/C4/RefinedWeb lineage) key
quality decisions by SOURCE DOMAIN: per-domain quotas, per-domain dedup
rates, subdomain fan-out.  These helpers parse URLs with pure codegen'd
column expressions (regexp + split — no UDF, no network):

- ``url_host``: scheme/userinfo/port/path stripped, lowercased.
- ``url_path``: the path component ('' when absent), query/fragment
  stripped.
- ``registrable_domain``: the last two host labels ("news.example.com" ->
  "example.com").  NAIVE BY DESIGN: a faithful eTLD+1 needs the Mozilla
  public-suffix list (a broadcast join against a ~10k-row table at real
  scale — same plan shape, just a lookup side input); the 2-label rule is
  the standard self-contained simplification and is wrong for multi-label
  suffixes like "co.uk".

All logic is deterministic string algebra, mirrored 1:1 by the DuckDB
oracle SQL in queries/llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC 3986 scheme: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) followed by ://
_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"


def _after_scheme(url: Column) -> Column:
    return F.regexp_replace(url, _SCHEME_RE, "")


def url_host(url: Column) -> Column:
    """Lowercased host: scheme, path/query/fragment, and :port stripped."""
    hostport = F.split(_after_scheme(url), "[/?#]").getItem(0)
    return F.lower(F.split(hostport, ":").getItem(0))


def url_path(url: Column) -> Column:
    """Path component starting at '/', query/fragment stripped; '' if none."""
    return F.regexp_extract(_after_scheme(url), "(/[^?#]*)", 1)


def registrable_domain(host: Column) -> Column:
    """Last two dot-labels of the host (see module docstring for the
    public-suffix caveat); the host itself when it has fewer than two."""
    labels = F.split(host, "\\.")
    return F.when(
        F.size(labels) >= 2,
        F.concat(F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)),
    ).otherwise(host)
