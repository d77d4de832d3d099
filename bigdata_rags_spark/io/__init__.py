"""Sources, sinks, and zone layout (reference operators S1-S14, SURVEY.md §2.1)."""

from bigdata_rags_spark.io.bucketing import cobucketed_join, read_bucketed, write_bucketed
from bigdata_rags_spark.io.readers import read_csv, read_jdbc, read_parquet, read_testdata
from bigdata_rags_spark.io.writers import (
    export_single_csv,
    write_jdbc_replace,
    write_partitioned,
)
from bigdata_rags_spark.io.zones import (
    ZoneLayout,
    read_status,
    verify_zone_status,
    write_status_marker,
)

__all__ = [
    "cobucketed_join",
    "read_bucketed",
    "write_bucketed",
    "read_csv",
    "read_jdbc",
    "read_parquet",
    "read_testdata",
    "export_single_csv",
    "write_jdbc_replace",
    "write_partitioned",
    "ZoneLayout",
    "read_status",
    "verify_zone_status",
    "write_status_marker",
]
