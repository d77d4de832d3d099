"""Relational operators (reference R1-R7, SURVEY.md §2.2) and extensions."""

from bigdata_rags_spark.operators.relational import (
    derive_metrics,
    multi_join,
    project_rename,
    rollup_sum,
    safe_div,
)

__all__ = ["derive_metrics", "multi_join", "project_rename", "rollup_sum", "safe_div"]
