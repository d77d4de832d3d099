"""Driver-facing query registry (consumed by __spark_entry__)."""

from bigdata_rags_spark.queries.catalog import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
