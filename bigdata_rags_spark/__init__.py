"""bigdata_rags_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of ``nicocartalla/bigdata-rags`` (a three-zone medallion ETL whose
analytical core is PySpark joins/aggregations/derived metrics; see SURVEY.md),
extended with the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) a 100 TB training-data pipeline needs.

Design stance (SURVEY.md §7.1):
- one shared ``SparkSession``; declarative DataFrame/SQL plans so Catalyst
  does pruning/pushdown/broadcast/AQE;
- explicit schemas, Parquet zones with Hive partitioning and commit markers;
- transforms are pure ``DataFrame -> DataFrame`` functions;
- no ``collect()``/driver-side loops in any hot path; Pandas UDFs only where
  built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
