"""PySpark-native analytics engine with the capabilities of the reference
Reddit financial-sentiment pipeline (Projet-BigData-Reddit/Projet_Pipeline_BigData_org),
re-expressed Spark-first, plus the relational / streaming / LLM-data-pipeline
operator surface described in SURVEY.md §2.

Layout
------
- ``session``    : SparkSession factory (AQE, UTC, Arrow, local[N])
- ``catalog``    : loaders for the driver-provided parquet tables
- ``plans``      : query registry — every operator is a ``(spark, sf_dir) -> DataFrame``
                   with an optional DuckDB oracle-SQL twin
- ``operators``  : relational core, dedup, similarity, text analysis, multimodal
- ``functions``  : scalar column packs (cleaning, temporal, buckets, extraction)
- ``sources``    : batch/streaming readers and failover sinks
- ``streaming``  : event-time windows, watermarks, sessionization
- ``ml``         : SparkML feature/virality pipeline (reference M1-M10)
"""

__version__ = "0.1.0"
