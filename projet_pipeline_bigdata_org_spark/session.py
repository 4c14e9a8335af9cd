"""SparkSession factory.

Improves on the reference's global-module config (reference spark/config.py:1-17,
spark/engine.py:13-39) with one builder that pins the settings the oracle
comparison and local benchmarking need:

- UTC session timezone (Spark timestamps are session-tz; DuckDB's are naive UTC)
- AQE on (runtime re-plan, skew-join handling, partition coalescing)
- shuffle partitions sized to local cores, not the 200 default
- Arrow enabled for every pandas_udf / toPandas exchange

At cluster scale the same factory applies; only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


#: confs every query needs regardless of who built the SparkSession (the
#: external driver constructs its own session without our builder). All are
#: runtime-settable SQL confs; applied idempotently by catalog.load.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",  # oracle timestamp parity
    "spark.sql.legacy.parquet.nanosAsLong": "true",  # events TIMESTAMP(NANOS)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": str(DEFAULT_SHUFFLE_PARTITIONS),
}

_ENSURED: set[int] = set()


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's required runtime confs to an externally-built
    session (idempotent, once per session object)."""
    key = id(spark)
    if key not in _ENSURED:
        for k, v in RUNTIME_CONFS.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # non-settable on some deployments; builder path covers it
        _ENSURED.add(key)
    return spark


def get_spark(
    app_name: str = "projet_pipeline_bigdata_org_spark",
    cpus: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, else all local cores.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type —
        # read as long and convert to micros in catalog.load (DuckDB-equivalent
        # truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # local-mode scan parallelism: testdata tables are single small
        # parquet files; the 128m default gives 1-task scans on 32 cores.
        # Cluster deployments override via SPARK_GRAFT_MAX_PARTITION_BYTES.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
