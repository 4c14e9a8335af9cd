"""Event-time window operators (SURVEY.md §2.11 gaps — the reference carries
event time as a column but never windows on it).

Each operator is expressed once over a plain DataFrame, so the identical
plan runs in batch (oracle-checked below on the events table) and under
``readStream`` (exercised with watermarks in streaming/runtime.py tests).
window()/session_window() are Catalyst-native — state stores handle them
incrementally in streaming; in batch they're plain expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.functions.exact import dec, dsum
from projet_pipeline_bigdata_org_spark.plans.registry import query

SESSION_GAP = "30 minutes"


@query(
    "event_window_tumbling",
    oracle="""
    SELECT STRFTIME(TIME_BUCKET(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "events"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation (epoch-aligned, identical to
    DuckDB time_bucket). Under readStream the same plan + withWatermark is
    an incremental stateful agg; at 100 TB/stream-scale state is bounded by
    watermark horizon × group cardinality."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_sliding_counts",
    oracle="""
    WITH slid AS (
      SELECT UNNEST([TIME_BUCKET(INTERVAL '5 minutes', ts),
                     TIME_BUCKET(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws,
             value
      FROM events)
    SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM slid
    GROUP BY 1
    """,
    tags=("streaming", "window", "events"),
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 (each event lands in exactly two
    windows; the oracle materializes that expansion with UNNEST)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "event_window_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL '{SESSION_GAP}'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, sid
    """,
    tags=("streaming", "window", "events"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via native session_window (30-min gap; a new
    event at exactly start+gap opens a new session — the oracle's >= mirrors
    the half-open [start, last+gap) semantics). Streaming: identical
    expression with a watermark; state merges sessions incrementally."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "session_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@query(
    "event_asof_last_purchase",
    oracle="""
    SELECT event_id, user_id, event_type,
           STRFTIME(MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    '%Y-%m-%d %H:%M:%S') AS last_purchase_at,
           EPOCH_US(ts) - EPOCH_US(MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             AS micros_since_purchase
    FROM events
    """,
    tags=("streaming", "window", "events", "asof"),
)
def stream_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest prior event of a type, per key) expressed as a
    running MAX over a CASE column — no join at all, one shuffle on the
    partition key. The streaming twin is a stream-stream join with
    watermark; this windowed form is the batch/backfill path."""
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_purchase = F.max(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format(last_purchase, "yyyy-MM-dd HH:mm:ss").alias("last_purchase_at"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(last_purchase)).alias(
            "micros_since_purchase"
        ),
    )
