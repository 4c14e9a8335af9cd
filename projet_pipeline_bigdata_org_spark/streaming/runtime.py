"""Structured Streaming runtime: sources, watermarked transforms, and the
reference's micro-batch lifecycle (SURVEY.md §2.11 T1-T6) rebuilt on
idiomatic building blocks.

Reference semantics preserved:
- rate limiting per trigger      (T2: maxOffsetsPerTrigger=50 → maxFilesPerTrigger)
- checkpointing                  (T3: checkpointLocation)
- foreachBatch with failover     (T4: try Cassandra → except Mongo,
                                  engine.py:169-219 — here primary/fallback
                                  writers, NO driver collect, unlike the
                                  reference's toPandas() fallback)
- replay / loss tolerance        (T5: earliest offsets → file source reads all)
- empty-batch guard              (P9: engine.py:101,170)
Plus the gaps the reference lacks: watermarks, event-time windows,
dropDuplicatesWithinWatermark.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

#: canonical streaming-record schema (reference engine.py:224-231)
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("subreddit", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("timestamp", T.DoubleType()),
        T.StructField("score", T.IntegerType()),
    ]
)


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,  # keyword-only: a positional None in the fmt slot NPEs inside Spark
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-based streaming source (the test stand-in for Kafka; S1).
    maxFilesPerTrigger plays maxOffsetsPerTrigger's rate-limit role."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Built-in rate source (timestamp, value) for smoke tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 50,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka source with the reference's exact options (engine.py:234-241).
    Requires the spark-sql-kafka package on the classpath (not in this
    container — constructed lazily, used in production deployments)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )


def parse_json_records(kafka_df: DataFrame, schema: T.StructType = RECORD_SCHEMA) -> DataFrame:
    """Kafka value bytes → typed columns (P1+P2: CAST value AS STRING →
    from_json → flatten; engine.py:245-247)."""
    return (
        kafka_df.selectExpr("CAST(value AS STRING) AS raw")
        .select(F.from_json("raw", schema).alias("data"))
        .select("data.*")
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts — the canonical stateful agg.
    Late rows beyond the watermark are dropped (append mode)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), *keys, "n_events")
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with bounded state (dropDuplicatesWithinWatermark):
    the id-dedup capability (reference S8) with state that expires instead
    of growing forever."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


BatchWriter = Callable[[DataFrame, int], None]


def parquet_batch_writer(path: str) -> BatchWriter:
    def write(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("append").parquet(path)

    return write


def json_batch_writer(path: str) -> BatchWriter:
    def write(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("append").json(path)

    return write


def idempotent_parquet_batch_writer(path: str) -> BatchWriter:
    """Exactly-once foreachBatch parquet: each epoch OVERWRITES its own
    ``epoch=<id>`` partition directory, so a replayed batch (checkpoint
    restart after a half-committed epoch) rewrites the same partition
    instead of appending duplicates — the idempotent-write discipline
    foreachBatch needs for exactly-once (plain append writers are
    at-least-once under replay). ``spark.read.parquet(path)`` recovers the
    epoch as a partition column."""

    def write(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    return write


@dataclass
class FailoverBatchSink:
    """foreachBatch sink with primary→fallback failover (reference T4/S5/S6,
    engine.py:169-219), minus its anti-patterns: no per-batch count() job,
    no toPandas() driver collect — the fallback is a distributed write too.

    A transform callable runs inside the micro-batch (the reference's
    _transform_batch slot). Poison batches are counted and dropped after
    both sinks fail (the reference's outer try/except)."""

    primary: BatchWriter
    fallback: BatchWriter | None = None
    transform: Callable[[DataFrame], DataFrame] | None = None
    stats: dict = field(default_factory=lambda: {"batches": 0, "empty": 0, "failover": 0, "dropped": 0})

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.stats["batches"] += 1
        if batch_df.isEmpty():  # P9 empty-batch guard
            self.stats["empty"] += 1
            return
        df = self.transform(batch_df) if self.transform else batch_df
        # row accounting rides the write job via observe() — the reference
        # ran a separate count() job per batch (engine.py:204 anti-pattern)
        from pyspark.sql import Observation

        obs = Observation(f"sink_epoch_{epoch_id}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        try:
            self.primary(df, epoch_id)
            self.stats["rows_written"] = self.stats.get("rows_written", 0) + (
                obs.get.get("rows", 0)
            )
        except Exception as primary_err:
            self.stats["failover"] += 1
            log.warning("primary sink failed for epoch %s: %s", epoch_id, primary_err)
            if self.fallback is None:
                self.stats["dropped"] += 1
                return
            try:
                self.fallback(df, epoch_id)
            except Exception as fallback_err:  # drop poison batch, keep stream alive
                self.stats["dropped"] += 1
                log.error(
                    "fallback sink failed for epoch %s: %s", epoch_id, fallback_err
                )


@dataclass
class HistoryDedupSink:
    """Exactly-once streaming dedup against a persisted historical corpus —
    the foreachBatch form of ``operators.dedup.dedup_incremental_exact``
    (reference analogue: S8's driver-side id-skip,
    test/data_ingestion/testpy.py:130-131, made streaming-native and
    content-addressed).

    Per micro-batch (epoch ``e``):
    1. within-batch duplicates collapse to the min-id keeper (map-side
       partial agg, same keeper rule as ``dedup_exact_hash``); upstream
       ``dedup_within_watermark`` already bounds in-flight dups across
       batches — this is the at-rest guard;
    2. admission: an anti-join drops rows whose content sha exists in the
       history table *from epochs strictly before e* — the strict bound is
       the replay-safety invariant: a restarted epoch sees exactly the
       history state its first run saw, so it can never anti-join away its
       own (already-recorded) shas;
    3. admitted rows overwrite ``out/epoch=e`` and their shas overwrite
       ``history/epoch=e`` (both idempotent epoch-partition writes, like
       ``idempotent_parquet_batch_writer``) — replaying an epoch rewrites
       both partitions identically instead of appending duplicates.

    Scale shape: only 64-hex shas join — at 100 TB the history side is a
    bucketed-by-sha staging table (sources/batch.py: write_bucketed_table),
    making the per-batch anti-join zero-shuffle on the history side while
    each micro-batch shuffles only its own delta; epoch partition pruning
    keeps the strict-epoch filter a metadata operation."""

    spark: SparkSession
    out_path: str
    history_path: str
    content_col: str = "text"
    id_col: str = "event_id"
    stats: dict = field(default_factory=lambda: {"batches": 0, "admitted": 0, "rejected": 0})

    def _history_before(self, epoch_id: int) -> DataFrame:
        import os

        if not os.path.isdir(self.history_path):
            return self.spark.createDataFrame([], "content_sha string")
        return (
            self.spark.read.parquet(self.history_path)
            .filter(F.col("epoch") < epoch_id)
            .select("content_sha")
            .distinct()
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.stats["batches"] += 1
        if batch_df.isEmpty():  # P9 empty-batch guard
            return
        hashed = batch_df.withColumn(
            "content_sha", F.sha2(F.col(self.content_col), 256)
        )
        keeper = hashed.groupBy("content_sha").agg(
            F.min(self.id_col).alias(self.id_col)
        )
        batch = hashed.join(keeper, ["content_sha", self.id_col])
        # one membership join, persisted for the batch: the stats agg, the
        # output write, and the history write all read the cache — no
        # separate count() job per consumer (the reference's per-batch
        # count() at engine.py:204 is the anti-pattern this avoids)
        joined = batch.join(
            self._history_before(epoch_id).withColumn("in_history", F.lit(1)),
            "content_sha",
            "left",
        ).persist()
        try:
            n_batch, n_dup = joined.agg(
                F.count(F.lit(1)), F.count("in_history")
            ).first()
            self.stats["admitted"] += n_batch - n_dup
            self.stats["rejected"] += n_dup
            admitted = joined.filter(F.col("in_history").isNull())
            admitted.drop("content_sha", "in_history").write.mode(
                "overwrite"
            ).parquet(f"{self.out_path}/epoch={epoch_id}")
            admitted.select("content_sha").write.mode("overwrite").parquet(
                f"{self.history_path}/epoch={epoch_id}"
            )
        finally:
            joined.unpersist()


def start_foreach_batch(
    df: DataFrame,
    sink: FailoverBatchSink,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    output_mode: str = "append",
):
    """writeStream.foreachBatch with checkpointing (T1/T3/T6). Call
    .processAllAvailable() / .awaitTermination() on the returned query."""
    writer = (
        df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
