"""The reference's Reddit ingestion (S3: PRAW comment stream,
data_ingestion.py:121-141) re-expressed as a first-class Spark **Python
DataSource** (Spark 4 API) instead of an out-of-engine producer process.

``spark.read.format("reddit_fixture")`` yields the canonical record schema
(engine.py:224-231) from a deterministic seeded generator — the stand-in
for the real API client, which would live in exactly this reader with the
same partitioning contract. The streaming variant implements
DataSourceStreamReader over an integer offset, so trigger/availableNow/
checkpoint semantics (T1-T5) all apply without Kafka. By default the
stream exposes all rows in one poll (``batchRows`` then only shards the
read into tasks); set ``pollRows`` for true per-trigger admission control
(the reference's maxOffsetsPerTrigger) under a processingTime trigger.

Scale posture: batch reads are split into ``partitions`` independent
generator ranges (one task each, no driver data path); a real API-backed
reader would shard by listing cursor the same way.
"""

from __future__ import annotations

import random
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

RECORD_SCHEMA_DDL = (
    "id string, author string, subreddit string, text string, "
    "timestamp double, score int"
)

_SUBREDDITS = ("CryptoCurrency", "wallstreetbets", "stocks", "Bitcoin")
_WORDS = (
    "btc", "eth", "moon", "hodl", "crash", "pump", "bull", "bear",
    "buy", "sell", "market", "coin", "stock", "yield", "margin",
)
_BASE_TS = 1700000000.0


def _gen_record(i: int) -> tuple:
    rng = random.Random(42 + i)
    text = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(4, 12)))
    return (
        f"rf{i:08d}",
        f"user{rng.randint(0, 999)}",
        rng.choice(_SUBREDDITS),
        text,
        _BASE_TS + i,
        rng.randint(0, 500),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RedditFixtureDataSource(DataSource):
    """Batch + streaming Python data source for the canonical Reddit record.

    Options: ``rows`` (total records, default 1000), ``partitions``
    (batch split count, default 4), ``batchRows`` (streaming read-task
    granularity within a planned batch, default 50), ``pollRows``
    (records admitted per latestOffset() poll — the reference's
    maxOffsetsPerTrigger, engine.py:239; 0/unset = expose everything at
    once, which is what availableNow needs from a Python source).
    """

    @classmethod
    def name(cls) -> str:
        return "reddit_fixture"

    def schema(self) -> str:
        return RECORD_SCHEMA_DDL

    def reader(self, schema) -> "RedditFixtureReader":
        return RedditFixtureReader(self.options)

    def streamReader(self, schema) -> "RedditFixtureStreamReader":
        return RedditFixtureStreamReader(self.options)


class RedditFixtureReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _gen_record(i)


class RedditFixtureStreamReader(DataSourceStreamReader):
    """Integer-offset micro-batch stream: offset == records emitted so far.
    Replay-safe: any (start, end) range regenerates identical records, so
    checkpoint recovery re-reads exactly the lost batch (T3/T5).

    With ``pollRows`` set, a driver-side cursor advances by that many
    records per latestOffset() poll — per-trigger admission control under a
    processingTime trigger. After a checkpoint restart the fresh reader's
    cursor starts at 0; partitions() re-syncs it to the restored start
    offset (Spark hands the reader no other restart signal), at the cost of
    at most one empty catch-up batch. availableNow captures latestOffset
    ONCE at query start, so rate-limited mode would stop at one poll's
    worth — use the default drain mode (pollRows unset) with availableNow.
    """

    def __init__(self, options):
        self.batch_rows = int(options.get("batchRows", 50))
        self.max_rows = int(options.get("rows", 1000))
        self.poll_rows = int(options.get("pollRows", 0))
        self._cur = 0  # driver-side admission cursor (pollRows mode only)

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        if self.poll_rows <= 0:
            return {"offset": self.max_rows}
        self._cur = min(self._cur + self.poll_rows, self.max_rows)
        return {"offset": self._cur}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["offset"], end["offset"]
        # restart re-sync: a checkpointed offset ahead of the fresh cursor
        # means this is recovery — jump the cursor forward; the planned
        # (lo, hi<lo) catch-up batch is empty by the clamp below
        self._cur = max(self._cur, lo, hi)
        hi = max(hi, lo)
        out, step = [], self.batch_rows
        for s in range(lo, hi, step):
            out.append(_RangePartition(s, min(s + step, hi)))
        return out or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _gen_record(i)

    def commit(self, end: dict) -> None:
        pass


def register(spark) -> None:
    """Idempotently register the data source on a session."""
    spark.dataSource.register(RedditFixtureDataSource)
