"""Multimodal column handling (SURVEY.md §2.12): opaque binary payloads with
typed metadata, decoded/feature-extracted through ``mapInPandas``.

The container has no image/audio libraries, so the *decode kernel* is a
clearly-marked deterministic stub (``decode_media_stub``) / NotImplementedError
(``decode_media_real``) — but the Spark-side plumbing is real and tested:
binary column construction, Arrow batch iteration, output schema, and the
partitioning that keeps decode batches balanced.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.plans.registry import query

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long, mime string"
)


def decode_media_real(payload: bytes) -> dict:
    """Real media decode — requires image/audio libs not present in this
    environment. Kept as the explicit integration point."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg; use decode_media_stub in tests"
    )


def decode_media_stub(payload: bytes) -> dict:
    """STUB decode: deterministic pseudo-metadata derived from byte length.
    Mirrors the arithmetic of the SQL oracle so plumbing is verifiable."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640 + 1,
        "height": n % 480 + 1,
        "n_frames": n % 30 + 1,
        "mime": "application/octet-stream",
    }


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload column → typed media metadata.
    Operates on whole Arrow batches; per-row decode happens in-process
    (at scale: one task per input partition, no driver involvement)."""
    for pdf in batches:
        metas = [decode_media_stub(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out[["doc_id", "n_bytes", "width", "height", "n_frames", "mime"]]


@query(
    "mm_decode_metadata",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS BIGINT) AS width,
           CAST(OCTET_LENGTH(ENCODE(text)) % 480 + 1 AS BIGINT) AS height,
           CAST(OCTET_LENGTH(ENCODE(text)) % 30 + 1 AS BIGINT) AS n_frames,
           'application/octet-stream' AS mime
    FROM documents
    """,
    tags=("llm", "multimodal", "documents"),
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: text → binary payload (stand-in for
    image/audio bytes) → mapInPandas stub decode → typed metadata.

    The oracle reproduces the stub's arithmetic from OCTET_LENGTH(ENCODE(text)) (documents
    are ASCII so chars == bytes), proving the Arrow round-trip end-to-end.
    Scale note: decode is embarrassingly parallel; repartition on doc_id
    keeps batches balanced when payload sizes are skewed.
    """
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


FRAME_STRIDE = 5
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_ms long, n_frames long"


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one input row (doc_id, payload) fans out to one
    row per SAMPLED frame (every FRAME_STRIDE-th of the stub's n_frames) —
    the UDTF-shaped expansion a video/audio frame sampler performs. Frame
    timestamps assume 25 fps (40 ms per frame)."""
    for pdf in batches:
        out_rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = decode_media_stub(payload)["n_frames"]
            for idx in range(0, n_frames, FRAME_STRIDE):
                out_rows.append((doc_id, idx, idx * 40, n_frames))
        if out_rows:  # empty object-dtype frames break Arrow schema inference
            yield pd.DataFrame(
                out_rows, columns=["doc_id", "frame_idx", "frame_ms", "n_frames"]
            )


@query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(UNNEST(GENERATE_SERIES(0, OCTET_LENGTH(ENCODE(text)) % 30, {FRAME_STRIDE})) AS BIGINT)
             AS frame_idx,
           CAST(UNNEST(GENERATE_SERIES(0, OCTET_LENGTH(ENCODE(text)) % 30, {FRAME_STRIDE})) * 40 AS BIGINT)
             AS frame_ms,
           CAST(OCTET_LENGTH(ENCODE(text)) % 30 + 1 AS BIGINT) AS n_frames
    FROM documents
    """,
    tags=("llm", "multimodal", "documents"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media payloads: binary column →
    mapInPandas kernel that expands each payload into its sampled frame
    rows (every 5th frame of the stub-decoded frame count). The kernel is
    the real Arrow fan-out plumbing a video pipeline needs; only the decode
    arithmetic is stubbed (and mirrored by the oracle via GENERATE_SERIES
    over OCTET_LENGTH(ENCODE(text)) % 30). Scale: expansion is per-partition with no
    shuffle; output size is bounded by n_frames/stride per input row."""
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInPandas(frame_sample_batches, schema=FRAME_SCHEMA)


@query(
    "mm_payload_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
           CAST(MAX(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY source
    """,
    tags=("llm", "multimodal", "documents"),
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-size profile per source — the partition-planning scan that
    precedes a large decode job (sizes drive maxPartitionBytes / salt
    decisions)."""
    d = load(spark, sf_dir, "documents")
    payload = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(payload.cast("long")).alias("total_bytes"),
        F.max(payload).cast("long").alias("max_bytes"),
    )


def arrow_byte_stats_batches(batches):
    """mapInArrow kernel: pyarrow RecordBatch in, RecordBatch out, zero
    pandas materialization — the lowest-overhead Python hook Spark offers.
    Computes per-payload byte stats with pyarrow compute kernels (C++,
    vectorized); the binary buffers are never copied into Python objects."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        payload = batch.column("payload")
        n_bytes = pc.binary_length(payload)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(n_bytes, pa.int64()),
                pc.cast(pc.bit_wise_and(n_bytes, 4095), pa.int64()),
            ],
            ["doc_id", "n_bytes", "tail_block_bytes"],
        )


@query(
    "mm_arrow_byte_stats",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           CAST(OCTET_LENGTH(ENCODE(text)) & 4095 AS BIGINT) AS tail_block_bytes
    FROM documents
    """,
    tags=("llm", "multimodal", "arrow", "documents"),
)
def mm_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload byte statistics via ``mapInArrow`` — the zero-copy Arrow
    surface (mapInPandas converts each batch to pandas; mapInArrow hands
    the raw RecordBatch to pyarrow compute, which matters when payloads
    are large media blobs: no per-row Python objects, no pandas copies).
    tail_block_bytes (= n_bytes mod 4 KiB) is the alignment stat a blob
    store packer wants. Embarrassingly parallel, no shuffle."""
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInArrow(
        arrow_byte_stats_batches,
        schema="doc_id long, n_bytes long, tail_block_bytes long",
    )
