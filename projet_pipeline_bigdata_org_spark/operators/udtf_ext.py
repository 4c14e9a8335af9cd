"""Python UDTF surface (Spark 4 ``@udtf`` — one input row to many output
rows with arbitrary Python logic): an overlapping token-window document
chunker, the sequence-packing preprocessing step an LLM training pipeline
runs before tokenization.

The UDTF is the API exemplar — the same expansion is expressible pure-JVM
via slice/posexplode (see operators/timeseries.py) and that is the 100 TB
hot path; the UDTF form is for chunkers whose boundary logic (sentence
models, semantic splitters) genuinely needs Python. Chunking itself is
embarrassingly parallel: no shuffle, each task expands its own partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.operators.textops import SQL_WS_TOKENS
from projet_pipeline_bigdata_org_spark.plans.registry import query

#: 32-token windows every 24 tokens → 8-token (25%) overlap between chunks
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@udtf(
    returnType="doc_id bigint, chunk_idx bigint, n_chunk_tokens bigint, chunk_text string",
    useArrow=True,
)
class ChunkDocument:
    """Each (doc_id, text) row yields one row per overlapping token window.
    Tokenization is single-space split with empties dropped — the exact
    twin of SQL_WS_TOKENS, so the DuckDB oracle reproduces it."""

    def eval(self, doc_id: int, text: str):
        toks = [t for t in (text or "").split(" ") if t]
        for start in range(0, len(toks), CHUNK_STRIDE):
            part = toks[start : start + CHUNK_TOKENS]
            yield doc_id, start // CHUNK_STRIDE, len(part), " ".join(part)


@query(
    "udtf_chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_WS_TOKENS.format(c='text')} AS toks FROM documents),
    s AS (SELECT doc_id, toks, UNNEST(RANGE(0, LEN(toks), {CHUNK_STRIDE})) AS start FROM t)
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(LEN(LIST_SLICE(toks, start + 1, start + {CHUNK_TOKENS})) AS BIGINT) AS n_chunk_tokens,
           ARRAY_TO_STRING(LIST_SLICE(toks, start + 1, start + {CHUNK_TOKENS}), ' ') AS chunk_text
    FROM s
    """,
    tags=("llm", "text", "udtf", "documents"),
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking via a registered Python UDTF in a
    LATERAL join — every document expands to ceil(n_tokens/stride) chunks
    of up to CHUNK_TOKENS tokens. The oracle states the same expansion with
    RANGE + LIST_SLICE."""
    spark.udtf.register("chunk_document", ChunkDocument)
    d = load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.n_chunk_tokens, c.chunk_text "
        "FROM _udtf_docs d, LATERAL chunk_document(d.doc_id, d.text) c"
    )
