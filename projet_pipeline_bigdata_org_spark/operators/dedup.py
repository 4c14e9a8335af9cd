"""Deduplication operators for LLM-data pipelines (SURVEY.md §2.12):
exact (hash groupBy), near-dup via n-gram Jaccard (oracle-checked),
MinHash+LSH band join (the 100 TB scale path), and SimHash.

Seed in the reference: pure-Python id-dedup (test/data_ingestion/
testpy.py:130-131, operator S8) — here re-expressed as distributed
hash-partition-and-aggregate plans.

Scale design: every variant is shuffle-on-key (hash or band bucket), no
driver collects, no pairwise blowup — candidate pairs come from equi-joins
on content keys (hash / shingle / band), so 100 TB dedups like a big
groupBy, and AQE's skew handling covers hot buckets (e.g. boilerplate
shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.functions.cleaning import clean_text
from projet_pipeline_bigdata_org_spark.operators.textops import (
    SQL_TOK_NULLSAFE,
    SQL_WS_TOKENS,
    shingles,
    sql_shingles,
    ws_tokens,
)
from projet_pipeline_bigdata_org_spark.plans.registry import query

JACCARD_THRESHOLD = 0.12

#: document-frequency cap for the shingle inverted index: a shingle shared by
#: more than this many documents (boilerplate headers, license blurbs) is
#: dropped from the POSTINGS before the self-join — without it one hot
#: shingle creates a quadratic bucket no equi-join/AQE can save at 10^9 docs.
#: Set-size denominators still use the FULL shingle sets, so jaccard is a
#: (documented) lower bound for pairs whose overlap is mostly boilerplate —
#: the standard corpus-dedup tradeoff. Shared between the Spark plan and the
#: DuckDB oracle via sql_df_capped_postings() so the twins cannot drift.
MAX_SHINGLE_DF = 1000


def sql_df_capped_postings(shingle_expr: str) -> str:
    """DuckDB CTE body for DF-capped shingle postings (twin of the Spark
    window-filter in dedup_ngram_jaccard; keep in sync)."""
    return f"""
    t AS (SELECT doc_id, LIST_DISTINCT({shingle_expr}) AS sh FROM documents),
    sz AS (SELECT doc_id, LEN(sh) AS n FROM t),
    ex AS (SELECT doc_id, UNNEST(sh) AS s FROM t),
    exf AS (SELECT doc_id, s FROM ex
            QUALIFY COUNT(*) OVER (PARTITION BY s) <= {MAX_SHINGLE_DF})
    """

# MinHash parameters: 32 permutations in 8 bands of 4 rows
MINHASH_PERMS = 32
MINHASH_BANDS = 8
MINHASH_ROWS = MINHASH_PERMS // MINHASH_BANDS
#: Mersenne prime 2^31-1: (a*h+b) stays < 2^62, exact in int64 under ANSI
_P31 = (1 << 31) - 1
# deterministic affine permutation coefficients (seeded, fixed at import)
import random as _random

_rng = _random.Random(42)
_PERM_A = tuple(_rng.randrange(1, _P31) for _ in range(MINHASH_PERMS))
_PERM_B = tuple(_rng.randrange(0, _P31) for _ in range(MINHASH_PERMS))

SIMHASH_BITS = 48
SIMHASH_CHUNKS = 6
_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS
#: bands = all C(6,2)=15 chunk PAIRS; a band key carries 2×8=16 bits
_CHUNK_PAIRS = [
    (i, j) for i in range(SIMHASH_CHUNKS) for j in range(SIMHASH_CHUNKS) if i < j
]
SIMHASH_HAMMING_MAX = 12
#: population cap per (band, bucket): simhash keys are NOT uniform —
#: template-heavy corpora pile near-identical fingerprints into one bucket,
#: and a bucket of B docs costs B² join pairs no matter how wide the band
#: key is. Buckets over the cap are dropped from BOTH join sides before the
#: self-join (the SimHash mirror of MAX_SHINGLE_DF): a dropped bucket is a
#: template cluster that exact/normalized dedup already collapses. The d≤4
#: pigeonhole recall guarantee holds for every pair whose intact band is a
#: surviving bucket.
SIMHASH_MAX_BUCKET = 1000


@query(
    "dedup_exact_hash",
    oracle="""
    SELECT SHA256(text) AS content_sha,
           COUNT(*) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM documents
    GROUP BY SHA256(text)
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep min id. One shuffle on the
    64-hex key; duplicate clusters of any size collapse map-side first."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2(F.col("text"), 256).alias("content_sha"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
    )


from projet_pipeline_bigdata_org_spark.functions.cleaning import SQL_CLEAN as _SQL_CLEAN

#: deterministic history/batch partition of the corpus for the incremental
#: exemplar: doc_id % 10 < 8 plays the already-deduped historical corpus,
#: the rest the incoming crawl shard
_INCREMENTAL_BATCH_RESIDUE = 8

# Crafted rows unioned into dedup_incremental_exact below: the synthetic
# corpus has ZERO exact duplicates at sf0.001/sf0.01 (and only 3 cross-split
# at sf0.1), so without these the dup-vs-history column certifies only
# zeros. Ids start at 10^9 (far above any corpus id); residues place one
# copy in history, its duplicate plus one novel doc in the batch — the
# 'fixture' source row is therefore (n_incoming=2, n_novel=1, n_dup=1) at
# every SF. Same certification pattern as textops.URL_FIXTURE_ROWS.
INCREMENTAL_FIXTURE_ROWS: tuple[tuple[int, str, str], ...] = (
    (1_000_000_000, "incremental dedup fixture: duplicate payload alpha", "fixture"),
    (1_000_000_008, "incremental dedup fixture: duplicate payload alpha", "fixture"),
    (1_000_000_018, "incremental dedup fixture: novel payload beta", "fixture"),
)

_INCREMENTAL_FIXTURE_SQL = " UNION ALL ".join(
    "SELECT CAST({} AS BIGINT) AS doc_id, '{}' AS text, '{}' AS source".format(
        i, t.replace("'", "''"), s.replace("'", "''")
    )
    for i, t, s in INCREMENTAL_FIXTURE_ROWS
)


@query(
    "dedup_incremental_exact",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      {_INCREMENTAL_FIXTURE_SQL}
    ), history AS (
      SELECT DISTINCT SHA256(text) AS content_sha
      FROM corpus WHERE doc_id % 10 < {_INCREMENTAL_BATCH_RESIDUE}
    ), batch AS (
      SELECT doc_id, source, SHA256(text) AS content_sha
      FROM corpus WHERE doc_id % 10 >= {_INCREMENTAL_BATCH_RESIDUE}
    )
    SELECT b.source,
           COUNT(*) AS n_incoming,
           COUNT(CASE WHEN h.content_sha IS NULL THEN 1 END) AS n_novel,
           COUNT(h.content_sha) AS n_dup_vs_history
    FROM batch b LEFT JOIN history h ON b.content_sha = h.content_sha
    GROUP BY b.source
    """,
    tags=("llm", "dedup", "documents", "incremental"),
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: an incoming batch checked against an
    existing historical corpus — the steady-state form of corpus dedup
    (every within-corpus query here assumes a one-shot build; real crawls
    arrive as shards against petabytes of history).

    Scale shape: only content hashes join — the history side reduces to
    its distinct sha set (at 100 TB a bucketed-by-sha staging table, making
    this join zero-shuffle on the history side per sources/batch.py's
    write_bucketed_table); the incoming shard shuffles only its own delta.
    Output is the per-source admission report (novel vs already-seen), the
    thing a crawl scheduler consumes. History/batch split is a
    deterministic doc_id residue so both engines replay it exactly; a
    3-row crafted fixture (INCREMENTAL_FIXTURE_ROWS, mirrored in the
    oracle) keeps the dup-vs-history path non-vacuous on the
    duplicate-free synthetic corpus."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source").unionByName(
        spark.createDataFrame(
            list(INCREMENTAL_FIXTURE_ROWS), "doc_id long, text string, source string"
        )
    )
    sha = F.sha2(F.col("text"), 256)
    history = (
        d.filter(F.col("doc_id") % 10 < _INCREMENTAL_BATCH_RESIDUE)
        .select(sha.alias("content_sha"))
        .distinct()
        .withColumn("in_history", F.lit(1))
    )
    batch = d.filter(F.col("doc_id") % 10 >= _INCREMENTAL_BATCH_RESIDUE).select(
        "doc_id", "source", sha.alias("content_sha")
    )
    return (
        batch.join(history, "content_sha", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.count(F.when(F.col("in_history").isNull(), 1)).alias("n_novel"),
            F.count("in_history").alias("n_dup_vs_history"),
        )
    )


# Crafted cross-split NEAR-duplicate fixture for dedup_incremental_minhash:
# the synthetic corpus's near-dup pairs are generation artifacts that may or
# may not straddle the doc_id-residue split, so without these rows the
# batch-vs-history hit path could certify vacuously. Ids start at 2·10^9
# (above the corpus AND the exact-dedup fixture); residues place the base
# document in history and its near-duplicate (one token rewritten out of 26
# — ~3 of ~24 word-3-gram shingles change, Jaccard ≈ 0.78) plus one novel
# document in the batch.
_INC_NEARDUP_BASE = (
    "incremental minhash fixture the steady state crawler revisits large "
    "boilerplate corpora every day and the near duplicate detector must flag "
    "refreshed copies of historical pages before they reenter the training "
    "data pool"
)
INCREMENTAL_NEARDUP_FIXTURE_ROWS: tuple[tuple[int, str, str], ...] = (
    (2_000_000_000, _INC_NEARDUP_BASE, "fixture_near"),
    (2_000_000_008, _INC_NEARDUP_BASE.replace("refreshed", "rescraped"), "fixture_near"),
    (
        2_000_000_018,
        "incremental minhash fixture novel payload gamma with entirely "
        "different vocabulary about orbital mechanics and tidal resonance",
        "fixture_near",
    ),
)

#: the near-dup fixture as oracle SQL (doc_id, text) — shared by the
#: certified incremental near-dedup oracles and the repeated-passage one
_NEARDUP_FIXTURE_SQL = " UNION ALL ".join(
    "SELECT CAST({} AS BIGINT) AS doc_id, '{}' AS text".format(
        i, t.replace("'", "''")
    )
    for i, t, _ in INCREMENTAL_NEARDUP_FIXTURE_ROWS
)


def _incremental_minhash_pairs(
    spark: SparkSession, sf_dir: str, portable: bool = False
) -> DataFrame:
    """The ONE incremental-LSH plan behind both registered forms:
    ``portable`` swaps the two engine-specific hashes (xxhash64 shingle
    hash, murmur3 band bucket) for the sha-slice / coin-fold pair the
    DuckDB oracle rebuilds bit-identically — every other stage (shingle
    staging, band derivation via the shared ``minhash_band_table``, the
    batch-vs-history candidate join, the exact-Jaccard verify) is the
    same code either way, so the certified driver row certifies THIS
    plan, not a lookalike."""
    from projet_pipeline_bigdata_org_spark.catalog import spread_input

    d = spread_input(
        load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    ).unionByName(
        spark.createDataFrame(
            list(INCREMENTAL_NEARDUP_FIXTURE_ROWS),
            "doc_id long, text string, source string",
        )
    )
    hash_fn = portable_shingle_hashes if portable else shingle_hashes
    sh = _persist_scoped(
        "inc_minhash_cert_sh" if portable else "inc_minhash_sh",
        shingled_doc_hashes(d, hash_fn),
    )
    is_batch = F.col("doc_id") % 10 >= _INCREMENTAL_BATCH_RESIDUE
    # ONE band table over the whole staged corpus, persisted, with the
    # history/batch split as filters on its doc_id (r17): the previous
    # per-split band tables ran the signature aggregate twice (guide §2.4
    # "two operations keyed the same way can share one exchange") — the
    # band rows are identical because the split predicate commutes with
    # the per-doc signature computation. At production scale the history
    # band table is a pre-built parquet artifact either way.
    bands = _persist_scoped(
        "inc_minhash_bands", minhash_band_table(sh, portable)
    )
    hist_bands = bands.filter(~is_batch)
    batch_bands = bands.filter(is_batch)
    # persisted for the same reason as _lsh_candidate_jaccard's cand: the
    # verify joins read the candidate set's REAL size, so AQE broadcasts
    # it when it fits instead of sort-merging the shingle table twice
    cand = _persist_scoped(
        "inc_minhash_cand",
        batch_bands.alias("b")
        .join(
            hist_bands.alias("h"),
            (F.col("b.band") == F.col("h.band"))
            & (F.col("b.bucket") == F.col("h.bucket")),
        )
        .select(
            F.col("b.doc_id").alias("batch_id"), F.col("h.doc_id").alias("history_id")
        )
        .dropDuplicates(["batch_id", "history_id"]),
    )
    sh_b = sh.select(F.col("doc_id").alias("batch_id"), F.col("sh").alias("sh_b"))
    sh_h = sh.select(F.col("doc_id").alias("history_id"), F.col("sh").alias("sh_h"))
    inter = F.size(F.array_intersect("sh_b", "sh_h"))
    union = F.size("sh_b") + F.size("sh_h") - inter
    return (
        cand.join(sh_b, "batch_id")
        .join(sh_h, "history_id")
        .select(
            "batch_id", "history_id", (inter.cast("double") / union).alias("jaccard")
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@query(
    "dedup_incremental_minhash",
    tags=("llm", "dedup", "documents", "incremental", "no-oracle"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash+LSH near-dedup: an incoming crawl shard's band
    signatures joined against the historical corpus's band table — the
    steady-state form of ``dedup_minhash_lsh`` the same way
    ``dedup_incremental_exact`` is the steady-state form of exact dedup.
    The reference's only dedup is a driver-side id-skip
    (test/data_ingestion/testpy.py:130-131); this is what a daily 100 TB
    crawl pipeline actually runs.

    Scale shape, staged like the one-shot query:
    1. one persisted shingle+hash table feeds signatures for both sides and
       the verify step;
    2. the history side reduces to its (doc_id, band, bucket) band table —
       24 bytes/row; at cluster scale this is a staging table written once
       per corpus epoch and bucketed by (band, bucket) via
       sources/batch.py's write_bucketed_table, making the candidate join
       zero-shuffle on the history side while each daily shard shuffles
       only its own delta;
    3. batch bands equi-join history bands (band, bucket) — never a
       self-join, never all-pairs — and candidates re-join the persisted
       shingle table by doc_id for the exact-Jaccard verify on candidates
       only. At cluster scale the history SHINGLE store is likewise a
       staging table bucketed by doc_id (sources/batch.py:
       write_bucketed_table): the verify join then plans exchange-free on
       the history side — the full historical shingle table is never
       shuffled; only the (candidate-sized) batch side exchanges into the
       history's bucket layout. Pinned by test_plan_shape.py::
       test_minhash_verify_join_against_bucketed_shingle_store_no_history_exchange.
    History/batch split is the same deterministic doc_id residue as the
    exact sibling; INCREMENTAL_NEARDUP_FIXTURE_ROWS keeps the cross-split
    hit path non-vacuous. No DuckDB oracle (xxhash64 band buckets aren't
    reproducible there — same rationale as dedup_minhash_lsh), but the
    SAME plan with portable hashes IS oracle-gated as
    ``dedup_incremental_minhash_certified``; invariants: output equals
    the one-shot LSH result restricted to cross-split pairs, and the
    crafted fixture pair is flagged (tests/test_llm_ops.py)."""
    return _incremental_minhash_pairs(spark, sf_dir)


def _incremental_simhash_pairs(
    spark: SparkSession, sf_dir: str, portable: bool = False
) -> DataFrame:
    """The ONE incremental-SimHash plan behind both registered forms:
    ``portable`` swaps the xxhash64 feature hash for the sha-slice one
    (``portable_feature_hashes``) — fingerprint kernel, chunk-pair
    banding, corpus-only hot-bucket census, and the batch-vs-history
    Hamming join are the same code either way."""
    scope = "inc_simhash_cert" if portable else "inc_simhash"
    feat_hash = portable_feature_hashes if portable else (
        lambda feats: F.transform(feats, lambda t: F.xxhash64(t))
    )
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source").unionByName(
        spark.createDataFrame(
            list(INCREMENTAL_NEARDUP_FIXTURE_ROWS),
            "doc_id long, text string, source string",
        )
    )
    hashed_df = _persist_scoped(
        f"{scope}_hashed",
        d.select(
            "doc_id",
            F.array_distinct(shingles(ws_tokens("text"))).alias("feats"),
        )
        .filter(F.size("feats") > 0)
        .select("doc_id", feat_hash(F.col("feats")).alias("hh")),
    )
    fp = _persist_scoped(
        f"{scope}_fp",
        hashed_df.select(
            "doc_id", simhash_fingerprint_np()(F.col("hh")).alias("simhash")
        ),
    )
    # chunk table persisted once: the census branch and the filtered
    # output branch differ (census excludes fixture rows), which defeats
    # Catalyst's ReusedExchange — without the cache the explode+fingerprint
    # subtree executes twice (measured 2.2x on the sweep)
    all_chunks = _persist_scoped(f"{scope}_chunks", simhash_chunk_table(fp))
    # census over CORPUS rows only (fixture ids sit at ≥2e9): the one-shot
    # query's census sees no fixture fingerprints, so the incremental
    # blacklist must not either — a fixture landing in a bucket at exactly
    # the cap would otherwise diverge the two and break the
    # restriction-equality invariant
    chunks = _drop_hot_simhash_buckets(
        all_chunks,
        SIMHASH_MAX_BUCKET,
        census_over=all_chunks.filter(F.col("doc_id") < 2_000_000_000),
    )
    is_batch = F.col("doc_id") % 10 >= _INCREMENTAL_BATCH_RESIDUE
    b, h = chunks.filter(is_batch).alias("b"), chunks.filter(~is_batch).alias("h")
    ham = F.bit_count(F.col("b.simhash").bitwiseXOR(F.col("h.simhash")))
    return (
        b.join(
            h,
            (F.col("b.chunk") == F.col("h.chunk"))
            & (F.col("b.chunk_val") == F.col("h.chunk_val")),
        )
        .select(
            F.col("b.doc_id").alias("batch_id"),
            F.col("h.doc_id").alias("history_id"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["batch_id", "history_id"])
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
    )


@query(
    "dedup_incremental_simhash",
    tags=("llm", "dedup", "documents", "incremental", "no-oracle"),
)
def dedup_incremental_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SimHash near-dedup: the incoming shard's chunk-pair band
    keys joined against the historical fingerprint band table — completing
    the steady-state near-dedup family (exact → MinHash → SimHash; a real
    crawl pipeline runs whichever fingerprint family it standardized on).

    Scale shape mirrors ``dedup_incremental_minhash``: fingerprints are
    16 bytes/row, the band table 24; at cluster scale the history band
    table is a staging table bucketed by (chunk, chunk_val) — zero-shuffle
    on the history side, each shard shuffles only its delta. The hot-bucket
    census runs over the CORPUS rows only — the certification fixture rows
    are excluded so the blacklist is identical to the one-shot query's by
    construction (a fixture fingerprint landing in a bucket at exactly the
    cap would otherwise diverge them); at scale the census is a maintained
    property of the history table that the much smaller shard perturbs
    negligibly. The batch-vs-history join needs no ``a_id < b_id``
    ordering — the sides are disjoint by construction.

    No DuckDB oracle (xxhash64 features, same rationale as
    ``dedup_simhash``), but the SAME plan with the portable feature hash
    IS oracle-gated as ``dedup_incremental_simhash_certified``;
    invariants: output equals the one-shot SimHash result restricted to
    cross-split pairs, and the crafted near-duplicate fixture pair
    (shared with the MinHash sibling) is flagged."""
    return _incremental_simhash_pairs(spark, sf_dir)


@query(
    "dedup_exact_normalized",
    oracle=f"""
    WITH n AS (SELECT doc_id, {_SQL_CLEAN.format(c='text')} AS norm FROM documents)
    SELECT SHA256(norm) AS norm_sha,
           COUNT(*) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM n GROUP BY SHA256(norm)
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after cleaning-normalization — catches trivially-mutated
    copies (case / URLs / punctuation / whitespace)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", clean_text("text").alias("norm"))
        .groupBy(F.sha2(F.col("norm"), 256).alias("norm_sha"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {sql_df_capped_postings(sql_shingles(SQL_WS_TOKENS.format(c='text')))},
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
      FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT a_id, b_id,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Candidate pairs come from an equi-join on shingle (the inverted index) —
    never an all-pairs cross join — so cost scales with shared-shingle mass.
    Postings are document-frequency-capped (MAX_SHINGLE_DF): a boilerplate
    shingle shared by millions of docs would otherwise be a quadratic hot
    bucket; n_common then counts capped shingles only while the set-size
    denominators stay exact (jaccard is a lower bound for boilerplate-heavy
    pairs — see sql_df_capped_postings). At 100 TB the MinHash variant below
    replaces the exact index; this one is the auditable ground truth the LSH
    recall is tested against.
    """
    from projet_pipeline_bigdata_org_spark.catalog import spread_input

    # r17: spread the single-split local scan before the shingle stage
    # (guide §2.5; no-op on multi-split production inputs)
    return ngram_jaccard_pairs(
        spread_input(load(spark, sf_dir, "documents").select("doc_id", "text"))
    )


def ngram_jaccard_pairs(
    d: DataFrame,
    max_shingle_df: int = MAX_SHINGLE_DF,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Jaccard near-dup pairs over any (doc_id, text) DataFrame; the cap and
    threshold are parameters so invariants can exercise hot-boilerplate
    corpora directly (see test_llm_ops.py)."""
    # staged like dedup_minhash_lsh: the shingle table persists once — it is
    # read by the DF-count, the anti-join, both self-join sides, and the size
    # lookup; unpersisted it would re-tokenize/shingle the corpus 4×
    sh = _persist_scoped(
        "jaccard_sh",
        d.select("doc_id", F.array_distinct(shingles(ws_tokens("text"))).alias("sh")),
    )
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    # DF cap on postings — semantics twin of the QUALIFY clause in
    # sql_df_capped_postings, planned as: partial-aggregated groupBy builds
    # the HOT-shingle blacklist (tiny by construction: ≤ postings/cap rows),
    # then an anti-join drops their postings. AQE turns the anti-join into a
    # broadcast when the blacklist is small (the common case); a window-count
    # over the postings would instead sort-shuffle the full index.
    postings = sh.select("doc_id", F.explode("sh").alias("s"))
    hot = (
        postings.groupBy("s")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_shingle_df)
        .select("s")
    )
    # persisted: with the DF cap bounding the exploded size, materializing
    # the capped postings once beats re-deriving explode+anti-join (and the
    # hot-shingle census) per self-join side — measured ~15% at sf0.1
    # (pre-cap the uncapped explosion made re-derivation cheaper; re-measured
    # for round 3 per the verdict). At cluster scale this is the staging
    # table a production dedup would write between stages.
    ex = _persist_scoped("jaccard_ex", postings.join(hot, "s", "left_anti"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("a_id"))
        .join(sb, F.col("sb.doc_id") == F.col("b_id"))
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


#: one cached copy per operator: re-invocation unpersists the previous
#: cache instead of leaking a pinned DataFrame per call
_SCOPED_CACHES: dict[str, DataFrame] = {}


def _persist_scoped(scope: str, df: DataFrame, big: bool = False) -> DataFrame:
    """Persist ``df`` under a per-operator scope. Most pins here are
    SMALL state tables (band/degree/frontier/signature tables —
    node- or vocabulary-bounded) and take the default MEMORY_AND_DISK.

    ``big=True`` marks a CORPUS-SIZED pin (an exploded posting/token
    table at least as large as its input corpus): it persists
    DISK_ONLY, so at 100 TB the pin costs local-disk spill instead of
    competing with execution memory for the unified region (guide §5
    "caching ... competes with execution memory"). Recompute-vs-pin
    stays the right trade for these (the pinned subtree runs 2-5x per
    query); only the storage medium changes. Local bench impact
    measured at sf0.1: within noise (serialized columnar blocks on
    tmpfs-backed disk).

    A long-lived session that runs many different operators can call
    :func:`release_scoped_pins` after consuming a query's result to
    drop every scoped pin at once (the bench does this between timed
    queries); within-query sharing is unaffected because all references
    resolve while the pin is live."""
    prev = _SCOPED_CACHES.pop(scope, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    if big:
        from pyspark import StorageLevel

        _SCOPED_CACHES[scope] = df.persist(StorageLevel.DISK_ONLY)
    else:
        _SCOPED_CACHES[scope] = df.persist()
    return _SCOPED_CACHES[scope]


def release_scoped_pins() -> int:
    """Unpersist and forget every scoped pin (VERDICT r17 #7: without
    an explicit release, a long-lived production session accumulates
    one live pin per operator scope it has ever run — ~40 tables —
    until a blunt ``spark.catalog.clearCache()``). Call after a query's
    terminal action; returns the number of pins released."""
    n = 0
    for scope in list(_SCOPED_CACHES):
        df = _SCOPED_CACHES.pop(scope)
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def shingled_doc_hashes(d: DataFrame, hash_fn) -> DataFrame:
    """(doc_id, sh, hh) for documents with >= 3 whitespace tokens — the
    ONE shingle+hash staging projection behind every MinHash query
    (one-shot, certified, incremental; ``hash_fn`` picks xxhash64 vs the
    portable sha-slice).

    r18 (guide §4.4-analogous duplicated evaluation): the previous
    ``.filter(size(sh) > 0)`` referenced the DERIVED shingle column, and
    Catalyst pushed that filter below the spread exchange into the
    single-split scan task — the whole zip_with+array_distinct shingle
    build executed once per row on ONE core just to test emptiness, then
    again above the exchange for the projection (visible as the pushed
    Filter(size(CASE WHEN ...)) under the RoundRobin exchange in the r18
    before-plans). ``size(sh) > 0`` is EXACTLY ``>= 3 tokens`` (3-gram
    shingles of a >= 3-token doc are non-empty; array_distinct keeps
    them non-empty), so filtering on the raw token count keeps the
    below-exchange work to one split+filter+size pass and builds the
    shingles once, 32-way. Row set identical; every consumer oracle
    re-verified."""
    return (
        d.filter(F.size(ws_tokens("text")) >= 3)
        .select(
            "doc_id", F.array_distinct(shingles(ws_tokens("text"))).alias("sh")
        )
        # hashes materialize INSIDE the persisted stage: projection
        # collapse would otherwise inline the hash transform into each of
        # the 32 permutation mins (32x the per-shingle hash work)
        .select("doc_id", "sh", hash_fn(F.col("sh")).alias("hh"))
    )


def minhash_signature(hashed: F.Column) -> F.Column:
    """32-permutation MinHash signature over pre-hashed shingles.

    ``hashed`` must be ``array<long>`` of values in [0, 2^31-1) — see
    :func:`shingle_hashes`. h_i(x) = (a_i*x + b_i) mod (2^31-1); products
    stay < 2^62 so int64 arithmetic is exact under ANSI. One column
    expression per permutation keeps the whole signature inside codegen."""
    def _perm(a: int, b: int):
        # closure (not default args): F.transform inspects the lambda's arity
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P31))

    mins = [
        F.array_min(F.transform(hashed, _perm(a, b)))
        for a, b in zip(_PERM_A, _PERM_B)
    ]
    return F.array(*mins)


def shingle_hashes(sh: F.Column) -> F.Column:
    """xxhash64 of each shingle folded into [0, 2^31-1)."""
    return F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_P31)))


#: per-row multiplier of the portable band-bucket fold (any odd constant
#: > 2^16 works; 65537 keeps every intermediate below 2^49 — see
#: portable_band_bucket)
BAND_MIX = 65537


def portable_shingle_hashes(sh: F.Column) -> F.Column:
    """sha256-slice of each shingle folded into [0, 2^31-1): the
    engine-portable twin of :func:`shingle_hashes` (xxhash64 is not
    replayable in DuckDB; SHA256 is — the agg_hll_registers discipline).
    First 8 hex chars -> 32 uniform bits -> mod Mersenne-31."""
    return F.transform(
        sh,
        lambda s: F.pmod(
            F.conv(F.substring(F.sha2(s, 256), 1, 8), 16, 10).cast("long"),
            F.lit(_P31),
        ),
    )


def portable_band_bucket(sig: F.Column, band: int) -> F.Column:
    """Engine-portable band bucket: fold the band's MINHASH_ROWS signature
    mins through the hash_coin chain, seeded by the band index —
    acc := coin(acc + m_k * BAND_MIX). Every intermediate stays below
    2^49 (coin < 2^32, m_k < 2^31, BAND_MIX = 2^16+1), so the fold is
    exact int64 in both engines; sql_band_bucket() is the DuckDB twin.

    r18 (guide §1.2 per-task work): the fold is expressed as ONE
    ``F.aggregate`` over the band's signature slice instead of four
    textually-nested hash_coin calls. ``hash_coin`` references its key
    4x, so nesting it k deep duplicated the whole accumulator SUBTREE
    4x per level — ~4^4 copies of the innermost term per band, a
    ~27k-node expression tree per row that the (AQE-coalesced,
    single-partition) bucket projection evaluated term by term
    (measured: the bucket stage cost ~1.5s on 5k rows at sf0.1, >10x
    the 32-min aggregate under it). In the aggregate form the
    accumulator is a BOUND lambda variable, so each coin references a
    slot, not a copy — constant-size tree, ~100x fewer ops/row. The
    fold order, seed, and integer arithmetic are unchanged
    (left-to-right over the same 4 mins), so buckets are bit-identical;
    every certified-LSH oracle re-verified."""
    from projet_pipeline_bigdata_org_spark.functions.hashing import hash_coin

    return F.aggregate(
        F.slice(sig, band * MINHASH_ROWS + 1, MINHASH_ROWS),
        F.lit(band).cast("long"),
        lambda acc, m: hash_coin(acc + m * BAND_MIX),
    )


def sql_band_bucket(row_cols: tuple[str, ...], seed: str = "band") -> str:
    """DuckDB twin of portable_band_bucket: the identical nested coin fold
    over the pivoted per-band row-min columns."""
    from projet_pipeline_bigdata_org_spark.functions.hashing import sql_hash_coin

    acc = seed
    for c in row_cols:
        acc = sql_hash_coin(f"({acc} + {c} * {BAND_MIX})")
    return acc


def minhash_bands(sig: F.Column, portable: bool = False) -> F.Column:
    """``array<struct<band,bucket>>``: the signature sliced into
    MINHASH_BANDS contiguous MINHASH_ROWS-row bands, each bucketed by one
    hash of its slice — the JVM murmur3 (fastest) by default, or the
    engine-portable coin fold when ``portable`` (the certified variant).
    Shared by the one-shot, incremental, and certified LSH queries so
    their band keys can never drift."""

    def bucket(b: int) -> F.Column:
        if portable:
            return portable_band_bucket(sig, b)
        return F.hash(F.slice(sig, b * MINHASH_ROWS + 1, MINHASH_ROWS))

    return F.array(
        *[
            F.struct(F.lit(b).alias("band"), bucket(b).alias("bucket"))
            for b in range(MINHASH_BANDS)
        ]
    )


def minhash_band_table(sh_df: DataFrame, portable: bool = False) -> DataFrame:
    """(doc_id, band, bucket) from a (doc_id, hh) hashed-shingle frame —
    24 bytes/row, the only thing an LSH candidate join ever shuffles.
    Empty-``hh`` docs are dropped HERE (as well as by every caller's
    upstream filter), so the non-empty contract holds by construction.

    The 32 permutation mins are computed by exploding the hashed
    shingles and folding ONE hash aggregate of 32 conditional MINs
    (r17 optimization, guide §1.2/§2.3): min is commutative, so the
    values are bit-identical to the previous per-row
    ``array_min(transform(...))`` fold, but the work runs as a single
    codegen hash-aggregate pass with map-side partial aggregation
    instead of 32 interpreted lambda passes allocating 32 intermediate
    arrays per document — measured 6.5s -> 1.6s on the sf0.1 corpus,
    and the aggregate parallelizes across the shuffle where the
    array fold was pinned to the scan's task count. Band keys are then
    built from the same ``minhash_bands`` expressions the previous form
    used (shared band-key code, unchanged)."""
    # enforce the non-empty contract IN code (r18, advisor item): the
    # explode+groupBy form drops an empty-hh doc where the old per-row
    # array_min form emitted null-bucket band rows — callers all filter
    # empty docs upstream, but a future caller that forgets must get the
    # same (filtered) semantics from both forms by construction. The
    # filter is a size probe on an already-materialized array — no
    # measurable cost (re-benched: noise-level).
    ex = sh_df.filter(F.size("hh") > 0).select(
        "doc_id", F.explode("hh").alias("hv")
    )
    mins = ex.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(F.col("hv") * F.lit(a) + F.lit(b), F.lit(_P31))).alias(
                f"m{i}"
            )
            for i, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
        ]
    )
    sig = mins.select(
        "doc_id",
        F.array(*[F.col(f"m{i}") for i in range(MINHASH_PERMS)]).alias("sig"),
    )
    return sig.select(
        "doc_id", F.explode(minhash_bands(F.col("sig"), portable)).alias("bb")
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def _lsh_candidate_jaccard(sh: DataFrame, bands: DataFrame) -> DataFrame:
    """Band-collision candidates -> exact-Jaccard verify on candidates
    only — the stage shared verbatim by the production and certified LSH
    queries (the certified driver row therefore certifies THIS code
    path, not a lookalike).

    The band table is persisted before the self-join (r17): the a/b
    aliases otherwise DUPLICATE the whole signature subtree in the
    physical plan — every permutation min and bucket fold executed
    twice per query (guide §7.2 "duplicated subtrees"). 24-byte rows ×
    8 bands/doc, so the pin is tiny at any scale."""
    bands = _persist_scoped("lsh_bands", bands)
    a, b = bands.alias("a"), bands.alias("b")
    # cand persists too (r17): the band self-join's size estimate is
    # opaque to AQE, so the verify joins planned as sort-merge and
    # shuffled the full shingle table twice; with the candidate set's
    # REAL size known, AQE broadcasts it when it fits (the local/common
    # case) and falls back to sort-merge only when a corpus actually
    # produces a huge candidate set — scale-adaptive, not a forced hint.
    cand = _persist_scoped(
        "lsh_cand",
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"]),
    )
    sh_a = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sh_a, "a_id")
        .join(sh_b, "b_id")
        .select("a_id", "b_id", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@query(
    "dedup_minhash_lsh",
    tags=("llm", "dedup", "documents", "no-oracle"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle → 32-perm signature → 8 bands × 4 rows →
    band-bucket equi-join → exact Jaccard verify on candidates only.

    The 100 TB dedup plan, staged to keep the shuffles slim:
    1. shingle table (doc_id, sh) persisted once — at cluster scale this is
       a staging parquet table; projection collapse would otherwise inline
       the shingle expression into all 32 signature mins and both join sides;
    2. band join carries only (doc_id, band, bucket) — 24 bytes/row, never
       the shingle arrays;
    3. candidate pairs re-join the persisted shingle table by doc_id for the
       exact-Jaccard verify, touching candidates only.
    No oracle (xxhash64 isn't reproducible in DuckDB); tests assert candidate
    pairs ⊆ exact-Jaccard pairs with matching values and recall ≥ 0.5.
    """
    from projet_pipeline_bigdata_org_spark.catalog import spread_input

    # spread the single-split local scan before the per-row shingle work
    # (guide §2.5; no-op on multi-split production inputs)
    d = spread_input(load(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = _persist_scoped("minhash_sh", shingled_doc_hashes(d, shingle_hashes))
    return _lsh_candidate_jaccard(sh, minhash_band_table(sh))


def _minhash_certified_oracle() -> str:
    """DuckDB rebuild of the ENTIRE certified MinHash+LSH pipeline:
    distinct shingles -> sha-slice hashes -> all 32 affine-permutation
    mins -> per-band coin-fold buckets -> band-collision candidates ->
    exact Jaccard on candidates only."""
    perm_rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    pivots = ", ".join(
        f"MIN(CASE WHEN r = {k} THEN m END) AS r{k}" for k in range(MINHASH_ROWS)
    )
    bucket = sql_band_bucket(tuple(f"r{k}" for k in range(MINHASH_ROWS)))
    return f"""
    WITH t AS (
      SELECT doc_id,
             LIST_DISTINCT({sql_shingles(SQL_TOK_NULLSAFE)}) AS sh
      FROM documents
    ), tf AS (
      SELECT doc_id, sh FROM t WHERE LEN(sh) > 0
    ), ex AS (
      SELECT doc_id, UNNEST(sh) AS s FROM tf
    ), h AS (
      SELECT doc_id,
             (CAST('0x' || SUBSTR(SHA256(s), 1, 8) AS BIGINT) % {_P31}) AS hv
      FROM ex
    ), perms AS (
      SELECT * FROM (VALUES {perm_rows}) p(i, a, b)
    ), mins AS (
      SELECT doc_id,
             p.i // {MINHASH_ROWS} AS band,
             p.i % {MINHASH_ROWS} AS r,
             MIN((h.hv * p.a + p.b) % {_P31}) AS m
      FROM h CROSS JOIN perms p
      GROUP BY doc_id, p.i // {MINHASH_ROWS}, p.i % {MINHASH_ROWS}
    ), piv AS (
      SELECT doc_id, band, {pivots}
      FROM mins GROUP BY doc_id, band
    ), buckets AS (
      SELECT doc_id, band, {bucket} AS bucket FROM piv
    ), cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM buckets a
      JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), sz AS (
      SELECT doc_id, LEN(sh) AS n FROM tf
    ), inter AS (
      SELECT c.a_id, c.b_id,
             LEN(LIST_INTERSECT(ta.sh, tb.sh)) AS n_common
      FROM cand c
      JOIN tf ta ON ta.doc_id = c.a_id
      JOIN tf tb ON tb.doc_id = c.b_id
    )
    SELECT a_id, b_id,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
            >= {JACCARD_THRESHOLD}
    """


@query(
    "dedup_minhash_certified",
    oracle=_minhash_certified_oracle(),
    tags=("llm", "dedup", "documents"),
)
def dedup_minhash_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup with CERTIFIED arithmetic — the oracle-gated
    twin of ``dedup_minhash_lsh`` (VERDICT r11 #1, the agg_hll_registers
    pattern): same 32 affine permutations, same 8x4 banding, same
    candidate-join + exact-Jaccard verify CODE (``minhash_signature``,
    ``minhash_band_table``, ``_lsh_candidate_jaccard`` are shared, not
    copied), with the two engine-specific hashes swapped for portable
    ones the DuckDB oracle rebuilds bit-identically:

    - shingle hash: sha256 first-8-hex-chars mod 2^31-1 (instead of
      xxhash64) — uniform 32 bits both engines agree on;
    - band bucket: the hash_coin fold of the band's 4 signature mins
      (instead of JVM murmur3 over the slice) — exact int64 end-to-end.

    The driver row therefore certifies the LSH CONSTRUCTION — every
    permutation min, every band key, the candidate set, and the verify
    division — not just that some pairs came out. The production query
    keeps xxhash64/murmur3 (faster, fewer collisions at 10^9 docs);
    test_llm_ops pins the two variants' verified pair sets against each
    other at test scale so they cannot drift.

    Scale shape: identical to the production plan — the band join
    shuffles 24-byte rows, the verify touches candidates only."""
    from projet_pipeline_bigdata_org_spark.catalog import spread_input

    d = spread_input(load(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = _persist_scoped(
        "minhash_cert_sh", shingled_doc_hashes(d, portable_shingle_hashes)
    )
    return _lsh_candidate_jaccard(sh, minhash_band_table(sh, portable=True))


def _inc_minhash_certified_oracle() -> str:
    """DuckDB rebuild of the ENTIRE certified incremental pipeline:
    (corpus ∪ fixture) -> distinct shingles -> sha-slice hashes -> all 32
    affine-permutation mins -> per-band coin-fold buckets -> batch-vs-
    history band collisions -> exact Jaccard on candidates only."""
    perm_rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    pivots = ", ".join(
        f"MIN(CASE WHEN r = {k} THEN m END) AS r{k}" for k in range(MINHASH_ROWS)
    )
    bucket = sql_band_bucket(tuple(f"r{k}" for k in range(MINHASH_ROWS)))
    return f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL {_NEARDUP_FIXTURE_SQL}
    ), t AS (
      SELECT doc_id,
             LIST_DISTINCT({sql_shingles(SQL_TOK_NULLSAFE)}) AS sh
      FROM docs
    ), tf AS (
      SELECT doc_id, sh FROM t WHERE LEN(sh) > 0
    ), ex AS (
      SELECT doc_id, UNNEST(sh) AS s FROM tf
    ), h AS (
      SELECT doc_id,
             (CAST('0x' || SUBSTR(SHA256(s), 1, 8) AS BIGINT) % {_P31}) AS hv
      FROM ex
    ), perms AS (
      SELECT * FROM (VALUES {perm_rows}) p(i, a, b)
    ), mins AS (
      SELECT doc_id,
             p.i // {MINHASH_ROWS} AS band,
             p.i % {MINHASH_ROWS} AS r,
             MIN((h.hv * p.a + p.b) % {_P31}) AS m
      FROM h CROSS JOIN perms p
      GROUP BY doc_id, p.i // {MINHASH_ROWS}, p.i % {MINHASH_ROWS}
    ), piv AS (
      SELECT doc_id, band, {pivots}
      FROM mins GROUP BY doc_id, band
    ), buckets AS (
      SELECT doc_id, band, {bucket} AS bucket FROM piv
    ), cand AS (
      SELECT DISTINCT b.doc_id AS batch_id, h.doc_id AS history_id
      FROM buckets b
      JOIN buckets h
        ON b.band = h.band AND b.bucket = h.bucket
      WHERE b.doc_id % 10 >= {_INCREMENTAL_BATCH_RESIDUE}
        AND h.doc_id % 10 < {_INCREMENTAL_BATCH_RESIDUE}
    ), sz AS (
      SELECT doc_id, LEN(sh) AS n FROM tf
    ), inter AS (
      SELECT c.batch_id, c.history_id,
             LEN(LIST_INTERSECT(tb.sh, th.sh)) AS n_common
      FROM cand c
      JOIN tf tb ON tb.doc_id = c.batch_id
      JOIN tf th ON th.doc_id = c.history_id
    )
    SELECT batch_id, history_id,
           CAST(n_common AS DOUBLE) / (sb.n + sh2.n - n_common) AS jaccard
    FROM inter
    JOIN sz sb ON sb.doc_id = batch_id
    JOIN sz sh2 ON sh2.doc_id = history_id
    WHERE CAST(n_common AS DOUBLE) / (sb.n + sh2.n - n_common)
            >= {JACCARD_THRESHOLD}
    """


@query(
    "dedup_incremental_minhash_certified",
    oracle=_inc_minhash_certified_oracle(),
    tags=("llm", "dedup", "documents", "incremental"),
)
def dedup_incremental_minhash_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash+LSH admission with CERTIFIED arithmetic — the
    oracle-gated twin of ``dedup_incremental_minhash`` (VERDICT r12 #1):
    the steady-state batch-vs-history path — the actual 100 TB hot path —
    runs the SAME plan builder (``_incremental_minhash_pairs``; shingle
    staging, ``minhash_band_table`` band keys, candidate join, exact-
    Jaccard verify are shared code, not copies) with the two engine-
    specific hashes swapped for the portable pair the r12 one-shot twin
    introduced: sha-slice shingle hashes (``portable_shingle_hashes``,
    dedup.py) and hash_coin band-bucket folds (``portable_band_bucket``).
    The oracle rebuilds every permutation min, every band key, the
    batch-vs-history candidate set (including the crafted cross-split
    near-duplicate fixture), and the verify division bit-identically —
    so the driver row certifies steady-state ADMISSION end-to-end.
    Production keeps xxhash64/murmur3; a restriction-equality test pins
    this twin against ``dedup_minhash_certified`` on cross-split pairs
    (the same invariant the production pair carries).

    Scale shape: identical to production — 24-byte band rows on the
    candidate join, history sides bucketable to zero-shuffle, verify on
    candidates only."""
    return _incremental_minhash_pairs(spark, sf_dir, portable=True)



@query(
    "dedup_simhash",
    tags=("llm", "dedup", "documents", "no-oracle"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash fingerprint per document + near-dup pairs by Hamming
    distance ≤ 12 over banded candidates.

    Features are distinct word-3-gram shingles (order-sensitive — unigram
    token sets are too weak when documents share a small vocabulary):
    bit_j = sign(Σ_shingles (xxhash64(shingle) bit_j ? +1 : -1)); near-dups
    have small Hamming distance. Banding is on CHUNK PAIRS: the 48 bits
    split into 6×8-bit chunks and each of the C(6,2)=15 pairs is a band
    whose key carries 16 bits → 2^16 buckets per band (vs 2^12 for
    single-12-bit-chunk banding, whose ~N/4096 bucket population turns
    quadratic at ≥10^8 docs). Pigeonhole: hamming ≤ 4 flips ≤4 chunks of 6,
    so ≥2 chunks survive intact and the pair COLLIDES in some band —
    guaranteed recall for d ≤ 4; pairs in [5, SIMHASH_HAMMING_MAX] surface
    best-effort when their differing bits cluster in ≤4 chunks. Worst-case
    uniform bucket population is N/2^16 per band; simhash keys are NOT
    uniform (template-heavy corpora cluster), so buckets whose population
    exceeds SIMHASH_MAX_BUCKET are dropped before the self-join — see the
    cap's docstring for the recall trade.
    Documents with <3 tokens have no shingle features and are excluded
    (they would all share fingerprint 0). 48 bits so every shift/sum stays
    exact in int64 under ANSI.
    No DuckDB oracle (xxhash64); invariants tested in pytest.
    """
    return simhash_pairs(load(spark, sf_dir, "documents"))


def _simhash_certified_oracle() -> str:
    """DuckDB rebuild of the ENTIRE certified SimHash pipeline: distinct
    shingles -> 48-bit sha-slice feature hashes -> 48 bit votes ->
    fingerprint -> chunk-pair bands -> hot-bucket cap -> Hamming join."""
    votes = ",\n             ".join(
        f"SUM(CASE WHEN ((hv >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    band_rows = ", ".join(
        f"({band}, {i}, {j})" for band, (i, j) in enumerate(_CHUNK_PAIRS)
    )
    mask = (1 << _CHUNK_BITS) - 1
    return f"""
    WITH t AS (
      SELECT doc_id,
             LIST_DISTINCT({sql_shingles(SQL_TOK_NULLSAFE)}) AS sh
      FROM documents
    ), tf AS (
      SELECT doc_id, sh FROM t WHERE LEN(sh) > 0
    ), ex AS (
      SELECT doc_id, UNNEST(sh) AS s FROM tf
    ), h AS (
      SELECT doc_id,
             CAST('0x' || SUBSTR(SHA256(s), 1, 12) AS BIGINT) AS hv
      FROM ex
    ), v AS (
      SELECT doc_id,
             {votes}
      FROM h GROUP BY doc_id
    ), fp AS (
      SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v
    ), bands AS (
      SELECT * FROM (VALUES {band_rows}) b(band, ci, cj)
    ), chunks AS (
      SELECT f.doc_id, f.simhash, b.band,
             (((f.simhash >> (b.ci * {_CHUNK_BITS})) & {mask})
                << {_CHUNK_BITS})
               + ((f.simhash >> (b.cj * {_CHUNK_BITS})) & {mask}) AS chunk_val
      FROM fp f CROSS JOIN bands b
    ), ok AS (
      SELECT doc_id, simhash, band, chunk_val FROM chunks
      QUALIFY COUNT(*) OVER (PARTITION BY band, chunk_val)
                <= {SIMHASH_MAX_BUCKET}
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(BIT_COUNT(XOR(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM ok a
    JOIN ok b
      ON a.band = b.band AND a.chunk_val = b.chunk_val
     AND a.doc_id < b.doc_id
    WHERE BIT_COUNT(XOR(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_MAX}
    """


@query(
    "dedup_simhash_certified",
    oracle=_simhash_certified_oracle(),
    tags=("llm", "dedup", "documents"),
)
def dedup_simhash_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with CERTIFIED arithmetic — the oracle-gated twin
    of ``dedup_simhash`` (VERDICT r11 #1): the SAME ``simhash_pairs``
    code path (fingerprint kernel, chunk-pair banding, hot-bucket cap,
    Hamming join are shared, not copied) with the one engine-specific
    stage — the xxhash64 feature hash — swapped for a sha256 12-hex-char
    slice, exactly SIMHASH_BITS uniform bits DuckDB rebuilds verbatim.
    The oracle re-derives every bit vote, the packed fingerprint, all 15
    band keys, the bucket census, and the Hamming distances, so the
    driver row certifies the sketch CONSTRUCTION end-to-end. The
    production query keeps xxhash64 (no sha amplification on the token
    stream); test_llm_ops pins both variants' pair invariants."""
    return simhash_pairs(
        load(spark, sf_dir, "documents"), portable=True
    ).select("a_id", "b_id", F.col("hamming").cast("long").alias("hamming"))


def _inc_simhash_certified_oracle() -> str:
    """DuckDB rebuild of the ENTIRE certified incremental SimHash
    pipeline: (corpus ∪ fixture) -> 48-bit sha-slice features -> bit
    votes -> fingerprints -> chunk-pair bands -> corpus-only hot-bucket
    census -> batch-vs-history Hamming join."""
    votes = ",\n             ".join(
        f"SUM(CASE WHEN ((hv >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    band_rows = ", ".join(
        f"({band}, {i}, {j})" for band, (i, j) in enumerate(_CHUNK_PAIRS)
    )
    mask = (1 << _CHUNK_BITS) - 1
    return f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL {_NEARDUP_FIXTURE_SQL}
    ), t AS (
      SELECT doc_id,
             LIST_DISTINCT({sql_shingles(SQL_TOK_NULLSAFE)}) AS sh
      FROM docs
    ), tf AS (
      SELECT doc_id, sh FROM t WHERE LEN(sh) > 0
    ), ex AS (
      SELECT doc_id, UNNEST(sh) AS s FROM tf
    ), h AS (
      SELECT doc_id,
             CAST('0x' || SUBSTR(SHA256(s), 1, 12) AS BIGINT) AS hv
      FROM ex
    ), v AS (
      SELECT doc_id,
             {votes}
      FROM h GROUP BY doc_id
    ), fp AS (
      SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v
    ), bands AS (
      SELECT * FROM (VALUES {band_rows}) b(band, ci, cj)
    ), chunks AS (
      SELECT f.doc_id, f.simhash, b.band,
             (((f.simhash >> (b.ci * {_CHUNK_BITS})) & {mask})
                << {_CHUNK_BITS})
               + ((f.simhash >> (b.cj * {_CHUNK_BITS})) & {mask}) AS chunk_val
      FROM fp f CROSS JOIN bands b
    ), hot AS (
      SELECT band, chunk_val FROM chunks
      WHERE doc_id < 2000000000
      GROUP BY band, chunk_val
      HAVING COUNT(*) > {SIMHASH_MAX_BUCKET}
    ), ok AS (
      SELECT c.doc_id, c.simhash, c.band, c.chunk_val
      FROM chunks c ANTI JOIN hot t
        ON c.band = t.band AND c.chunk_val = t.chunk_val
    )
    SELECT DISTINCT b.doc_id AS batch_id, h2.doc_id AS history_id,
           CAST(BIT_COUNT(XOR(b.simhash, h2.simhash)) AS BIGINT) AS hamming
    FROM ok b
    JOIN ok h2
      ON b.band = h2.band AND b.chunk_val = h2.chunk_val
    WHERE b.doc_id % 10 >= {_INCREMENTAL_BATCH_RESIDUE}
      AND h2.doc_id % 10 < {_INCREMENTAL_BATCH_RESIDUE}
      AND BIT_COUNT(XOR(b.simhash, h2.simhash)) <= {SIMHASH_HAMMING_MAX}
    """


@query(
    "dedup_incremental_simhash_certified",
    oracle=_inc_simhash_certified_oracle(),
    tags=("llm", "dedup", "documents", "incremental"),
)
def dedup_incremental_simhash_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SimHash admission with CERTIFIED arithmetic — the
    oracle-gated twin of ``dedup_incremental_simhash`` (VERDICT r12 #1,
    the fingerprint-family sibling of
    ``dedup_incremental_minhash_certified``): the SAME plan builder
    (``_incremental_simhash_pairs``; fingerprint kernel, chunk-pair
    banding, corpus-only census, batch-vs-history Hamming join are
    shared code) with the one engine-specific stage — the xxhash64
    feature hash — swapped for the sha256 12-hex-char slice
    (``portable_feature_hashes``) the oracle replays verbatim. The
    oracle re-derives every bit vote, fingerprint, band key, the
    corpus-only bucket blacklist, and each cross-split Hamming distance,
    so the driver row certifies steady-state fingerprint ADMISSION
    end-to-end; a restriction-equality test pins this twin against
    ``dedup_simhash_certified`` on cross-split pairs."""
    return _incremental_simhash_pairs(spark, sf_dir, portable=True).select(
        "batch_id", "history_id", F.col("hamming").cast("long").alias("hamming")
    )



def simhash_fingerprint_jvm() -> F.Column:
    """48 bit-vote folds over the hashed-shingle array (`hh`) — the
    pure-JVM fingerprint. Each fold re-traverses the array, so this costs
    48·|hh| ops/row inside codegen; the vectorized numpy kernel
    (simhash_fingerprint_np) computes the same fingerprint ~20× faster and
    is the query path. Agreement between the two is test-locked."""

    def bit_vote(j: int) -> F.Column:
        return F.aggregate(
            F.col("hh"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    simhash = None
    for j in range(SIMHASH_BITS):
        term = F.when(bit_vote(j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = term if simhash is None else simhash + term
    return simhash


def simhash_fingerprint_np():
    """Arrow-batched numpy SimHash fingerprint: per document, extract the
    48 bit columns of its hash array in one (|hh| × 48) broadcasted shift,
    majority-vote, bit-pack. Arithmetic-vs-logical shift is irrelevant for
    `(h >> j) & 1` at j < 64, so the result is bit-identical to the JVM
    fold (test-locked)."""
    import numpy as np
    import pandas as pd

    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    pow2 = 1 << np.arange(SIMHASH_BITS, dtype=np.int64)

    def _fp(hh):
        out = np.empty(len(hh), dtype=np.int64)
        for i, arr in enumerate(hh):
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            bits = ((h[:, None] >> shifts) & 1).astype(np.int64)
            votes = 2 * bits.sum(0) - len(h)
            out[i] = int(pow2[votes > 0].sum())
        return pd.Series(out)

    # real class annotations: `from __future__ import annotations` would
    # stringify inline hints, which pandas_udf's inspection rejects
    _fp.__annotations__ = {"hh": pd.Series, "return": pd.Series}
    return F.pandas_udf(_fp, "long")


def simhash_chunk_table(fp: DataFrame) -> DataFrame:
    """(doc_id, simhash, chunk, chunk_val) — one row per chunk-PAIR band of
    each fingerprint (16-bit band keys; see the module constants). Shared
    by the one-shot and incremental SimHash queries so their band keys can
    never drift."""

    def _chunk_val(c: int) -> F.Column:
        return F.shiftright(F.col("simhash"), c * _CHUNK_BITS).bitwiseAND(
            F.lit((1 << _CHUNK_BITS) - 1)
        )

    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("chunk"),
                # 16-bit band key: both chunk values of the pair
                (F.shiftleft(_chunk_val(i), _CHUNK_BITS) + _chunk_val(j)).alias(
                    "chunk_val"
                ),
            )
            for band, (i, j) in enumerate(_CHUNK_PAIRS)
        ]
    )
    return fp.select("doc_id", "simhash", F.explode(band_structs).alias("cc")).select(
        "doc_id",
        "simhash",
        F.col("cc.chunk").alias("chunk"),
        F.col("cc.chunk_val").alias("chunk_val"),
    )


def _drop_hot_simhash_buckets(
    chunks: DataFrame, max_bucket_pop: int, census_over: DataFrame | None = None
) -> DataFrame:
    """Hot-bucket cap (mirror of the shingle DF cap): census per band
    bucket, blacklist the over-populated ones (tiny by construction:
    ≤ rows/cap), anti-join them off before the quadratic-in-bucket join.

    ``census_over`` lets the caller pin WHICH rows the census counts while
    still filtering the full ``chunks`` frame — the incremental query
    passes its corpus-only subset so certification fixture rows cannot
    perturb a bucket across the cap boundary and silently diverge its
    blacklist from the one-shot query's (the restriction-equality
    invariant's edge case)."""
    hot = (
        (census_over if census_over is not None else chunks)
        .groupBy("chunk", "chunk_val")
        .agg(F.count(F.lit(1)).alias("_pop"))
        .filter(F.col("_pop") > max_bucket_pop)
        .select("chunk", "chunk_val")
    )
    return chunks.join(hot, ["chunk", "chunk_val"], "left_anti")


def portable_feature_hashes(feats: F.Column) -> F.Column:
    """sha256-slice of each shingle as a 48-bit feature hash in
    [0, 2^SIMHASH_BITS): the engine-portable twin of the xxhash64 feature
    hash (12 hex chars = exactly SIMHASH_BITS uniform bits, so every
    fingerprint bit draws from real hash entropy)."""
    return F.transform(
        feats,
        lambda t: F.conv(F.substring(F.sha2(t, 256), 1, 12), 16, 10).cast("long"),
    )


def simhash_pairs(
    d: DataFrame,
    max_bucket_pop: int = SIMHASH_MAX_BUCKET,
    portable: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs over any (doc_id, text) DataFrame; the bucket
    cap is a parameter so invariants can exercise template-heavy corpora
    directly (see test_llm_ops.py). ``portable`` swaps the xxhash64
    feature hash for the sha-slice one the DuckDB oracle can replay —
    every other stage (fingerprint kernel, chunk-pair banding, hot-bucket
    cap, Hamming join) is the same code either way."""
    scope = "simhash_cert" if portable else "simhash"
    feat_hash = portable_feature_hashes if portable else (
        lambda feats: F.transform(feats, lambda t: F.xxhash64(t))
    )
    # hashes staged through a persisted select: projection collapse would
    # otherwise inline the shingle+hash expression into the fingerprint UDF
    hashed_df = _persist_scoped(
        f"{scope}_hashed",
        d.select(
            "doc_id",
            F.array_distinct(shingles(ws_tokens("text"))).alias("feats"),
        )
        .filter(F.size("feats") > 0)
        .select("doc_id", feat_hash(F.col("feats")).alias("hh")),
    )

    # fingerprints persisted: read 3× below (hot-bucket census + both join
    # sides); 16 bytes/row, so the cache is tiny even at corpus scale
    fp = _persist_scoped(
        f"{scope}_fp",
        hashed_df.select(
            "doc_id", simhash_fingerprint_np()(F.col("hh")).alias("simhash")
        ),
    )

    chunks = simhash_chunk_table(fp)
    chunks = _drop_hot_simhash_buckets(chunks, max_bucket_pop)
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["a_id", "b_id"])
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
    )


# ---------------------------------------------------------------------------
# Substring-level dedup: cross-document repeated passages (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better") — the rest of
# the dedup family is DOCUMENT-level; memorization studies show long
# passages repeated ACROSS distinct documents are what models memorize.
# ---------------------------------------------------------------------------

#: passage length in tokens: long enough that a natural collision is
#: essentially impossible, short enough to catch boilerplate runs
PASSAGE_TOKENS = 15

_PASSAGE_FIXTURE_SQL = _NEARDUP_FIXTURE_SQL


@query(
    "dedup_repeated_passages",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL {_PASSAGE_FIXTURE_SQL}
    ), p AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT(
               {sql_shingles(SQL_WS_TOKENS.format(c='text'), PASSAGE_TOKENS)}))
               AS passage
      FROM docs
    )
    SELECT passage,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM p
    GROUP BY passage
    HAVING COUNT(*) >= 2
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage audit — substring-level dedup: every
    PASSAGE_TOKENS-token passage appearing in at least two DISTINCT
    documents, with its spread and the min-id keeper. The action a
    training pipeline takes downstream is to drop the passage from all
    but the keeper (Lee et al.'s ExactSubstr); this is the audit table
    that decision reads. Document-level dedup (the rest of the family)
    cannot see these: two documents sharing one boilerplate paragraph sit
    far below any whole-document Jaccard threshold.

    The certification unions INCREMENTAL_NEARDUP_FIXTURE_ROWS — the base
    document and its one-token-rewritten near-copy share every passage
    window not touching the rewritten token, so the result is non-empty
    BY CONSTRUCTION at any SF (the synthetic corpus's own small
    vocabulary happens to produce natural repeats too, but the fixture
    guarantee does not depend on that).

    Scale shape: one token pass explodes to per-doc DISTINCT passages
    (map-side distinct inside the aggregate), one partial-agg'd groupBy
    on the passage key; the HAVING >= 2 filter keeps only the (tiny)
    repeated tail. This string-keyed form is the oracle-checkable AUDIT
    (the DuckDB twin needs the strings); the production path —
    :func:`repeated_passage_audit_hashed` and ``dedup_passage_prune``,
    both built on the shared :func:`_audit_from_distinct_window_pairs`
    aggregation — shuffles the 16-byte :func:`passage_hash_pair` instead,
    and the equivalence of the two audits is pinned by
    ``test_hashed_passage_audit_matches_string_audit``."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .unionByName(
            spark.createDataFrame(
                [(i, t) for i, t, _ in INCREMENTAL_NEARDUP_FIXTURE_ROWS],
                "doc_id long, text string",
            )
        )
    )
    # array_distinct makes (doc_id, passage) unique already (doc_ids are
    # unique across corpus + fixtures) — no row-level distinct needed, so
    # the exploded stream shuffles ONCE, on the passage key
    p = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(ws_tokens("text"), PASSAGE_TOKENS))
        ).alias("passage"),
    )
    return (
        p.groupBy("passage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def passage_hash_pair(passage: F.Column) -> tuple[F.Column, F.Column]:
    """Two independent 64-bit fingerprints of a passage string — the
    16-byte production key for passage-level dedup. A 15-token passage
    string averages ~100 bytes; shuffling the (h1, h2) pair instead cuts
    the exploded stream's exchange ~6x, and a pair collision needs a
    128-bit match (~2^-64 per pair at corpus scale — below hardware
    error rates). ``h2`` seeds xxhash64 with an extra literal column so
    the two hashes are independent, not copies."""
    return (
        F.xxhash64(passage).alias("h1"),
        F.xxhash64(F.lit("passage-h2"), passage).alias("h2"),
    )


def _audit_from_distinct_window_pairs(pairs: DataFrame) -> DataFrame:
    """The ONE definition of the hashed repeated-passage audit aggregation:
    given per-document DISTINCT (doc_id, h1, h2) window pairs, return
    (h1, h2, n_docs, keeper_doc_id) for windows spanning >= 2 documents
    with the min-id keeper. Both :func:`repeated_passage_audit_hashed`
    and ``dedup_passage_prune`` call this, so the grouping/keeper/
    threshold semantics cannot drift between them."""
    return (
        pairs.groupBy("h1", "h2")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def repeated_passage_audit_hashed(docs: DataFrame) -> DataFrame:
    """PRODUCTION form of the repeated-passage audit: identical grouping
    semantics to ``dedup_repeated_passages`` (distinct per-doc
    PASSAGE_TOKENS-token windows, COUNT >= 2, min-id keeper) but keyed by
    the fixed-width :func:`passage_hash_pair` — the passage STRING is
    projected away before the shuffle, so the exchange carries 16-byte
    keys instead of ~100-byte strings (the scale note on the audit query,
    made real). ``tests/test_llm_ops.py::
    test_hashed_passage_audit_matches_string_audit`` pins that both
    audits select identical (n_docs, keeper) sets.

    Returns (h1, h2, n_docs, keeper_doc_id)."""
    p = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(ws_tokens("text"), PASSAGE_TOKENS))
        ).alias("passage"),
    )
    return _audit_from_distinct_window_pairs(
        p.select("doc_id", *passage_hash_pair(F.col("passage")))
    )


def _passage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ the near-dup fixture — the shared corpus of the passage
    audit and the passage prune, so the prune certifiably has repeated
    passages to remove at any SF. Spread here once (r17, guide §2.5) so
    every passage-family consumer's tokenize/shingle stage parallelizes
    past the single-split local scan (no-op on multi-split inputs)."""
    from projet_pipeline_bigdata_org_spark.catalog import spread_input

    return (
        spread_input(load(spark, sf_dir, "documents").select("doc_id", "text"))
        .unionByName(
            spark.createDataFrame(
                [(i, t) for i, t, _ in INCREMENTAL_NEARDUP_FIXTURE_ROWS],
                "doc_id long, text string",
            )
        )
    )


@query(
    "dedup_passage_prune",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL {_PASSAGE_FIXTURE_SQL}
    ), t AS (
      SELECT doc_id, text, {SQL_WS_TOKENS.format(c='text')} AS toks FROM docs
    ), s AS (
      SELECT doc_id, {sql_shingles('toks', PASSAGE_TOKENS)} AS sh FROM t
    ), w AS (
      SELECT doc_id, gs.i - 1 AS start, sh[gs.i] AS passage
      FROM s, UNNEST(GENERATE_SERIES(1, LEN(sh))) AS gs(i)
    ), audit AS (
      SELECT passage, MIN(doc_id) AS keeper
      FROM (SELECT DISTINCT doc_id, passage FROM w) dw
      GROUP BY passage
      HAVING COUNT(*) >= 2
    ), covered AS (
      SELECT w.doc_id, w.start
      FROM w JOIN audit USING (passage)
      WHERE audit.keeper <> w.doc_id
    ), cov_docs AS (
      SELECT DISTINCT doc_id FROM covered
    ), pos AS (
      SELECT t.doc_id, gs.i AS i, t.toks[gs.i] AS tok
      FROM t JOIN cov_docs USING (doc_id),
           UNNEST(GENERATE_SERIES(1, LEN(t.toks))) AS gs(i)
    ), kept AS (
      SELECT p.doc_id, p.i, p.tok
      FROM pos p
      WHERE NOT EXISTS (
        SELECT 1 FROM covered c
        WHERE c.doc_id = p.doc_id
          AND p.i - 1 >= c.start AND p.i - 1 < c.start + {PASSAGE_TOKENS})
    ), rebuilt AS (
      SELECT doc_id,
             STRING_AGG(tok, ' ' ORDER BY i) AS pruned_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CASE WHEN cd.doc_id IS NULL THEN t.text
                ELSE COALESCE(r.pruned_text, '') END AS pruned_text,
           CAST(CASE WHEN cd.doc_id IS NULL THEN 0
                ELSE LEN(t.toks) - COALESCE(r.n_kept, 0) END AS BIGINT)
             AS n_tokens_removed
    FROM t
    LEFT JOIN cov_docs cd USING (doc_id)
    LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_passage_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr passage-removal APPLIER: reconstructs every document
    with its cross-document repeated passages excised — the transform Lee
    et al. 2022's pipeline actually feeds downstream; the
    ``dedup_repeated_passages`` audit is the table this decision reads.
    A token position is removed iff it falls inside at least one
    PASSAGE_TOKENS-token window that (a) occurs in >= 2 distinct
    documents and (b) has its min-id keeper elsewhere — so exactly one
    copy of every repeated passage survives, in the keeper, and prose
    around the excised spans is preserved. Overlapping qualifying windows
    union their spans (covered-position semantics, not per-window
    deletion, so a run of boilerplate longer than one window excises as
    one contiguous span).

    Returns (doc_id, pruned_text, n_tokens_removed); untouched documents
    pass through verbatim (NULL text stays NULL) with 0 removed.

    Scale shape — the production path shuffles NO passage strings:
    1. ONE tokenize+shingle+hash pass builds the persisted per-position
       window table (doc_id, start, h1, h2) — 32-byte rows; both the
       audit and the covered-span join read it (recomputing the text
       chain per branch instead measured 31% slower at sf0.1: 3.16s vs
       2.40s). At cluster scale this table is corpus-sized — the same
       footprint call as the minhash band store, and like it the 100 TB
       form writes it once per corpus epoch as a bucketed staging table
       (sources/batch.py: write_bucketed_table) instead of caching;
    2. the audit derives from the window table via the SHARED
       :func:`_audit_from_distinct_window_pairs` aggregation (the same
       code path as :func:`repeated_passage_audit_hashed`, which the
       string-audit equivalence test pins), never a string shuffle;
    3. covered starts fold to one array per doc (collect_set — spans
       dedupe), join back to the token table by doc_id, and the rebuild
       is a per-row higher-order filter+array_join inside codegen: no
       per-token explode on the Spark side (the oracle's per-token UNNEST
       is the DuckDB-expressible twin, restricted to affected docs).
    The DuckDB twin rebuilds from passage STRINGS — the equivalence of
    string- and hash-keyed audits is pinned separately, so a driver match
    here certifies the whole hash path end-to-end."""
    docs = _passage_docs(spark, sf_dir)
    toks = docs.select("doc_id", "text", ws_tokens("text").alias("toks"))
    win = _persist_scoped(
        "passage_win",
        toks.select(
            "doc_id",
            F.posexplode(shingles(F.col("toks"), PASSAGE_TOKENS)).alias(
                "start", "passage"
            ),
        ).select("doc_id", "start", *passage_hash_pair(F.col("passage"))),
    )
    audit = _audit_from_distinct_window_pairs(
        win.select("doc_id", "h1", "h2").distinct()
    )
    covered = (
        win.join(audit.select("h1", "h2", "keeper_doc_id"), ["h1", "h2"])
        .filter(F.col("keeper_doc_id") != F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.collect_set("start").alias("cov"))
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            F.col("cov"), lambda s: (i >= s) & (i < s + PASSAGE_TOKENS)
        ),
    )
    return toks.join(covered, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("cov").isNull(), F.col("text"))
        .otherwise(F.array_join(kept, " "))
        .alias("pruned_text"),
        F.when(F.col("cov").isNull(), F.lit(0))
        .otherwise(F.size("toks") - F.size(kept))
        .cast("long")
        .alias("n_tokens_removed"),
    )


@query(
    "dedup_incremental_passages",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL {_PASSAGE_FIXTURE_SQL}
    ), t AS (
      SELECT doc_id,
             LIST_DISTINCT(
               {sql_shingles(SQL_TOK_NULLSAFE, PASSAGE_TOKENS)})
               AS ps
      FROM docs
    ), hist AS (
      SELECT DISTINCT UNNEST(ps) AS p FROM t
      WHERE doc_id % 10 < {_INCREMENTAL_BATCH_RESIDUE}
    ), b AS (
      SELECT doc_id, ps FROM t
      WHERE doc_id % 10 >= {_INCREMENTAL_BATCH_RESIDUE}
    ), hits AS (
      SELECT bb.doc_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT doc_id, UNNEST(ps) AS p FROM b) bb
      JOIN hist USING (p)
      GROUP BY bb.doc_id
    )
    SELECT b.doc_id,
           CAST(LEN(b.ps) AS BIGINT) AS n_passages,
           COALESCE(h.n, 0) AS n_hist_repeated,
           COALESCE(h.n, 0) >= 1 AS flagged
    FROM b LEFT JOIN hits h ON h.doc_id = b.doc_id
    """,
    tags=("llm", "dedup", "documents", "incremental"),
)
def dedup_incremental_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SUBSTRING-level dedup: an incoming shard's 15-token
    passage windows checked against the historical corpus's window
    dictionary — the steady-state form of ``dedup_repeated_passages``
    exactly as ``dedup_incremental_exact`` is of exact dedup, extending
    the {{exact, minhash, simhash}} x {{one-shot, incremental}} matrix to
    the passage level. A batch document is ``flagged`` when ANY of its
    distinct windows already exists in history (the Lee et al. signal at
    admission time: boilerplate re-entering the pool); per-doc counts
    ride so a scheduler can grade severity. Documents with <15 tokens
    have zero windows, report 0, and can never flag — same both engines.

    History/batch split is the sibling queries' deterministic doc_id
    residue; INCREMENTAL_NEARDUP_FIXTURE_ROWS straddles it (base doc in
    history, one-token rewrite in the batch — they share every window
    not touching the rewritten token), so the hit path is non-vacuous at
    any SF.

    Scale shape: the production join carries the 16-byte
    :func:`passage_hash_pair`, never strings (the string form is the
    DuckDB twin, same discipline as dedup_passage_prune); ONE
    tokenize+shingle+hash pass builds the persisted distinct
    (doc_id, h1, h2) window table feeding the history dictionary, the
    membership join, AND the per-doc sizes (the unpersisted form
    recomputed the text chain three times — measured 5.78s vs 3.80s at
    sf0.1, N=5 medians); the history side reduces to its DISTINCT window-pair
    dictionary — at 100 TB a staging table bucketed by (h1, h2) written
    once per corpus epoch (sources/batch.py: write_bucketed_table),
    making the membership join zero-shuffle on the history side while
    each daily shard shuffles only its own delta; the per-doc rollup is
    a partial-agg'd groupBy on the shard's doc_id. Zero-window batch
    docs come from a window-free id scan of the corpus, so they still
    report (0, false)."""
    docs = _passage_docs(spark, sf_dir)
    is_batch = F.col("doc_id") % 10 >= _INCREMENTAL_BATCH_RESIDUE
    # NULL text tokenizes to zero windows in BOTH twins (SQL_TOK_NULLSAFE
    # in the oracle; without the coalesce DuckDB reports n_passages NULL
    # where Spark reports 0 — the r8 size(NULL) pitfall)
    win = _persist_scoped(
        "incpass_win",
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    shingles(
                        ws_tokens(F.coalesce(F.col("text"), F.lit(""))),
                        PASSAGE_TOKENS,
                    )
                )
            ).alias("passage"),
        ).select("doc_id", *passage_hash_pair(F.col("passage"))),
    )
    hist = (
        win.filter(~is_batch)
        .select("h1", "h2")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # ONE left join + ONE groupBy yields both sizes and hit counts (the
    # dictionary is distinct, so the join never multiplies rows); the
    # id-scan left join restores zero-window batch docs
    per_doc = (
        win.filter(is_batch)
        .join(hist, ["h1", "h2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.count("hit").alias("n"),
        )
    )
    n = F.coalesce(F.col("n"), F.lit(0).cast("long"))
    return (
        docs.filter(is_batch)
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_passages"), F.lit(0)).cast("long").alias(
                "n_passages"
            ),
            n.alias("n_hist_repeated"),
            (n >= 1).alias("flagged"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental exact dedup: the admission join cost model
# at 100 TB. dedup_incremental_exact joins the WHOLE incoming shard against
# the history sha table; with petabytes of history and a mostly-novel shard
# that join shuffles the entire shard for a handful of hits. A Bloom filter
# built from history (one bounded-size pass, <= BLOOM_SHA_BITS distinct
# positions shuffled) prefilters the shard via broadcast joins -- only
# probable duplicates (true hits + a small false-positive class) reach the
# confirm join; everything else is admitted as novel WITHOUT touching
# history. No false negatives, so the confirm join restores exactness.
# ---------------------------------------------------------------------------

#: 1-based substr offsets of four disjoint 4-hex-char slices of the 64-hex
#: content sha. Each slice parses to a uniform 16-bit integer (sha output is
#: uniform), giving four independent hash positions into a 65,536-bit filter
#: with no modulo and no engine-specific hash function: Spark reads a slice
#: with conv(x,16,10), DuckDB with ('0x'||x)::BIGINT, and both see the SAME
#: lowercase hex sha string.
BLOOM_SHA_OFFSETS: tuple[int, ...] = (1, 11, 21, 31)
BLOOM_SHA_BITS = 1 << 16

_BLOOM_POS_ORACLE = "CAST(('0x' || SUBSTR({sha}, {off}, 4)) AS BIGINT)"


def _bloom_slice_pos(sha_col: F.Column, off: int) -> F.Column:
    """One filter position: a 4-hex-char sha slice parsed as a 16-bit int
    (Spark twin of _BLOOM_POS_ORACLE; NULL sha -> NULL position)."""
    return F.conv(F.substring(sha_col, off, 4), 16, 10).cast("long")


def bloom_position_table(history: DataFrame, sha_col: str = "content_sha") -> DataFrame:
    """The Bloom filter as a table of distinct set positions (<=
    BLOOM_SHA_BITS rows at ANY history size) — shared by the batch
    operator and the streaming HistoryDedupSink so the bits cannot
    drift between the two admission paths."""
    return history.select(
        F.explode(
            F.array(*[_bloom_slice_pos(F.col(sha_col), o) for o in BLOOM_SHA_OFFSETS])
        ).alias("pos")
    ).distinct()


def mark_bloom_candidates(
    df: DataFrame, bloom: DataFrame, sha_col: str = "content_sha"
) -> DataFrame:
    """Append ``is_cand`` (1 iff ALL four sha-slice positions are set) via
    four explicit-BROADCAST left joins — the probed side never shuffles,
    and the flag is never NULL (a NULL sha matches no position and lands
    at 0), so candidate/rest splits lose no rows."""
    out = df
    k = len(BLOOM_SHA_OFFSETS)
    for i, off in enumerate(BLOOM_SHA_OFFSETS):
        out = out.join(
            F.broadcast(bloom.select(F.col("pos").alias(f"_bf{i}"))),
            _bloom_slice_pos(F.col(sha_col), off) == F.col(f"_bf{i}"),
            "left",
        )
    is_cand = F.when(
        F.expr(" AND ".join(f"_bf{i} IS NOT NULL" for i in range(k))), 1
    ).otherwise(0)
    return out.withColumn("is_cand", is_cand).drop(*[f"_bf{i}" for i in range(k)])


@query(
    "dedup_bloom_incremental",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      {_INCREMENTAL_FIXTURE_SQL}
    ), history AS (
      SELECT DISTINCT SHA256(text) AS content_sha
      FROM corpus WHERE doc_id % 10 < {_INCREMENTAL_BATCH_RESIDUE}
    ), bloom AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(
            "SELECT " + _BLOOM_POS_ORACLE.format(sha="content_sha", off=off)
            + " AS pos FROM history"
            for off in BLOOM_SHA_OFFSETS
        )}
      )
    ), batch AS (
      SELECT doc_id, source, SHA256(text) AS content_sha
      FROM corpus WHERE doc_id % 10 >= {_INCREMENTAL_BATCH_RESIDUE}
    ), probed AS (
      SELECT b.doc_id, b.source, b.content_sha,
             CASE WHEN {" AND ".join(f"b{i}.pos IS NOT NULL" for i in range(len(BLOOM_SHA_OFFSETS)))}
                  THEN 1 ELSE 0 END AS is_cand
      FROM batch b
      {" ".join(
          "LEFT JOIN bloom b" + str(i) + " ON "
          + _BLOOM_POS_ORACLE.format(sha="b.content_sha", off=off)
          + " = b" + str(i) + ".pos"
          for i, off in enumerate(BLOOM_SHA_OFFSETS)
      )}
    ), confirmed AS (
      SELECT p.source, p.is_cand,
             CASE WHEN h.content_sha IS NOT NULL THEN 1 ELSE 0 END AS is_dup
      FROM probed p
      LEFT JOIN history h
        ON p.is_cand = 1 AND p.content_sha = h.content_sha
    )
    SELECT source,
           COUNT(*) AS n_incoming,
           CAST(SUM(is_cand) AS BIGINT) AS n_bloom_candidates,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup_vs_history,
           CAST(COUNT(*) - SUM(is_dup) AS BIGINT) AS n_novel
    FROM confirmed
    GROUP BY source
    """,
    tags=("llm", "dedup", "documents", "incremental", "sketch"),
)
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup with a Bloom-filter admission prefilter:
    same corpus split, fixture, and exactness as ``dedup_incremental_exact``
    (equality test-pinned), plus the sketch that makes the steady-state
    admission join cheap at 100 TB.

    Filter geometry: four disjoint 4-hex-char slices of the content sha
    are four independent uniform 16-bit hash positions into a 65,536-bit
    filter (BLOOM_SHA_OFFSETS) -- no modulo, no engine-specific hash, and
    the oracle replays the identical bits, so the driver certifies the
    Bloom arithmetic itself, not just the final report. Sizing note: m is
    a constant here for oracle replay; production sizes m ~ 16-20 bits
    per historical document (FP < 1%) and rebuilds the filter per corpus
    epoch -- the construction is one bounded aggregation either way.

    Scale shape: history is read once to build the filter (shuffle <=
    BLOOM_SHA_BITS distinct-position rows at ANY history size) and once
    more by the confirm join, which now sees ONLY candidates (true dups +
    the tiny false-positive class); the shard probes via four BROADCAST
    left joins, so the non-candidate bulk of the shard is admitted novel
    with zero shuffle. A sha slice of a NULL text is NULL, matches no
    position, and lands in the non-candidate branch -- novel in both
    twins (the is_cand flag is never NULL, so the candidate/rest split
    loses no rows)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source").unionByName(
        spark.createDataFrame(
            list(INCREMENTAL_FIXTURE_ROWS), "doc_id long, text string, source string"
        )
    )
    sha = F.sha2(F.col("text"), 256)
    # the history sha pass is consumed twice (filter build + confirm join):
    # persist the shared pass (bench-methodology rule), sparing one full
    # corpus scan+hash per run; at cluster scale this is the bucketed
    # staging table both consumers read
    history = _persist_scoped(
        "bloom_history",
        d.filter(F.col("doc_id") % 10 < _INCREMENTAL_BATCH_RESIDUE)
        .select(sha.alias("content_sha"))
        .distinct(),
    )
    batch = d.filter(F.col("doc_id") % 10 >= _INCREMENTAL_BATCH_RESIDUE).select(
        "doc_id", "source", sha.alias("content_sha")
    )
    # r17: persist the probed shard — referenced by BOTH the candidate
    # branch and the non-candidate branch, so unpinned the shard sha pass
    # + the four broadcast probe joins ran twice
    probed = _persist_scoped(
        "bloom_probed", mark_bloom_candidates(batch, bloom_position_table(history))
    )
    confirmed = (
        probed.filter(F.col("is_cand") == 1)
        .join(history.withColumn("in_history", F.lit(1)), "content_sha", "left")
        .select(
            "source",
            "is_cand",
            F.when(F.col("in_history").isNotNull(), 1).otherwise(0).alias("is_dup"),
        )
    )
    rest = probed.filter(F.col("is_cand") == 0).select(
        "source", "is_cand", F.lit(0).alias("is_dup")
    )
    return (
        confirmed.unionByName(rest)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.sum("is_cand").cast("long").alias("n_bloom_candidates"),
            F.sum("is_dup").cast("long").alias("n_dup_vs_history"),
            (F.count(F.lit(1)) - F.sum("is_dup")).cast("long").alias("n_novel"),
        )
    )


# ---------------------------------------------------------------------------
# line-level boilerplate audit (CCNet's granularity, below the passage level)
# ---------------------------------------------------------------------------

#: a line must appear in at least this many DISTINCT documents to be
#: boilerplate (CCNet trims at paragraph spread; 3 separates template
#: chrome from the legitimate 2-document quote)
BOILERPLATE_MIN_DOCS = 3

#: multi-line rider docs (the corpus text is single-line by generation):
#: four docs sharing an "all rights reserved" footer (one in different
#: CASE and padding — the normalization must merge it), three sharing a
#: newsletter line, and unique bodies that must NOT flag
BOILERPLATE_FIXTURE_ROWS: tuple[tuple[int, tuple[str, ...]], ...] = (
    (91_000_001, ("unique body alpha", "subscribe to our newsletter", "all rights reserved")),
    (91_000_002, ("unique body beta", "subscribe to our newsletter", "All Rights Reserved  ")),
    (91_000_003, ("unique body gamma", "Subscribe to our newsletter".lower(), "all rights reserved")),
    (91_000_004, ("unique body delta", "all rights reserved")),
)

_BOILERPLATE_FIXTURE_SQL = " UNION ALL ".join(
    "SELECT CAST({i} AS BIGINT) AS doc_id, {t} AS text".format(
        i=i, t=" || CHR(10) || ".join("'" + ln + "'" for ln in lines)
    )
    for i, lines in BOILERPLATE_FIXTURE_ROWS
)


@query(
    "dedup_boilerplate_lines",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL {_BOILERPLATE_FIXTURE_SQL}
    ), lines AS (
      SELECT DISTINCT doc_id,
             LOWER(TRIM(UNNEST(STRING_SPLIT(text, CHR(10))))) AS line
      FROM docs
    )
    SELECT line,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM lines
    WHERE line <> ''
    GROUP BY line
    HAVING COUNT(*) >= {BOILERPLATE_MIN_DOCS}
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate audit — CCNet's dedup granularity, the
    level BELOW ``dedup_repeated_passages``: every normalized (lower,
    trimmed) newline-delimited line appearing in at least
    BOILERPLATE_MIN_DOCS distinct documents, with its spread and min-id
    keeper. This is the navigation-chrome / cookie-banner / footer
    remover of the CCNet pipeline: such lines are far shorter than a
    PASSAGE_TOKENS-token window (the passage audit cannot see them) and
    repeat across documents that share no other content (document-level
    Jaccard cannot either), so all three granularities — document,
    passage, line — are needed and now present.

    The corpus text is single-line by generation (each document is then
    itself one 'line' — whole-document exact duplicates surface here
    consistently with ``dedup_exact_normalized``); the
    BOILERPLATE_FIXTURE_ROWS rider carries real multi-line documents so
    the cross-document footer semantics (including case/padding
    normalization folding variants together) are certified at any SF.

    Scale shape: mirrors the passage audit exactly — one explode, a
    per-doc DISTINCT folded into the explode stream, ONE partial-agg'd
    groupBy on the line key, HAVING keeps the tiny repeated tail. At
    100 TB the line key rides as the 16-byte hash pair
    (:func:`passage_hash_pair` applies verbatim — the equivalence is
    already pinned at the passage level, and this audit is string-keyed
    for the same reason that one is: the DuckDB twin reads the strings)."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .unionByName(
            spark.createDataFrame(
                [(i, "\n".join(lines)) for i, lines in BOILERPLATE_FIXTURE_ROWS],
                "doc_id long, text string",
            )
        )
    )
    lines = d.select(
        "doc_id",
        F.explode(boilerplate_norm_lines(F.col("text"))).alias("line"),
    )
    return (
        lines.groupBy("line")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
    )


def boilerplate_norm_lines(c: F.Column) -> F.Column:
    """A document's DISTINCT normalized (lower, trimmed) non-empty
    newline-delimited lines — THE line-dedup kernel, shared by the
    one-shot audit (``dedup_boilerplate_lines``), the incremental check
    (``dedup_incremental_boilerplate``), and the streaming
    ``BoilerplateHistoryDedupSink`` (the canonical_urls one-kernel
    discipline: three granule consumers, one line definition). NULL text
    yields an empty array in both engines (the filter drops the single
    '' a NULL would coalesce to)."""
    return F.filter(
        F.array_distinct(
            F.transform(
                F.split(F.coalesce(c, F.lit("")), "\n"),
                lambda x: F.lower(F.trim(x)),
            )
        ),
        lambda x: x != "",
    )


#: DuckDB twin of :func:`boilerplate_norm_lines`
SQL_NORM_LINES = (
    "LIST_DISTINCT(LIST_FILTER(LIST_TRANSFORM("
    "STRING_SPLIT(COALESCE({c}, ''), CHR(10)), x -> LOWER(TRIM(x))),"
    " x -> x <> ''))"
)

#: multi-line rider docs STRADDLING the incremental residue split (ids
#: chosen by doc_id % 10: residue < _INCREMENTAL_BATCH_RESIDUE = history):
#: a history doc whose footer line enters the dictionary, a batch doc
#: re-carrying that footer in different CASE and padding (must flag only
#: through the normalization), and a batch doc of novel lines (must not)
INCREMENTAL_BOILERPLATE_FIXTURE_ROWS: tuple[tuple[int, tuple[str, ...]], ...] = (
    (92_000_001, ("history body one", "Copyright Footer Line", "history body two")),
    (92_000_008, ("batch body alpha", "  copyright footer line ", "batch body beta")),
    (92_000_009, ("batch unique gamma", "batch unique delta")),
)

_INC_BOILERPLATE_FIXTURE_SQL = " UNION ALL ".join(
    "SELECT CAST({i} AS BIGINT) AS doc_id, {t} AS text".format(
        i=i, t=" || CHR(10) || ".join("'" + ln + "'" for ln in lines)
    )
    for i, lines in INCREMENTAL_BOILERPLATE_FIXTURE_ROWS
)


def _boilerplate_inc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .unionByName(
            spark.createDataFrame(
                [
                    (i, "\n".join(lines))
                    for i, lines in INCREMENTAL_BOILERPLATE_FIXTURE_ROWS
                ],
                "doc_id long, text string",
            )
        )
    )


@query(
    "dedup_incremental_boilerplate",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL {_INC_BOILERPLATE_FIXTURE_SQL}
    ), t AS (
      SELECT doc_id, {SQL_NORM_LINES.format(c='text')} AS ls FROM docs
    ), hist AS (
      SELECT DISTINCT UNNEST(ls) AS line FROM t
      WHERE doc_id % 10 < {_INCREMENTAL_BATCH_RESIDUE}
    ), b AS (
      SELECT doc_id, ls FROM t
      WHERE doc_id % 10 >= {_INCREMENTAL_BATCH_RESIDUE}
    ), hits AS (
      SELECT bb.doc_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT doc_id, UNNEST(ls) AS line FROM b) bb
      JOIN hist USING (line)
      GROUP BY bb.doc_id
    )
    SELECT b.doc_id,
           CAST(LEN(b.ls) AS BIGINT) AS n_lines,
           COALESCE(h.n, 0) AS n_hist_repeated,
           COALESCE(h.n, 0) >= 1 AS flagged
    FROM b LEFT JOIN hits h ON h.doc_id = b.doc_id
    """,
    tags=("llm", "dedup", "documents", "incremental"),
)
def dedup_incremental_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LINE-level dedup — the steady-state form of the
    ``dedup_boilerplate_lines`` audit, completing the boilerplate row of
    the dedup matrix (VERDICT r13 #4): an incoming shard's normalized
    lines checked against the historical corpus's distinct-line
    dictionary, exactly as ``dedup_incremental_passages`` is of the
    passage audit. A batch document is ``flagged`` when ANY of its
    distinct normalized lines already exists in history (navigation
    chrome / cookie banners / footers re-entering the pool — CCNet's
    granularity at admission time); per-doc hit counts ride so a
    scheduler can grade severity. All three consumers share ONE line
    kernel (:func:`boilerplate_norm_lines`), so the audit, the
    admission check, and the streaming sink cannot normalize
    differently.

    History/batch split is the sibling queries' deterministic doc_id
    residue; INCREMENTAL_BOILERPLATE_FIXTURE_ROWS straddles it (footer
    in history, case/padding-variant footer in the batch — flags only
    through the normalization; a novel-lines batch doc must not), so
    both branches are non-vacuous at any SF.

    Scale shape: mirrors the passage form exactly — the production join
    carries the 16-byte :func:`passage_hash_pair` of the line, never
    strings (the DuckDB twin reads strings; the hash-pair/string
    equivalence is pinned at the passage level); ONE split+normalize
    pass builds the persisted (doc_id, h1, h2) line table feeding the
    history dictionary, the membership join, AND the per-doc sizes; the
    history side reduces to its distinct line-pair dictionary — at
    100 TB a staging table bucketed by (h1, h2), zero-shuffle on the
    history side while each daily shard shuffles only its delta.
    Zero-line batch docs (empty/NULL text) still report (0, false) via
    the window-free id scan."""
    docs = _boilerplate_inc_docs(spark, sf_dir)
    is_batch = F.col("doc_id") % 10 >= _INCREMENTAL_BATCH_RESIDUE
    ln = _persist_scoped(
        "incline_ln",
        docs.select(
            "doc_id",
            F.explode(boilerplate_norm_lines(F.col("text"))).alias("line"),
        ).select("doc_id", *passage_hash_pair(F.col("line"))),
    )
    hist = (
        ln.filter(~is_batch)
        .select("h1", "h2")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        ln.filter(is_batch)
        .join(hist, ["h1", "h2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count("hit").alias("n"),
        )
    )
    n = F.coalesce(F.col("n"), F.lit(0).cast("long"))
    return (
        docs.filter(is_batch)
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
            n.alias("n_hist_repeated"),
            (n >= 1).alias("flagged"),
        )
    )


# ---------------------------------------------------------------------------
# Maximal duplicated-span extraction (r14): the SPAN-MERGE step of Lee et
# al. 2022's ExactSubstr. ``dedup_repeated_passages`` audits FIXED
# 15-token windows; this operator coalesces every run of overlapping /
# adjacent duplicated windows into ONE maximal variable-length span per
# document — the actual unit ExactSubstr excises, and the unit a removal
# budget is accounted in.
# ---------------------------------------------------------------------------

#: duplicated-span seed width in tokens. Lee et al. use 50 BPE tokens on
#: web text; the synthetic corpus averages ~55 whitespace tokens per doc,
#: so 10 keeps the audit non-vacuous at every SF while staying selective
#: (a natural 10-token collision needs an identical 10-word run).
SPAN_SEED_TOKENS = 10


@query(
    "dedup_duplicate_spans",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL {_PASSAGE_FIXTURE_SQL}
    ), tt AS (
      SELECT doc_id, toks FROM (
        SELECT doc_id, {SQL_TOK_NULLSAFE} AS toks FROM docs) t
      WHERE LEN(toks) >= {SPAN_SEED_TOKENS}
    ), w AS (
      SELECT doc_id, CAST(gs.i - 1 AS BIGINT) AS pos, s.sh[gs.i] AS gram
      FROM (SELECT doc_id, {sql_shingles('toks', SPAN_SEED_TOKENS)} AS sh
            FROM tt) s,
           UNNEST(GENERATE_SERIES(1, LEN(s.sh))) gs(i)
    ), c AS (
      SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY gram) AS cnt FROM w
    ), b AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos)
                  > {SPAN_SEED_TOKENS} THEN 1 ELSE 0 END AS brk
      FROM c WHERE cnt > 1
    ), i AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS island
      FROM b
    ), s AS (
      SELECT doc_id, island,
             MIN(pos) AS span_start,
             MAX(pos) + {SPAN_SEED_TOKENS} AS span_end,
             COUNT(*) AS n_grams
      FROM i GROUP BY doc_id, island
    )
    SELECT s.doc_id,
           CAST(span_start AS BIGINT) AS span_start,
           CAST(span_end - span_start AS BIGINT) AS span_len,
           CAST(n_grams AS BIGINT) AS n_grams,
           SHA256(ARRAY_TO_STRING(
             tt.toks[span_start + 1 : span_end], ' ')) AS span_sha
    FROM s JOIN tt ON tt.doc_id = s.doc_id
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL duplicated-span extraction — the span-merge step of
    ExactSubstr (Lee et al. 2022): every SPAN_SEED_TOKENS-token window
    occurring MORE THAN ONCE corpus-wide (cross-document OR a repeat
    inside one document — both are memorization mass) seeds an interval
    [pos, pos+K); per document, overlapping and exactly-adjacent seed
    intervals coalesce into one maximal span (classic gaps-and-islands:
    a new island starts where the gap between consecutive duplicated
    starts exceeds K). Output is one row per maximal span with its
    token extent and a sha256 of the EXACT token slice, so the gate
    certifies the merged boundaries, not just the seed hits — a run of
    boilerplate longer than one window reports as ONE span whose length
    measures the real removable mass. The fixed-window sibling
    ``dedup_repeated_passages`` audits window SPREAD (how many docs);
    this audits span GEOMETRY (where, how long) — the two tables a
    removal budget joins.

    Certification unions INCREMENTAL_NEARDUP_FIXTURE_ROWS: the base doc
    and its one-token rewrite share every window not touching the
    rewritten token, which merges into two maximal spans straddling it
    — non-empty BY CONSTRUCTION at any SF.

    Scale shape, in shuffle order: (1) ONE tokenize+shingle pass,
    positions keyed by the 16-byte :func:`passage_hash_pair` (the gram
    string is projected away before any exchange — same contract as
    ``dedup_passage_prune``; string/hash audit equivalence is pinned by
    test_duplicate_spans_matches_bruteforce); a window COUNT over the
    hash pair marks duplicated seeds in a single exchange — groupBy +
    join-back would shuffle the position stream twice for no map-side
    reduction (positions are mostly unique grams). (2) The island
    window and the (doc_id, island) aggregate and the final token-slice
    join all cluster by doc_id, so Catalyst reuses ONE doc_id exchange
    for all three (pinned in test_plan_shape). Duplicated seeds are the
    tiny tail of the corpus, so everything after exchange (1) is
    span-bounded, not corpus-bounded."""
    from pyspark.sql import Window

    K = SPAN_SEED_TOKENS
    docs = _passage_docs(spark, sf_dir)
    # r17: persist the token table — referenced by the seed-position build
    # AND the final exact-slice join, so unpinned the tokenize pass ran
    # twice per query. big=True: token arrays for every doc are
    # corpus-sized — DISK_ONLY at scale (VERDICT r17 #4)
    toks = _persist_scoped(
        "spans_toks",
        docs.select(
            "doc_id", ws_tokens(F.coalesce(F.col("text"), F.lit(""))).alias("toks")
        ).filter(F.size("toks") >= K),
        big=True,
    )
    g = toks.select(
        "doc_id",
        F.posexplode(shingles(F.col("toks"), K)).alias("pos", "gram"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"),
             *passage_hash_pair(F.col("gram")))
    dup = (
        g.withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("h1", "h2")))
        .filter(F.col("cnt") > 1)
        .select("doc_id", "pos")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    brk = dup.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w_doc) > K, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    isl = brk.withColumn(
        "island", F.sum("brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + K).alias("span_end"),
        F.count(F.lit(1)).cast("long").alias("n_grams"),
    )
    return spans.join(toks, "doc_id").select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        (F.col("span_end") - F.col("span_start")).cast("long").alias("span_len"),
        "n_grams",
        F.sha2(
            F.array_join(
                F.slice(
                    F.col("toks"),
                    (F.col("span_start") + 1).cast("int"),
                    (F.col("span_end") - F.col("span_start")).cast("int"),
                ),
                " ",
            ),
            256,
        ).alias("span_sha"),
    )


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity join (r14): the PPJoin family's candidate
# generator (Chaudhuri et al. 2006 SSJoin; Xiao et al. 2008 PPJoin).
# ``dedup_ngram_jaccard`` finds ALL >=0.12 pairs through a DF-capped full
# inverted index — complete only up to the cap. In the high-similarity
# band a real near-dup pass targets, prefix filtering is EXACT with no
# cap: order every doc's shingles by global rarity; two sets with
# Jaccard >= t MUST share a token inside their first
# n - ceil(t*n) + 1 rarest tokens, so the candidate join only posts the
# (tiny, rare-token) prefixes and exact verification runs on candidates
# only.
# ---------------------------------------------------------------------------

#: prefix-join Jaccard threshold as an exact integer ratio (0.7): high
#: enough that prefixes are short (|prefix| ~ 0.3*n + 1) and the theorem
#: has teeth; all comparisons stay integer (no float threshold edges)
PREFIX_T_NUM = 7
PREFIX_T_DEN = 10


@query(
    "dedup_jaccard_prefix",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL {_NEARDUP_FIXTURE_SQL}
    ), t AS (
      SELECT doc_id,
             LIST_DISTINCT({sql_shingles(SQL_TOK_NULLSAFE, 3)}) AS sh
      FROM docs
    ), sz AS (
      SELECT doc_id, CAST(LEN(sh) AS BIGINT) AS n FROM t WHERE LEN(sh) >= 1
    ), ex AS (
      SELECT doc_id, UNNEST(sh) AS s FROM t WHERE LEN(sh) >= 1
    ), r AS (
      SELECT doc_id, s,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY df, s) AS rk
      FROM (SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM ex) d
    ), pref AS (
      SELECT r.doc_id, r.s, sz.n
      FROM r JOIN sz ON sz.doc_id = r.doc_id
      WHERE r.rk <= sz.n
          - (({PREFIX_T_NUM} * sz.n + {PREFIX_T_DEN} - 1) // {PREFIX_T_DEN})
          + 1
    ), cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.n AS na, b.n AS nb
      FROM pref a JOIN pref b
        ON a.s = b.s AND a.doc_id < b.doc_id
      WHERE LEAST(a.n, b.n) * {PREFIX_T_DEN}
            >= {PREFIX_T_NUM} * GREATEST(a.n, b.n)
    ), inter AS (
      SELECT c.a_id, c.b_id, MIN(c.na) AS na, MIN(c.nb) AS nb,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cand c
      JOIN ex ea ON ea.doc_id = c.a_id
      JOIN ex eb ON eb.doc_id = c.b_id AND eb.s = ea.s
      GROUP BY c.a_id, c.b_id
    )
    SELECT a_id, b_id, n_common,
           CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
    FROM inter
    WHERE {PREFIX_T_DEN} * n_common
          >= {PREFIX_T_NUM} * (na + nb - n_common)
    """,
    tags=("llm", "dedup", "documents"),
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT high-threshold Jaccard pair join via PREFIX FILTERING (the
    SSJoin/PPJoin candidate scheme): all pairs with 3-shingle Jaccard
    >= 7/10, with NO document-frequency cap and no banding loss.
    Shingles order globally by (df, shingle); a doc of n distinct
    shingles posts only its n - ceil(t*n) + 1 RAREST ones (the prefix
    principle: two sets with overlap >= t cannot both miss the other's
    prefix), the candidate equi-join adds the size-compatibility filter
    t*max(|A|,|B|) <= min(|A|,|B|), and exact intersection counting runs
    on surviving candidates only. Thresholding is pure integer
    arithmetic (10*c >= 7*(na+nb-c)) so no float edge can differ between
    engines. Contrast with ``dedup_ngram_jaccard``: that op serves the
    low-threshold band through a DF-capped full index (complete up to
    the cap); this one is provably complete at its threshold because
    prefix tokens are by construction the RAREST — hot boilerplate
    shingles never enter the join, which is what removes the need for a
    cap. ``test_jaccard_prefix_complete_vs_bruteforce`` pins exact
    soundness + completeness against an independent Python replay.

    Certification unions INCREMENTAL_NEARDUP_FIXTURE_ROWS — the base /
    one-token-rewrite pair shares all but ~3 of ~40 shingles (Jaccard
    ~0.85), so the result is non-empty by construction at any SF.

    Scale shape: df census = one window exchange on the shingle key;
    per-doc rarity rank = one doc_id exchange; the candidate join posts
    ONLY prefix tokens, whose postings are rarity-bounded (a token in
    anyone's prefix is by definition low-df), so bucket sizes stay small
    WITHOUT the MAX_SHINGLE_DF cap the full-index sibling needs; the
    verify join is candidate-bounded, not corpus-bounded. At 100 TB the
    df census is reusable across thresholds and the prefix table is
    ~30% of the posting mass at t=0.7."""
    from pyspark.sql import Window

    # r17: persist the exploded posting table + the prefix table — `ex` is
    # referenced by the rarity ranking AND both verify sides, `pref` by
    # both candidate-join sides, so unpinned the shingle/explode subtree
    # ran ~5x per query (guide §7.2 "duplicated subtrees"). The input
    # spread rides inside _passage_docs.
    docs = _passage_docs(spark, sf_dir)
    t = docs.select(
        "doc_id",
        F.array_distinct(
            shingles(ws_tokens(F.coalesce(F.col("text"), F.lit(""))), 3)
        ).alias("sh"),
    ).filter(F.size("sh") >= 1)
    # big=True: the EXPLODED posting table is larger than the input
    # corpus — DISK_ONLY at scale (VERDICT r17 #4)
    ex = _persist_scoped(
        "jacpref_ex",
        t.select(
            "doc_id",
            F.size("sh").cast("long").alias("n"),
            F.explode("sh").alias("s"),
        ),
        big=True,
    )
    r = ex.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("s"))
    ).withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s")),
    )
    pref = _persist_scoped(
        "jacpref_pref",
        r.filter(
            F.col("rk")
            <= F.col("n")
            - F.expr(
                f"({PREFIX_T_NUM} * n + {PREFIX_T_DEN} - 1) DIV {PREFIX_T_DEN}"
            )
            + 1
        ).select("doc_id", "n", "s"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.n"), F.col("b.n")) * PREFIX_T_DEN
                >= F.greatest(F.col("a.n"), F.col("b.n")) * PREFIX_T_NUM
            ),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .distinct()
    )
    ea = ex.select(F.col("doc_id").alias("a_id"), "s")
    eb = ex.select(F.col("doc_id").alias("b_id"), "s")
    inter = (
        cand.join(ea, "a_id")
        .join(eb, ["b_id", "s"])
        .groupBy("a_id", "b_id")
        .agg(
            F.min("na").alias("na"),
            F.min("nb").alias("nb"),
            F.count(F.lit(1)).cast("long").alias("n_common"),
        )
    )
    return inter.filter(
        F.lit(PREFIX_T_DEN) * F.col("n_common")
        >= F.lit(PREFIX_T_NUM) * (F.col("na") + F.col("nb") - F.col("n_common"))
    ).select(
        "a_id",
        "b_id",
        "n_common",
        (
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common"))
        ).alias("jaccard"),
    )
