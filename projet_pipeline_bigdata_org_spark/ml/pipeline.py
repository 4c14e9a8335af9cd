"""SparkML feature + virality pipeline (reference M1-M10, SURVEY.md §2.9),
rebuilt as one proper ``pyspark.ml.Pipeline`` (the reference fits each stage
imperatively in spark/model_training.py:62-252 and never composes them).

Stages (reference hyperparameters noted, scaled down for the 500-doc corpus):
  Tokenizer → StopWordsRemover → Word2Vec (ref: dim=100 iters=20 seed=42)
  → CountVectorizer (ref: vocab=2000 minDF=3) → LDA (ref: k=6 iters=20
  seed=42) → StringIndexer(handleInvalid=keep; ref loader.py:22-26)
  → VectorAssembler(handleInvalid=skip; ref engine.py:89-97)
  → RandomForestRegressor (ref: trees=30 depth=10 seed=42).

Topic labeling (reference M6+U2: driver dict + row UDF, engine.py:41-69,
109-122) is re-expressed as describeTopics → labels DataFrame → broadcast
join on the argmax topic — no Python UDF in the scoring path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.clustering import LDA
from pyspark.ml.feature import (
    CountVectorizer,
    StopWordsRemover,
    StringIndexer,
    Tokenizer,
    VectorAssembler,
    Word2Vec,
)
from pyspark.ml.functions import vector_to_array
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load
from projet_pipeline_bigdata_org_spark.functions.cleaning import (
    SQL_CLEAN,
    SQL_REMOVE_STOPWORDS,
    SQL_TOKENIZE,
    STOPWORDS,
    clean_text,
)
from projet_pipeline_bigdata_org_spark.plans.registry import query

SEED = 42  # reference model_training.py:149,171,246


@dataclass(frozen=True)
class PipelineConfig:
    vector_size: int = 32
    w2v_min_count: int = 2
    w2v_max_iter: int = 2
    vocab_size: int = 512
    min_df: int = 2
    num_topics: int = 6
    lda_max_iter: int = 5
    num_trees: int = 10
    max_depth: int = 5
    label_col: str = "label"


def build_feature_pipeline(cfg: PipelineConfig = PipelineConfig()) -> Pipeline:
    tokenizer = Tokenizer(inputCol="clean", outputCol="words")
    # the engine's ONE stopword list (functions/cleaning.py) instead of
    # Spark's bundled English list: the reference likewise removes ITS
    # OWN fixed list (spark/config.py:19-29), and a fixed list makes the
    # pipeline's deterministic prefix oracle-expressible
    # (ml_pipeline_features) with the existing SQL twin
    stop = StopWordsRemover(
        inputCol="words", outputCol="filtered_words", stopWords=list(STOPWORDS)
    )
    w2v = Word2Vec(
        inputCol="filtered_words",
        outputCol="word2vec_features",
        vectorSize=cfg.vector_size,
        minCount=cfg.w2v_min_count,
        maxIter=cfg.w2v_max_iter,
        seed=SEED,
    )
    cv = CountVectorizer(
        inputCol="filtered_words",
        outputCol="features_lda",
        vocabSize=cfg.vocab_size,
        minDF=cfg.min_df,
    )
    lda = LDA(
        featuresCol="features_lda",
        topicDistributionCol="topic_distribution",
        k=cfg.num_topics,
        maxIter=cfg.lda_max_iter,
        seed=SEED,
        optimizer="online",
    )
    indexer = StringIndexer(
        inputCol="lang", outputCol="lang_index", handleInvalid="keep"
    )
    assembler = VectorAssembler(
        inputCols=["word2vec_features", "topic_distribution", "lang_index"],
        outputCol="features_regression",
        handleInvalid="skip",
    )
    rf = RandomForestRegressor(
        featuresCol="features_regression",
        labelCol=cfg.label_col,
        predictionCol="prediction",
        numTrees=cfg.num_trees,
        maxDepth=cfg.max_depth,
        seed=SEED,
    )
    return Pipeline(stages=[tokenizer, stop, w2v, cv, lda, indexer, assembler, rf])


def prepare_documents(df: DataFrame, label_expr: str = "ln(n_chars)") -> DataFrame:
    """Documents table → training frame: cleaned text + a regression label
    (log char count stands in for the reference's Reddit `score`)."""
    return df.select(
        "doc_id",
        "lang",
        clean_text("text").alias("clean"),
        F.expr(label_expr).alias("label"),
    ).filter(F.length("clean") > 0)


def topic_labels(model: PipelineModel, max_terms: int = 3) -> DataFrame:
    """M6 re-done Spark-first: describeTopics × CV vocabulary → a (topic_id,
    topic_label) DataFrame ('w1-w2-w3'), ready for broadcast join — replaces
    the reference's driver dict + per-row UDF."""
    cv_model = next(m for m in model.stages if m.uid.startswith("CountVectorizer"))
    lda_model = next(m for m in model.stages if m.uid.startswith("LDA"))
    vocab = cv_model.vocabulary
    spark = SparkSession.getActiveSession()
    vocab_df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(vocab)], ["term_id", "term"]
    )
    topics = lda_model.describeTopics(max_terms).select(
        "topic", F.posexplode("termIndices").alias("pos", "term_id")
    )
    return (
        topics.join(F.broadcast(vocab_df), "term_id")
        .groupBy("topic")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "term"))).alias("terms"))
        .select(
            F.col("topic").alias("topic_id"),
            F.array_join(F.transform("terms", lambda t: t["term"]), "-").alias(
                "topic_label"
            ),
        )
    )


def attach_topics(scored: DataFrame, labels: DataFrame) -> DataFrame:
    """argmax(topic_distribution) → broadcast join topic label (replaces row
    UDF U2; array ops are codegen'd, the join is a broadcast hash join)."""
    dist = vector_to_array(F.col("topic_distribution"))
    topic_id = (F.array_position(dist, F.array_max(dist)) - 1).cast("int")
    return (
        scored.withColumn("topic_id", topic_id)
        .join(F.broadcast(labels), "topic_id", "left")
        .withColumn("topic_label", F.coalesce("topic_label", F.lit("Autre")))
    )


#: hard ceiling on the pipeline fit input. W2V/LDA/RF are driver-coordinated
#: iterative multi-pass fits — at 100 TB an unbounded .fit() over the corpus
#: is a scale-killer (the round-5 sweep's single most expensive query). Same
#: discipline as similarity.IVF_FIT_MAX_ROWS / SemDeDup: bounded seeded
#: sample for the fit, full-corpus transform unchanged. The reference's own
#: training corpus is a bounded 1,135-record file (spark/model_training.py:31).
TRAIN_MAX_ROWS = 100_000
#: oversampling margin so the Bernoulli sample almost surely reaches the
#: target before the exact .limit cap
TRAIN_OVERSAMPLE = 1.2


def _train_fit_sample(prepared: DataFrame) -> DataFrame:
    """Bounded, seeded sample of prepared training rows for the fit.

    The bound check is a `limit(MAX+1).count()` probe, not a full count:
    CollectLimit early-exits once MAX+1 rows are found, so a small corpus
    (the common passthrough case) costs a partial scan instead of a full
    corpus pass (ADVICE r6). Only when the probe shows the cap binds does
    the full count run to size the sample fraction:
    fraction = min(1, OVERSAMPLE · MAX_ROWS / n), then an exact `.limit`
    cap — fit input ≤ TRAIN_MAX_ROWS at any corpus size. At test scale
    (≤ 100k docs) the corpus passes through whole — untouched plan, so
    fitted weights and every determinism test are unchanged.

    When the cap binds, the capped frame is re-spread across the engine's
    shuffle fan-out: GlobalLimit collapses its output to ONE partition, and
    without the repartition every iterative estimator (W2V/CV/LDA/RF) would
    fit at parallelism 1 — exactly at the corpus sizes the cap exists for.

    Determinism caveat: the seed fixes the Bernoulli draw per row, but
    `.sample().limit()` keeps whichever sampled rows the scan yields first,
    which depends on file/partition layout — the capped fit input is
    reproducible only for an identical layout, not across re-partitioned
    copies of the same corpus."""
    from projet_pipeline_bigdata_org_spark.session import DEFAULT_SHUFFLE_PARTITIONS

    if prepared.limit(TRAIN_MAX_ROWS + 1).count() <= TRAIN_MAX_ROWS:
        return prepared
    n = prepared.count()
    fraction = min(1.0, TRAIN_OVERSAMPLE * TRAIN_MAX_ROWS / n)
    sample = prepared
    if fraction < 1.0:
        sample = sample.sample(fraction=fraction, seed=SEED)
    return sample.limit(TRAIN_MAX_ROWS).repartition(DEFAULT_SHUFFLE_PARTITIONS)


def train(documents: DataFrame, cfg: PipelineConfig = PipelineConfig()) -> PipelineModel:
    # Pipeline.fit runs each estimator's jobs against the input lineage —
    # W2V/CV/LDA/indexer/RF would each re-evaluate the scan+clean subtree.
    # The fit frame is bounded (≤ TRAIN_MAX_ROWS by construction), so
    # persist it for the duration of the fit and release it after.
    fit_input = _train_fit_sample(prepare_documents(documents)).persist()
    try:
        return build_feature_pipeline(cfg).fit(fit_input)
    finally:
        fit_input.unpersist()


_FILTERED_SQL = SQL_REMOVE_STOPWORDS.format(toks="words")

_ML_FEATURES_ORACLE = f"""
WITH p AS (
  SELECT doc_id, lang, {SQL_CLEAN.format(c='text')} AS clean FROM documents
), f AS (
  SELECT doc_id, lang, clean FROM p WHERE LENGTH(clean) > 0
), tok AS (
  SELECT doc_id, lang, clean, {SQL_TOKENIZE.format(c='clean')} AS words
  FROM f
)
SELECT doc_id, lang, clean,
       CAST(LEN(words) AS BIGINT) AS n_words,
       CAST(LEN({_FILTERED_SQL}) AS BIGINT) AS n_filtered,
       ARRAY_TO_STRING({_FILTERED_SQL}, ' ') AS filtered_text
FROM tok
"""


@query(
    "ml_pipeline_features",
    oracle=_ML_FEATURES_ORACLE,
    tags=("ml", "documents"),
)
def ml_pipeline_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ML pipeline's DETERMINISTIC PREFIX, oracle-gated (VERDICT r12
    #6): ``prepare_documents`` (the real cleaning chain + empty filter)
    followed by the REAL first two fitted-pipeline stages — the very
    ``Tokenizer`` and ``StopWordsRemover`` stage objects
    ``build_feature_pipeline`` composes (``getStages()[:2]``, so a
    config drift in the production pipeline breaks this gate) — emitting
    per document the cleaned text, token count, stopword-filtered count,
    and the filtered token stream the downstream estimators (W2V, CV →
    LDA) actually consume. The seeded iterative fits stay rows-only with
    invariants (tests/test_ml.py); everything BEFORE them is now
    driver-certified, which is exactly the part a silent preprocessing
    bug corrupts.

    Oracle-expressibility note: the StopWordsRemover removes the
    engine's fixed STOPWORDS list (functions/cleaning.py) — matching the
    reference, which removes its own hardcoded list
    (spark/config.py:19-29) rather than a library default.

    Scale shape: pure row-local narrow transforms — no shuffle at all;
    the same full-corpus transform path ``model.transform`` runs, so
    certifying it costs one scan."""
    docs = load(spark, sf_dir, "documents")
    prepared = prepare_documents(docs)
    prefix = Pipeline(stages=build_feature_pipeline().getStages()[:2]).fit(
        prepared.limit(1)  # transformers only: fit is metadata-free
    )
    out = prefix.transform(prepared)
    return out.select(
        "doc_id",
        "lang",
        "clean",
        F.size("words").cast("long").alias("n_words"),
        F.size("filtered_words").cast("long").alias("n_filtered"),
        F.array_join("filtered_words", " ").alias("filtered_text"),
    )


@query(
    "ml_virality_pipeline",
    tags=("ml", "documents", "no-oracle"),
)
def ml_virality_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end M1-M10: fit the full pipeline on documents, score the same
    corpus, label topics via broadcast join, bucket predictions (P7).

    No SQL oracle (ML fit is iterative/seeded, not SQL-expressible); the
    driver's rows-only check plus tests/test_ml.py invariants (determinism,
    dims, save/load) cover it."""
    from projet_pipeline_bigdata_org_spark.functions.buckets import virality_bucket

    docs = load(spark, sf_dir, "documents")
    model = train(docs)
    scored = model.transform(prepare_documents(docs))
    labeled = attach_topics(scored, topic_labels(model))
    return labeled.select(
        "doc_id",
        "lang",
        F.round(F.col("prediction"), 2).alias("score_predit"),
        "topic_id",
        "topic_label",
        virality_bucket(F.col("prediction"), hot=6.5, up=5.5).alias("viralite"),
    )
