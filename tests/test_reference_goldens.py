"""Golden tests for the reference pipeline's own semantics (FIXTURES.md §A):
the cleaning regex chain, null-drop, sentiment stub + neutral fill, virality
bucketing thresholds, and the viral_posts sink projection — hand-computed
expected outputs on reference-shaped records (A1 → A2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.functions.buckets import virality_bucket
from projet_pipeline_bigdata_org_spark.functions.cleaning import (
    clean_text,
    remove_stopwords,
    tokenize,
)
from projet_pipeline_bigdata_org_spark.functions.extraction import (
    extract_hashtags,
    extract_mentions,
    keyword_filter,
)
from projet_pipeline_bigdata_org_spark.streaming.runtime import RECORD_SCHEMA

#: A1-shaped rows: URLs, punctuation/emoji, multi-space+newlines, keywords,
#: null text, literal "None" author, fractional epoch over 2 years
A1_ROWS = [
    ("nl5cc1a", "alice", "CryptoCurrency",
     "BTC to the moon!!! 🚀🚀 check https://example.com/x?q=1 and www.coins.io NOW",
     1700000000.0, 42),
    ("nl5cc1b", "None", "wallstreetbets",
     "sell   everything\n\nmarket   is  CRASHING @bob #panic", 1731600000.5, -7),
    ("nl5cc1c", "carol", "stocks", None, 1715000000.0, 3),
    ("nl5cc1d", "dave", "investing", "the and of to a", 1700000001.0, 1),
]


@pytest.fixture(scope="module")
def a1(spark):
    return spark.createDataFrame(A1_ROWS, schema=RECORD_SCHEMA)


def test_clean_text_golden(spark, a1):
    """Reference preprocessor.py:17-21: lower → strip URLs → strip
    non-alnum → collapse whitespace → trim."""
    out = {
        r.id: r.clean
        for r in a1.na.drop(subset=["text"])
        .select("id", clean_text("text").alias("clean"))
        .collect()
    }
    assert out["nl5cc1a"] == "btc to the moon check and now"
    assert out["nl5cc1b"] == "sell everything market is crashing bob panic"
    assert "nl5cc1c" not in out  # dropna (reference preprocessor.py:16)


def test_tokenize_stopwords_golden(spark, a1):
    out = {
        r.id: r.toks
        for r in a1.na.drop(subset=["text"])
        .select(
            "id",
            remove_stopwords(tokenize(clean_text("text"))).alias("toks"),
        )
        .collect()
    }
    assert out["nl5cc1a"] == ["btc", "moon", "check", "now"]
    assert out["nl5cc1d"] == []  # pure-stopword text empties out


def test_keyword_filter_and_extraction_golden(spark, a1):
    kws = ("btc", "market", "crypto")
    kept = {
        r.id
        for r in a1.na.drop(subset=["text"])
        .filter(keyword_filter(F.lower(F.col("text")), kws))
        .collect()
    }
    assert kept == {"nl5cc1a", "nl5cc1b"}
    ents = (
        a1.filter(F.col("id") == "nl5cc1b")
        .select(
            extract_mentions("text").alias("m"), extract_hashtags("text").alias("h")
        )
        .first()
    )
    assert ents.m == ["bob"] and ents.h == ["panic"]


def test_virality_bucket_thresholds_golden(spark):
    """Reference engine.py:186-189: HOT > 3.0, UP > 1.5, else LOW —
    boundary values land DOWN (strict >)."""
    df = spark.createDataFrame(
        [(3.01,), (3.0,), (1.51,), (1.5,), (0.0,), (-2.0,)], ["score"]
    )
    got = [r.b for r in df.select(virality_bucket("score").alias("b")).collect()]
    assert got == ["HOT", "UP", "UP", "LOW", "LOW", "LOW"]


def test_sink_projection_golden(spark, a1):
    """A2 viral_posts shape (engine.py:192-200 ↔ init.cql:8-18): renames,
    float cast, rounded score, epoch→timestamp."""
    pred = F.lit(2.345678)
    out = (
        a1.na.drop(subset=["text"])
        .select(
            "id",
            "author",
            "subreddit",
            F.col("text").alias("text_content"),
            F.lit("neutral").alias("sentiment"),
            F.lit("w1-w2-w3").alias("sujet"),
            F.round(pred, 2).cast("float").alias("score_predit"),
            virality_bucket(pred).alias("viralite"),
            F.to_timestamp(F.col("timestamp")).alias("creation_date"),
        )
    )
    r = {x.id: x for x in out.collect()}["nl5cc1a"]
    assert r.score_predit == pytest.approx(2.35)
    assert r.viralite == "UP"
    assert r.creation_date.year == 2023  # 1700000000 = 2023-11-14 UTC
    assert set(out.columns) == {
        "id", "author", "subreddit", "text_content", "sentiment",
        "sujet", "score_predit", "viralite", "creation_date",
    }


def test_sentiment_stub_contract(spark):
    """A3: same-length labels ∈ {positive,negative,neutral}; failure mode
    yields all-neutral (reference preprocessor.py:53-56)."""
    from projet_pipeline_bigdata_org_spark.ml.enrich import LABELS, stub_backend

    texts = ["a", "bb", "ccc", None, ""]
    labels = stub_backend(texts)
    assert len(labels) == len(texts)
    assert set(labels) <= set(LABELS)
    assert labels[3] == "neutral" and labels[4] == "neutral"  # len(None/"")==0
