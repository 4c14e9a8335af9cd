"""Entity extraction (reference F12: clean_text / extract_mentions
``@(\\w+)`` / extract_hashtags ``#(\\w+)`` in main/data_ingestion/utils.py:6-53),
as native regexp_extract_all column expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MENTION_RE = r"@(\w+)"
HASHTAG_RE = r"#(\w+)"


def extract_mentions(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(MENTION_RE), 1)


def extract_hashtags(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(HASHTAG_RE), 1)


def extract_keywords(col: Column | str, keywords: tuple[str, ...]) -> Column:
    """All keyword occurrences (reference P8 keyword relevance, generalized)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r"\b(" + "|".join(keywords) + r")\b"
    return F.regexp_extract_all(c, F.lit(pat), 1)


def keyword_filter(col: Column | str, keywords: tuple[str, ...]) -> Column:
    """Boolean word-boundary any-match predicate (reference
    main/data_ingestion/utils.py:22-35)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"\b(" + "|".join(keywords) + r")\b")
