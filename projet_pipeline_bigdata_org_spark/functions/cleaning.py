"""Text cleaning / tokenization column transforms (reference F1-F4, M1-M2).

Reproduces the reference's cleaning semantics (lowercase → strip URLs →
strip non-alphanumerics → collapse whitespace → trim; reference
spark/preprocessor.py:17-21, spark/model_training.py:43-59) as pure
``pyspark.sql.functions`` column expressions — JVM-side, codegen'd, no UDF.

Each transform has a DuckDB SQL twin (``SQL_*`` templates) so oracle queries
stay in lockstep with the Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: reference spark/preprocessor.py:19 strips https?://\S+ and www.\S+
URL_RE = r"(https?://\S+|www\.\S+)"
#: reference strips everything outside [A-Za-z0-9\s]; applied post-lower here
NON_ALNUM_RE = r"[^a-z0-9\s]"
WS_RE = r"\s+"

#: canonical English stopword subset (public standard list; the reference
#: hardcodes its own 174-word list in spark/config.py:19-29 — semantics, not
#: text, are reproduced)
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "had", "has", "have", "he", "her", "his", "i", "if", "in", "into", "is",
    "it", "its", "my", "no", "not", "of", "on", "or", "our", "she", "so",
    "that", "the", "their", "them", "they", "this", "to", "was", "we", "were",
    "what", "when", "where", "which", "who", "will", "with", "you", "your",
)


def clean_text(col: Column | str) -> Column:
    """Lower → strip URLs → strip non-alnum → collapse spaces → trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, URL_RE, "")
    c = F.regexp_replace(c, NON_ALNUM_RE, "")
    c = F.regexp_replace(c, WS_RE, " ")
    return F.trim(c)


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenizer (reference M1 Tokenizer semantics) → array<string>,
    empties removed so '' never becomes a token."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def remove_stopwords(tokens: Column) -> Column:
    """Stopword removal (reference M2 StopWordsRemover semantics)."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.filter(tokens, lambda x: ~F.array_contains(stop, x))


# --- DuckDB SQL twins ------------------------------------------------------

SQL_CLEAN = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE("
    "LOWER({c}), '(https?://\\S+|www\\.\\S+)', '', 'g'),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
)

_STOP_SQL_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

SQL_TOKENIZE = "LIST_FILTER(STRING_SPLIT_REGEX({c}, '\\s+'), x -> x <> '')"

SQL_REMOVE_STOPWORDS = (
    "LIST_FILTER({toks}, x -> NOT LIST_CONTAINS(" + _STOP_SQL_LIST + ", x))"
)
