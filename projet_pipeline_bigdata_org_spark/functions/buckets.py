"""Score bucketing (reference P7: virality CASE chain, engine.py:126-129 and
186-189 — thresholds 3.0 / 1.5 on the save path, labels HOT / UP / LOW)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOT_THRESHOLD = 3.0
UP_THRESHOLD = 1.5


def virality_bucket(
    score: Column | str,
    hot: float = HOT_THRESHOLD,
    up: float = UP_THRESHOLD,
) -> Column:
    c = F.col(score) if isinstance(score, str) else score
    return F.when(c > hot, "HOT").when(c > up, "UP").otherwise("LOW")


def sql_virality_bucket(expr: str, hot: float = HOT_THRESHOLD, up: float = UP_THRESHOLD) -> str:
    return (
        f"CASE WHEN {expr} > {hot} THEN 'HOT' "
        f"WHEN {expr} > {up} THEN 'UP' ELSE 'LOW' END"
    )
