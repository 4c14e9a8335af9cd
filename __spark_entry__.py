"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 5-way-join revenue rollup at sf0.001;
``queries()`` / ``oracle_sql()`` are views over the engine's central query
registry (projet_pipeline_bigdata_org_spark.plans.registry), where every
implemented operator from SURVEY.md §2 registers a ``(spark, sf_dir) ->
DataFrame`` builder plus (where SQL-expressible) a DuckDB oracle twin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from projet_pipeline_bigdata_org_spark import plans  # noqa: E402

plans.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from projet_pipeline_bigdata_org_spark.operators.relational import (
        join_multiway_revenue_by_nation,
    )

    return join_multiway_revenue_by_nation(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return plans.all_oracles()
