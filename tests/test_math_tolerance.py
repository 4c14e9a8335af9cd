"""Tolerance-checked coverage for transcendental math (SURVEY §2.8 gap pack).

func_math_pack's oracle deliberately gates only IEEE-exact operations
(abs/floor/ceil/sqrt/round/sign/mod); log/exp/pow and the trig surface are
platform-libm-dependent in the last ulps, so they are verified here against
DuckDB with a relative tolerance instead of the bit-exact oracle gate.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from projet_pipeline_bigdata_org_spark.catalog import load, table_path

REL_TOL = 1e-12


@pytest.fixture(scope="module")
def pairs(spark, sf_dir):
    """(spark_rows, duck_rows) keyed by l_orderkey*16+l_linenumber."""
    li = load(spark, sf_dir, "lineitem")
    got = {
        (r.l_orderkey, r.l_linenumber): r
        for r in li.select(
            "l_orderkey",
            "l_linenumber",
            F.log(F.col("l_extendedprice")).alias("ln_price"),
            F.log10(F.col("l_extendedprice")).alias("log10_price"),
            F.exp(F.col("l_discount")).alias("exp_disc"),
            F.pow(F.col("l_quantity"), F.lit(1.5)).alias("qty_pow"),
            F.sin(F.col("l_tax")).alias("sin_tax"),
            F.cos(F.col("l_tax")).alias("cos_tax"),
            F.atan(F.col("l_discount")).alias("atan_disc"),
            F.cbrt(F.col("l_extendedprice")).alias("cbrt_price"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{table_path(sf_dir, 'lineitem')}')"
    )
    want = {
        (r[0], r[1]): r
        for r in con.execute(
            """
            SELECT l_orderkey, l_linenumber,
                   LN(l_extendedprice), LOG10(l_extendedprice),
                   EXP(l_discount), POW(l_quantity, 1.5),
                   SIN(l_tax), COS(l_tax), ATAN(l_discount),
                   CBRT(l_extendedprice)
            FROM lineitem
            """
        ).fetchall()
    }
    con.close()
    return got, want


def test_transcendental_math_matches_duckdb_within_tolerance(pairs):
    got, want = pairs
    assert set(got) == set(want) and got
    fields = [
        "ln_price", "log10_price", "exp_disc", "qty_pow",
        "sin_tax", "cos_tax", "atan_disc", "cbrt_price",
    ]
    for key, row in got.items():
        expect = want[key]
        for i, f in enumerate(fields):
            g, w = getattr(row, f), expect[2 + i]
            assert g == pytest.approx(w, rel=REL_TOL, abs=1e-300), (
                f"{f} mismatch at {key}: spark={g!r} duckdb={w!r}"
            )


def test_log_edge_cases_null_semantics(spark):
    """Spark 4 ANSI-off engine behavior: log of non-positive is NULL (matches
    DuckDB returning NULL/err-free via TRY); exp overflow is inf."""
    df = spark.range(1).select(
        F.log(F.lit(0.0)).alias("log0"),
        F.log(F.lit(-1.0)).alias("logneg"),
        F.exp(F.lit(1000.0)).alias("expbig"),
    )
    r = df.collect()[0]
    assert r.log0 is None and r.logneg is None
    assert math.isinf(r.expbig)
