"""Local replica of the driver's DuckDB oracle gate.

Runs a registered query's Spark plan and its oracle SQL side-by-side and
compares row count, column names, and an order-insensitive canonical value
multiset. Stricter than the driver (bit-exact float comparison via repr) so
anything passing here should pass the driver's value-hash.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb

from projet_pipeline_bigdata_org_spark.catalog import TABLES, table_path

__all__ = ["compare_query", "duckdb_connect"]


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Pre-register every testdata table as a view (the driver does the same)."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon(v):
    """Canonical, engine-neutral scalar representation."""
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _decimal.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _table_to_rows(tbl) -> tuple[list[str], list[tuple]]:
    """pyarrow Table -> (sorted column names, canonical rows sorted)."""
    cols = sorted(tbl.column_names)
    pydict = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    rows = sorted(tuple(_canon(pydict[c][i]) for c in cols) for i in range(n))
    return cols, rows


def compare_query(spark, name: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for registered query `name`."""
    from projet_pipeline_bigdata_org_spark.plans import registry

    spec = registry.get(name)
    sdf = spec.fn(spark, sf_dir)
    s_tbl = sdf.toArrow()

    assert spec.oracle is not None, f"{name} has no oracle"
    con = duckdb_connect(sf_dir)
    try:
        d_tbl = con.execute(spec.oracle).fetch_arrow_table()
    finally:
        con.close()

    s_cols, s_rows = _table_to_rows(s_tbl)
    d_cols, d_rows = _table_to_rows(d_tbl)

    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, s, d) for i, (s, d) in enumerate(zip(s_rows, d_rows)) if s != d
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark vs duckdb): {diffs}")
