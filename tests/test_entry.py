"""Smoke: the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["n_name", "revenue"]


def test_every_query_has_callable():
    qs = entrymod.queries()
    assert len(qs) >= 25
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
