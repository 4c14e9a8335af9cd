"""Smoke: the driver contract surface."""

from __future__ import annotations

import pathlib
import re

import __spark_entry__ as entrymod

README = pathlib.Path(__file__).resolve().parent.parent / "README.md"


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


def test_rotated_exports_match_declared_rotation():
    """Every ``a0_``-prefixed export corresponds 1:1 to the declared
    ROTATED set (revived in round 10 for the two names sorting beyond the
    driver window) — no stray prefixes, no silently-dropped rotations,
    and each rotated name resolves back to a canonical registry entry."""
    from projet_pipeline_bigdata_org_spark.plans.registry import ROTATED, get

    prefixed = {n for n in entrymod.queries() if n.startswith("a0_")}
    assert prefixed == {f"a0_{n}" for n in ROTATED}
    for n in prefixed:
        assert get(n).name == n.removeprefix("a0_")


def test_every_no_oracle_query_has_readme_rationale():
    """Hygiene sweep: every registry name either carries a DuckDB oracle or
    appears by name in README's "rows-only forever" rationale section, so
    the oracle/no-oracle split can't silently drift as queries are added."""
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    no_oracle = sorted(n.removeprefix("a0_") for n in set(qs) - set(os_))
    text = README.read_text()
    m = re.search(
        r"### Why the remaining no-oracle queries are rows-only forever(.*?)\n## ",
        text,
        re.S,
    )
    assert m, "README no-oracle rationale section missing"
    section = m.group(1)
    undocumented = [n for n in no_oracle if f"`{n}`" not in section]
    assert not undocumented, f"no-oracle queries lacking README rationale: {undocumented}"
