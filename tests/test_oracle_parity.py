"""Every registered query with an oracle must match DuckDB bit-for-bit at
sf0.001 (fast gate; the driver re-checks at sf0.01). Queries without an
oracle must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from projet_pipeline_bigdata_org_spark import plans

plans.load_all()

_SPECS = plans.registry.all_specs()
_WITH_ORACLE = [n for n, s in _SPECS.items() if s.oracle is not None]
_NO_ORACLE = [n for n, s in _SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    from tests.parity import compare_query

    compare_query(spark, name, sf_dir)


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_runs_without_oracle(spark, sf_dir, name):
    df = _SPECS[name].fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0
