"""Testdata schema contract — the regeneration radar.

The driver regenerates /root/testdata between rounds and has already
changed physical layouts once (events.ts: TIMESTAMP(NANOS)-as-long →
TIMESTAMP_MICROS/NTZ, which silently broke every unix_micros query until
catalog.load learned both forms). This test pins the POST-normalization
schema of every table, so the next generation shift fails here with a
one-line diff instead of as analysis errors scattered across 141 queries.
"""

from __future__ import annotations

import pytest

from projet_pipeline_bigdata_org_spark.catalog import TABLES, load

EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    # ts is the NORMALIZED type: catalog.load maps both historical physical
    # layouts (nanos-as-long, micros-NTZ) to session-UTC timestamp
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


# all three generated scale factors: sf0.001 feeds the smoke/test gate,
# sf0.01 the driver oracle, sf0.1 the bench — each regenerates
# independently, so each can drift independently (the TIMESTAMP_NTZ
# incident arrived via exactly such a silent regeneration). All three are
# explicit conftest constants (ADVICE r6: a string .replace could silently
# no-op into a duplicate and lose the sf0.1 coverage); the distinctness
# assert makes any future constant drift loud.
from tests.conftest import SF_BENCH, SF_ORACLE, SF_SMOKE

SF_DIRS = [SF_SMOKE, SF_ORACLE, SF_BENCH]
assert len(set(SF_DIRS)) == 3, f"SF dirs must be distinct: {SF_DIRS}"


@pytest.mark.parametrize("sf", SF_DIRS, ids=lambda p: p.rsplit("/", 1)[-1])
@pytest.mark.parametrize("table", TABLES)
def test_normalized_table_schema_is_stable(spark, sf, table):
    import os

    if not os.path.isdir(sf):
        pytest.skip(f"{sf} not generated in this environment")
    assert load(spark, sf, table).dtypes == EXPECTED[table], (
        f"{table}@{sf}: testdata generation changed shape — update "
        "catalog.load normalization (and this contract) deliberately, "
        "not by surprise"
    )


def test_stage_result_caches_per_stage_sf_and_application(spark):
    """The catalog-layer stage cache serves the SAME built object to
    every consumer of one (stage, sf_dir) within one Spark application
    (the shared-training sweep optimization), and never across stages,
    sf_dirs, or applications (the key includes applicationId so a new
    session can't be served another session's dead DataFrames)."""
    from projet_pipeline_bigdata_org_spark import catalog

    calls: list[str] = []

    def mk(tag):
        def build():
            calls.append(tag)
            return object()

        return build

    a1 = catalog.stage_result(spark, "t_stage", "/sfA", mk("a"))
    a2 = catalog.stage_result(spark, "t_stage", "/sfA", mk("a-again"))
    assert a1 is a2 and calls == ["a"]  # second consumer: no rebuild
    b1 = catalog.stage_result(spark, "t_stage", "/sfB", mk("b"))
    o1 = catalog.stage_result(spark, "t_other", "/sfA", mk("o"))
    assert b1 is not a1 and o1 is not a1 and calls == ["a", "b", "o"]
    # a different application id must rebuild (simulated via key check)
    app = spark.sparkContext.applicationId
    assert (app, "t_stage", "/sfA") in catalog._STAGE_CACHE
    for k in [k for k in catalog._STAGE_CACHE if k[1].startswith("t_")]:
        del catalog._STAGE_CACHE[k]
