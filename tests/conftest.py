"""Shared fixtures: one SparkSession per test session; sf0.001 for speed."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    from projet_pipeline_bigdata_org_spark.session import get_spark

    spark = get_spark(app_name="tests", cpus=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMOKE)
