"""Dump `.explain("formatted")` for named queries to plans/r18/<q>_<suffix>.txt.

Usage: python tools/dump_plans_r18.py <suffix> <query> [<query> ...]

The optimization-round evidence artifact (guide §7.2): one file per touched
query and phase (before/after), committed so plan claims are auditable
without running Spark.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from projet_pipeline_bigdata_org_spark import plans  # noqa: E402
from projet_pipeline_bigdata_org_spark.session import get_spark  # noqa: E402

plans.load_all()


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump-plans-r18")
    queries = plans.all_queries()
    outdir = Path(_REPO) / "plans" / "r18"
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        resolved = name if name in queries else f"a0_{name}"
        df = queries[resolved](spark, sf_dir)
        path = outdir / f"{name}_{suffix}.txt"
        path.write_text(formatted_plan(df) + "\n")
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
