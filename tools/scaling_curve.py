"""Scaling-curve audit (VERDICT r14 #6): measure — don't just plan-pin —
how every registered query's runtime grows across the three test scale
factors, and flag super-linear queries.

For each query the tool:

1. detects its INPUT TABLES from the physical plan's parquet scan paths
   (no registry tags needed — fixture unions and broadcast side tables
   are invisible local relations, which is correct: they don't scale);
2. computes its input scale at each SF as the summed row count of those
   tables (tables grow at different rates: lineitem 100x across the SF
   range, documents 10x, embeddings 4x, nation/region flat — a raw
   SF-ratio denominator would mislabel every documents query);
3. times it end-to-end (noop sink) at sf0.001 / sf0.01 / sf0.1 after a
   full warm-up pass at sf0.001 (whole-stage codegen compiles per plan
   structure, so the measured runs pay data cost, not JIT), taking the
   MIN over SPARK_GRAFT_SCALING_RUNS passes (min is the robust statistic
   against this container's documented 2-3x host-load transients);
4. fits slope = log(t_hi / t_lo) / log(scale_hi / scale_lo) between the
   smallest and largest SF where its input actually grows.

slope ~ 1 is linear scaling, < 1 sub-linear (fixed overhead dominating —
expected for sub-second queries), > SLOPE_FLAG with a non-trivial
absolute time at sf0.1 is flagged for explanation or fix. Queries whose
inputs don't grow (nation/region-only) are reported as "flat-input" and
exempt from slopes.

Output: one JSON document (stdout + SCALING_latest.json next to the
repo's bench artifacts) — run once per round beside tools/bench_delta.py
and commit as SCALING_r{N}.json.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from projet_pipeline_bigdata_org_spark import plans  # noqa: E402
from projet_pipeline_bigdata_org_spark.session import get_spark  # noqa: E402

plans.load_all()

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
#: flag threshold on the fitted slope; with min-of-runs timings and the
#: JIT warm-up, a healthy linear operator lands well under this
SLOPE_FLAG = 1.25
#: ignore slopes on queries this fast at the largest SF — sub-second
#: absolute cost is overhead-dominated and a slope there is noise
MIN_FLAG_SEC = 1.0


def _table_counts(spark) -> dict[str, dict[str, int]]:
    import duckdb

    con = duckdb.connect()
    out: dict[str, dict[str, int]] = {}
    for sf_dir in SF_DIRS:
        out[sf_dir] = {
            t: con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/{t}.parquet')"
            ).fetchone()[0]
            for t in TABLES
        }
    return out


def _input_tables(df, sf_dir: str) -> tuple[str, ...]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    found = set()
    for t in TABLES:
        if re.search(rf"{re.escape(sf_dir)}/+{t}\.parquet", plan):
            found.add(t)
    return tuple(sorted(found))


def main() -> None:
    runs = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "1")))
    spark = get_spark(app_name="scaling_curve")
    queries = plans.all_queries()
    counts = _table_counts(spark)
    from projet_pipeline_bigdata_org_spark import catalog

    from bench import TRAINER_STAGES, TRAINERS

    def clear_own_stage(name: str) -> None:
        """Invalidate ONLY this trainer's staged artifact: a trainer's
        slope should measure its cold build, but a whole-cache clear made
        every consumer timed after it pay an unrelated cold build inside
        its OWN timed run (r15: curate_export_manifest slope 1.48 was the
        ladder's build landing in its window via alphabetical sweep
        ordering — VERDICT r15 #5a)."""
        stage = TRAINER_STAGES[name.removeprefix("a0_")]
        # exact match on the prefixed key (ADVICE r16): substring matching
        # made 'bpe_learned_vocab' also evict 'tables:bbpe_learned_vocab',
        # charging a byte-BPE consumer an unrelated cold build mid-window
        targets = {stage, f"tables:{stage}"}
        for key in [k for k in catalog._STAGE_CACHE if k[1] in targets]:
            del catalog._STAGE_CACHE[key]

    # warm-up: JIT-compile every plan at the smallest SF
    for name, fn in queries.items():
        fn(spark, SF_DIRS[0]).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    tables: dict[str, tuple[str, ...]] = {}
    timings: dict[str, dict[str, float]] = {n: {} for n in queries}
    trainer_names = [n for n in queries if n.removeprefix("a0_") in TRAINERS]
    for sf_dir in SF_DIRS:
        # per-SF stage warm-up: build every trainer's silver table ONCE,
        # untimed, so consumer queries measure their marginal cost at
        # this SF (the production model — trainers pay once per corpus
        # epoch); the trainers themselves re-cold their OWN stage below
        for name in trainer_names:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
        for name, fn in queries.items():
            if name not in tables:
                tables[name] = _input_tables(fn(spark, sf_dir), sf_dir)
            best = math.inf
            for _ in range(runs):
                if name.removeprefix("a0_") in TRAINERS:
                    clear_own_stage(name)
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name][sf_dir] = round(best, 3)
            spark.catalog.clearCache()

    def fold() -> tuple[dict[str, dict], list[str]]:
        result: dict[str, dict] = {}
        flagged: list[str] = []
        for name in queries:
            tabs = tables[name]
            scales = {sf: sum(counts[sf][t] for t in tabs) for sf in SF_DIRS}
            entry: dict = {
                "tables": list(tabs),
                "t_sec": {
                    sf.rsplit("sf", 1)[-1]: timings[name][sf] for sf in SF_DIRS
                },
                "input_rows": {
                    sf.rsplit("sf", 1)[-1]: scales[sf] for sf in SF_DIRS
                },
            }
            grow = [sf for sf in SF_DIRS if scales[sf] > scales[SF_DIRS[0]]]
            if not tabs or not grow:
                entry["slope"] = None
                entry["note"] = "flat-input"
            else:
                hi = grow[-1]
                lo = SF_DIRS[0]
                entry["slope"] = round(
                    math.log(
                        max(timings[name][hi], 1e-3) / max(timings[name][lo], 1e-3)
                    )
                    / math.log(scales[hi] / scales[lo]),
                    3,
                )
                if (
                    entry["slope"] > SLOPE_FLAG
                    and timings[name][hi] >= MIN_FLAG_SEC
                ):
                    flagged.append(name)
            result[name] = entry
        return result, flagged

    result, flagged = fold()

    # flagged re-time pass (r17 — the scaling mirror of bench.py's v2
    # transient hardening): with SPARK_GRAFT_SCALING_RUNS defaulting to
    # 1, a single GC/host hiccup can mint a flag (the r17 first pass
    # read lex_contamination_report at 54.9s/sf0.1 against a 2.5s
    # steady state measured three independent ways in the same
    # session). Each flagged query is re-measured RETIME_RUNS more
    # times per SF under the SAME measurement model (per-SF trainer
    # stage warm-up, trainers re-colding their own stage), min-merged,
    # and stays flagged only if the slope survives.
    RETIME_RUNS = 3
    if flagged:
        retimed = {n: dict(timings[n]) for n in flagged}
        for sf_dir in SF_DIRS:
            for name in trainer_names:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                spark.catalog.clearCache()
            for name in flagged:
                for _ in range(RETIME_RUNS):
                    if name.removeprefix("a0_") in TRAINERS:
                        clear_own_stage(name)
                    t0 = time.perf_counter()
                    queries[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    timings[name][sf_dir] = round(
                        min(timings[name][sf_dir], time.perf_counter() - t0), 3
                    )
                spark.catalog.clearCache()
        first_flagged = flagged
        result, flagged = fold()
        for n in first_flagged:
            result[n]["retimed_from"] = {
                sf.rsplit("sf", 1)[-1]: retimed[n][sf] for sf in SF_DIRS
            }

    out = {
        "metric": "scaling_slopes",
        "runs": runs,
        "slope_flag": SLOPE_FLAG,
        "min_flag_sec": MIN_FLAG_SEC,
        "n_queries": len(result),
        "flagged": sorted(flagged),
        "queries": result,
    }
    payload = json.dumps(out, indent=1)
    (Path(_REPO) / "SCALING_latest.json").write_text(payload + "\n")
    print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
