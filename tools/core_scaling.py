"""Core-proportional scaling evidence (VERDICT r17 #8).

The driver's 8-vs-32-core comparison on the stock testdata cannot show
parallel speedup: every sf* table is a SINGLE-row-group parquet file, so
every scan is one task and the sf0.1 suite is scheduling/overhead-bound
(all 12 driver queries read FASTER at 8 cores in r17). That is a testdata
property, not an engine property. This tool:

1. writes a one-shot MULTI-row-group copy of the given SF dir (pyarrow
   rewrite, identical rows/schema — row groups sized so a scan yields
   ~ROW_GROUPS splits under the session's maxPartitionBytes);
2. times a compute-bound query set against that copy at two core counts
   in SEPARATE processes (local[N] masters are fixed per JVM), same
   methodology as bench.py (sf0.001 warm-up, noop sink, median of
   SPARK_GRAFT_SCALING_RUNS);
3. measured result on the stock sizes: STILL no parallel speedup —
   sf0.1's per-query work is 1-3 s against a ~100 MB corpus, so stage
   overhead dominates at any split count. Core-proportional scaling
   needs more WORK, not just more splits. So the tool additionally
   writes a REPLICATED copy (documents/embeddings rows duplicated
   SPARK_GRAFT_SCALING_REPLICATE times with remapped ids — measurement
   data only, never fed to bench.py or any oracle gate) and times the
   per-row compute families on it;
4. writes SCALING_CORES_latest.json with per-query sec@low / sec@high
   ratios for BOTH phases — ratio > 1 means more cores genuinely help;
   commit as SCALING_CORES_r{N}.json.

Dedup pair queries are excluded from the replicated phase by design:
identical replicas make every document a near-duplicate of its copies,
which turns the candidate-verify stage quadratic in the replication
factor — a different workload, not a scaled one. The per-document /
per-row families (gopher, quality, decode, brute-force cosine) scale
linearly in rows and are exactly the paths spread_input exists for.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])

ROW_GROUPS = 32
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: compute-bound representatives (per-row narrow compute dominates, the
#: families spread_input exists for) plus two shuffle-bound controls
QUERIES = (
    "dedup_minhash_certified",
    "dedup_minhash_lsh",
    "lex_gopher_repetition",
    "lex_quality_score",
    "mm_decode_metadata",
    "embed_cosine_topk",
    "dedup_ngram_jaccard",
    "lex_gopher_repetition_exploded",
    # controls: join/agg-bound shapes where extra cores matter less
    "join_multiway_revenue_by_nation",
    "agg_pricing_summary",
)

_TIMER = r"""
import json, os, statistics, sys, time
sys.path.insert(0, {repo!r})
from projet_pipeline_bigdata_org_spark import plans
from projet_pipeline_bigdata_org_spark.session import get_spark

plans.load_all()
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; runs = int(sys.argv[3])
names = sys.argv[4:]
spark = get_spark(app_name=f"core-scaling-{{cpus}}", cpus=cpus)
qs = plans.all_queries()
def resolve(n):
    return n if n in qs else f"a0_{{n}}"
def once(name, sf):
    t0 = time.perf_counter()
    qs[resolve(name)](spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
for n in names:
    once(n, "/root/testdata/sf0.001")
    spark.catalog.clearCache()
out = {{}}
for n in names:
    samples = [once(n, sf_dir) for _ in range(runs)]
    spark.catalog.clearCache()
    out[n] = round(statistics.median(samples), 3)
print("TIMINGS_JSON:" + json.dumps(out))
spark.stop()
"""


#: replicated-phase query set: per-document / per-row compute families
#: (linear in rows) plus one shuffle-bound control
QUERIES_REPL = (
    "lex_gopher_repetition",
    "lex_gopher_repetition_exploded",
    "lex_quality_score",
    "mm_decode_metadata",
    "embed_cosine_topk",
    "lex_c4_rules",
    "agg_pricing_summary",  # control: lineitem-bound, not replicated
)

#: id offset per replica — far above any real id and the 9e7 fixture range
_REPL_OFFSET = 1_000_000_000


def write_multirg_copy(src: str, dst: str, replicate: dict[str, str] | None = None,
                       factor: int = 1) -> None:
    """Rewrite every table multi-row-group; tables named in ``replicate``
    (table -> id column) are additionally duplicated ``factor`` times with
    ids shifted by i * _REPL_OFFSET so every row stays unique."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(f"{src}/{t}.parquet")
        if replicate and t in replicate and factor > 1:
            idc = replicate[t]
            parts = [table]
            for i in range(1, factor):
                shifted = table.set_column(
                    table.schema.get_field_index(idc),
                    idc,
                    pc.add(table.column(idc), i * _REPL_OFFSET),
                )
                parts.append(shifted)
            table = pa.concat_tables(parts)
        rg = max(1, math.ceil(table.num_rows / ROW_GROUPS))
        pq.write_table(table, f"{dst}/{t}.parquet", row_group_size=rg)


_CALIB = r"""
import sys, time
sys.path.insert(0, {repo!r})
from projet_pipeline_bigdata_org_spark.session import get_spark
from pyspark.sql import functions as F
cpus = int(sys.argv[1])
spark = get_spark(app_name=f"calib-{{cpus}}", cpus=cpus)
df = spark.range(0, 20_000_000, 1, cpus).select(
    F.sha2(F.col("id").cast("string"), 256).alias("h"))
df.write.format("noop").mode("overwrite").save()  # JIT warm
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
print(f"CALIB_SEC:{{best:.3f}}")
spark.stop()
"""


def calibrate(cpus: int) -> float:
    """Host parallel-capacity ceiling: an embarrassingly parallel sha2
    over spark.range (no I/O, no shuffle, one task per core). Whatever
    speedup THIS shows between the two core counts is the most any real
    query can show on this host — the sandbox's vCPUs share contended
    physical cores (documented 2-3x load variance), so the ceiling is
    well under the nominal core ratio."""
    proc = subprocess.run(
        [sys.executable, "-c", _CALIB.format(repo=_REPO), str(cpus)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CALIB_SEC:"):
            return float(line[len("CALIB_SEC:"):])
    sys.exit(f"calibration at {cpus} cores failed:\n{proc.stderr[-1000:]}")


def time_at(cpus: int, sf_dir: str, runs: int, queries=QUERIES) -> dict[str, float]:
    proc = subprocess.run(
        [sys.executable, "-c", _TIMER.format(repo=_REPO), str(cpus), sf_dir, str(runs), *queries],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("TIMINGS_JSON:"):
            return json.loads(line[len("TIMINGS_JSON:"):])
    sys.exit(f"timer at {cpus} cores produced no timings:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.environ.get("SPARK_GRAFT_SCALING_COPY", "/tmp/spark_graft_multirg_sf")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3")))
    low = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "8"))
    high = int(os.environ.get("SPARK_GRAFT_SCALING_HIGH", "32"))
    factor = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "8")))

    def ratios(t_low, t_high, queries):
        return {
            n: {
                f"sec@{low}": t_low[n],
                f"sec@{high}": t_high[n],
                "speedup": round(t_low[n] / t_high[n], 2) if t_high[n] > 0 else None,
            }
            for n in queries
        }

    calib = {
        f"sec@{low}": calibrate(low),
        f"sec@{high}": calibrate(high),
    }
    calib["speedup"] = round(calib[f"sec@{low}"] / calib[f"sec@{high}"], 2)
    print(f"calibration (sha2 range, pure CPU): {calib}", flush=True)

    print(f"writing multi-row-group copy of {src} -> {dst}", flush=True)
    write_multirg_copy(src, dst)
    phase_multirg = ratios(
        time_at(low, dst, runs), time_at(high, dst, runs), QUERIES
    )
    print(f"writing {factor}x replicated copy -> {dst}_repl", flush=True)
    write_multirg_copy(
        src,
        f"{dst}_repl",
        replicate={"documents": "doc_id", "embeddings": "vec_id"},
        factor=factor,
    )
    phase_repl = ratios(
        time_at(low, f"{dst}_repl", runs, QUERIES_REPL),
        time_at(high, f"{dst}_repl", runs, QUERIES_REPL),
        QUERIES_REPL,
    )
    out = {
        "metric": "core_scaling_multirg",
        "source_sf": src,
        "row_groups": ROW_GROUPS,
        "cpus_low": low,
        "cpus_high": high,
        "runs": runs,
        "host_parallel_ceiling": calib,
        "multirg": phase_multirg,
        "replicate_factor": factor,
        "multirg_replicated": phase_repl,
    }
    payload = json.dumps(out, indent=1)
    (Path(_REPO) / "SCALING_CORES_latest.json").write_text(payload + "\n")
    print(payload)


if __name__ == "__main__":
    main()
