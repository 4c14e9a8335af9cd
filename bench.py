"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line as the FINAL stdout line:
  {"metric": ..., "value": N, "unit": "sec", "sf": ..., "queries": {<the
  12 r1-comparable medians>}, "full": "BENCH_full_latest.json"}
The full payload (every timed query + tiers + spread) is written to
BENCH_full_latest.json next to this script — the driver's stdout capture
keeps only the last ~2000 chars, so the final line must stay small.

Each query is forced end-to-end with the noop sink (full execution, no
driver collect / display cost). After a per-plan codegen warm-up, the
TRAINER queries' one-time builds are timed ONCE in a ``cold_build`` tier;
then each headline query is timed SPARK_GRAFT_BENCH_RUNS times (default
3) against warm silver-layer stage tables and the reported number is the
per-query STEADY-STATE MEDIAN; the min/max spread rides in the JSON so a
regression can be told apart from this container's documented 2-3x
host-load variance (ROUND3.md). With $SPARK_GRAFT_BENCH_BASELINE set to
the prior round's same-host artifact, >1.5x movers are auto re-timed N=5
before the artifact is written (transient-hardening, VERDICT r15 #4).
The full-registry sweep (SPARK_GRAFT_BENCH_SET=all) stays single-pass —
it is a coarse round-over-round regression radar, not the headline
measurement.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from projet_pipeline_bigdata_org_spark import plans  # noqa: E402
from projet_pipeline_bigdata_org_spark.session import get_spark  # noqa: E402

plans.load_all()

#: headline set: one per operator family (join/agg/window/stream/text/dedup/
#: similarity/udf/ml-free projection/SQL surface)
HEADLINE = (
    "join_multiway_revenue_by_nation",   # 5-way join + agg + sort (flagship)
    "agg_pricing_summary",               # wide-agg scan
    "agg_window_topk",                   # window rank (was window_topk_orders_per_customer)
    "join_broadcast_part_revenue",       # broadcast dim join
    "join_full_outer_balance",           # full-outer reconciliation (new r2)
    "event_window_tumbling",             # event-time windows (batch form)
    "event_window_session",              # sessionization
    "etl_sink_projection",               # projection/cast/bucket pack
    "lex_quality_score",                 # array/regex text analysis
    "dedup_exact_hash",                  # hash groupBy dedup
    "dedup_ngram_jaccard",               # DF-capped inverted-index near-dup (new r2)
    "dedup_minhash_lsh",                 # MinHash band join + verify
    "embed_cosine_topk",                 # brute-force ANN baseline
    "embed_cascade_topk",                # sign-bit shortlist -> exact re-rank cascade (new r9)
    "compress_pq_topk",                  # PQ ADC shortlist -> exact re-rank cascade (new r10)
    "sim_ann_lsh",                       # hyperplane-LSH ANN scale path (new r3, numpy-bucketed)
    "func_json_pack",                    # JSON extraction
    "sql_surface_q3",                    # TPC-H Q3 shape: subquery-era SQL surface (new r3)
    "sql_window_range_frame",            # RANGE frame window (new r3)
    "pack_sequences",                    # token packing via per-shard windows (new r3)
    "lex_bigram_fluency",                # LM-lite corpus-frequency scoring (new r3)
    "graph_triangle_count",              # exact wedge-join triangle count (new r5)
    "pair_cogrouped_asof",               # cogroup-API exemplar, Python kernel (new r5)
    "arrange_zorder_layout",             # lake-layout family representative (new r11, VERDICT #8)
    "algo_kcore_peel",                   # r10 iterative-graph family representative (new r11)
    "dedup_minhash_certified",           # certified near-dedup backbone (new r12, VERDICT #1)
    "text_unigram_learn",                # Viterbi-EM tokenizer training (new r12)
    "rank_fusion_rrf",                   # hybrid sparse+dense retrieval fusion (new r12)
    "dedup_incremental_minhash_certified",  # certified steady-state admission (new r13, VERDICT #1)
    "embed_semdedup_incremental",        # semantic admission vs history IVF (new r13, VERDICT #3)
    "sim_maxsim_multivector",            # ColBERT MaxSim late interaction (new r13)
    "text_bpe_bytes_learn",              # byte-level BPE training (new r14, VERDICT #2)
    "curate_funnel_ladder",              # full-ladder certified funnel (new r14, VERDICT #3)
    "text_chunk_windows",                # RAG chunking scan shape (new r14)
    "dedup_duplicate_spans",             # ExactSubstr span merge (new r14-late)
    "dedup_jaccard_prefix",              # prefix-filtered exact Jaccard join (new r14-late)
    "ml_virality_linear_certified",      # certified closed-form ML twin (new r15, VERDICT #3)
    "sim_ann_ivf_incremental",           # assign-only ANN index maintenance (new r15, VERDICT #4)
    "lex_c4_rules",                      # C4 line/page policy pass (new r15, VERDICT #5)
    "curate_epoch_plan",                 # per-epoch training manifest (new r15, VERDICT #7)
    "lex_gopher_repetition",             # Gopher repetition-rule pack (new r15-late)
    "sim_ann_ivfpq_incremental",         # encode-only IVF-PQ maintenance (new r15-late)
    "sql_surface_q9",                    # widest TPC-H join tree + derived partsupp (new r16, VERDICT #2)
    "sql_surface_q2",                    # correlated-min decorrelation shape (new r16, VERDICT #2)
    "lex_gopher_repetition_exploded",    # long-doc explode+groupBy repetition path (new r16, VERDICT #3)
    "lex_decontaminate_attrib",          # per-benchmark contamination attribution (new r16, VERDICT #7)
    "curate_funnel_stream_prefix",       # the streamed funnel's certified batch twin (new r16, VERDICT #6)
    "curate_funnel_stream_prefix6",      # FULL ingest funnel twin: +near-dup +decontamination (new r17, VERDICT #3/#4)
    "curate_funnel_stream_ledger",       # ingest-funnel attrition sign-off over the staged attribution (new r17-late)
    "curate_pipeline_e2e",               # funnel->epoch-plan->manifest e2e capstone (new r17, VERDICT #5)
    # the rest of the certified TPC-H 22 (r16): the headline artifact then
    # carries the COMPLETE standard yardstick every round (suites.tpch22)
    "sql_surface_q4", "sql_surface_q5", "sql_surface_q6", "sql_surface_q7",
    "sql_surface_q8", "sql_surface_q10", "sql_surface_q11", "sql_surface_q12",
    "sql_surface_q13", "sql_surface_q14", "sql_surface_q15", "sql_surface_q16",
    "sql_surface_q17", "sql_surface_q18", "sql_surface_q19", "sql_surface_q20",
    "sql_surface_q21", "sql_surface_q22",
)

#: tier annotations surfaced in the bench JSON, so the headline total stays
#: interpretable: "audit" = exact-ground-truth contract, deliberately more
#: expensive than its scale-path sibling (dedup_minhash_lsh is
#: ngram-jaccard's 100 TB path); "graph" = inherently join-heavy exact
#: graph analytics; "api-exemplar" = deliberately exercises the Python
#: cogroup kernel path (the JVM-native as-of join is
#: event_asof_last_purchase, ~10x faster)
TIERS = {
    "dedup_ngram_jaccard": "audit",
    "dedup_minhash_certified": "audit",
    "dedup_incremental_minhash_certified": "audit",
    "graph_triangle_count": "graph",
    "algo_pagerank": "graph",
    "pair_cogrouped_asof": "api-exemplar",
    "text_unigram_learn": "iterative",
    "text_bpe_bytes_learn": "iterative",
    "curate_funnel_ladder": "audit",
    "dedup_duplicate_spans": "audit",
    # embeds the CERTIFIED sha-slice MinHash construction + the
    # decontamination overlap join — exact-ground-truth twin of the
    # production ingest sink (which runs xxhash64/murmur3)
    "curate_funnel_stream_prefix6": "audit",
}

#: The 12 queries comparable to the round-1 baseline (BENCH_r01.json),
#: under their current names (r2 renames: window_topk_orders_per_customer
#: -> agg_window_topk, stream_* -> event_window_*, pipe_sink_projection ->
#: etl_sink_projection, text_quality_score -> lex_quality_score,
#: sim_cosine_topk -> embed_cosine_topk). The driver captures only the
#: LAST ~2000 chars of stdout, so the final printed line must stay
#: compact: it carries just these medians; the full payload (all queries
#: + tiers + spread) goes to BENCH_full_latest.json next to this script.
R1_COMPARABLE = (
    "join_multiway_revenue_by_nation",
    "agg_pricing_summary",
    "agg_window_topk",
    "join_broadcast_part_revenue",
    "event_window_tumbling",
    "event_window_session",
    "etl_sink_projection",
    "lex_quality_score",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "embed_cosine_topk",
    "func_json_pack",
)

#: TRAINER (cold-build) queries: their cost IS the one-time-per-corpus-epoch
#: training/staging build. r15 cleared the stage cache before EVERY timed
#: sample, which made the sweep medians measure the cold build N times and
#: poisoned consumer queries mid-sweep (text_tokenizer_fertility read
#: 41.5s/sample against a 0.35s steady state — VERDICT r15 #4a). r16
#: protocol: the cold build is timed ONCE per trainer in a dedicated
#: ``cold_build`` tier (stage cache cleared once at tier start), after
#: which the caches stay warm — the main loop's medians, the headline
#: total, and every consumer query measure STEADY STATE, which is the
#: production model: the trainer pays once per corpus epoch, consumers
#: read the silver-layer parquet artifact.
TRAINERS = {
    "text_unigram_learn",
    "text_bpe_learn",
    "text_bpe_bytes_learn",
    "text_wordpiece_learn",
    "algo_label_propagation",
    # the funnel ladder stages its (doc_id, stage_ord) table for its
    # consumers (mixture shift, export manifest); its own cost IS the
    # nine-stage composition, so its cold build is timed the same way
    "curate_funnel_ladder",
    # stages its (doc_id, stage_ord) ingest attribution for the stream
    # ledger; its cost IS the certified sha-slice MinHash construction
    "curate_funnel_stream_prefix6",
}

#: the certified TPC-H 22 (sql_surface_q{2..22} under the house names;
#: Q1 = agg_pricing_summary). The bench rolls their medians into a
#: ``suites.tpch22`` entry — a standard yardstick a warehouse user can
#: read directly (full sweep covers all 22; the headline set a subset,
#: reported with its count)
TPCH_22 = (
    "agg_pricing_summary",
    "sql_surface_q2", "sql_surface_q3", "sql_surface_q4", "sql_surface_q5",
    "sql_surface_q6", "sql_surface_q7", "sql_surface_q8", "sql_surface_q9",
    "sql_surface_q10", "sql_surface_q11", "sql_surface_q12", "sql_surface_q13",
    "sql_surface_q14", "sql_surface_q15", "sql_surface_q16", "sql_surface_q17",
    "sql_surface_q18", "sql_surface_q19", "sql_surface_q20", "sql_surface_q21",
    "sql_surface_q22",
)

#: trainer → the stage it owns in the catalog stage cache; lets a tool
#: invalidate ONE trainer's artifact without cold-starting every other
#: trainer's consumers (tools/scaling_curve.py uses this for its
#: per-trainer cold timing; stage names from the stage_tables call sites)
TRAINER_STAGES = {
    "text_unigram_learn": "unigram_learned",
    "text_bpe_learn": "bpe_learned_vocab",
    "text_bpe_bytes_learn": "bbpe_learned_vocab",
    "text_wordpiece_learn": "wordpiece_learned",
    "algo_label_propagation": "lpa_labels",
    "curate_funnel_ladder": "funnel_ladder_staged",
    "curate_funnel_stream_prefix6": "stream_prefix6_staged",
}

#: auto re-time threshold (VERDICT r15 #4b): after the timing loop, any
#: query whose median reads > RETIME_FACTOR x its baseline median (and
#: >= RETIME_MIN_SEC absolute) is re-timed RETIME_RUNS times and the
#: re-timed median replaces the transient reading IN the committed
#: artifact (the r15 headline carried one 19.9s GC-transient sample of a
#: 4.1s query and misled every cold reader). The baseline is the prior
#: round's same-host replay artifact, passed via
#: $SPARK_GRAFT_BENCH_BASELINE; when the env var is absent (the external
#: driver's invocation) it defaults to the per-query MIN across the
#: newest tracked round's BENCH_r* artifacts (VERDICT r16 #2 — the
#: driver-captured headline must self-correct its own transients too).
RETIME_FACTOR = 1.5
RETIME_MIN_SEC = 1.0
RETIME_RUNS = 5


def _default_baseline_queries() -> dict[str, float]:
    """Per-query baseline medians for the auto-retime pass when
    $SPARK_GRAFT_BENCH_BASELINE is absent (VERDICT r16 #2): the external
    driver never sets the env var, so the driver-captured artifact — the
    one a third party reads first — was the only cut the transient-
    correction protocol didn't protect (r16's committed capture carried
    an 8.4s reading of a 3.3s query with ``n_retimed: 0``). Scan the
    git-TRACKED ``BENCH_r*`` artifacts, take the NEWEST round, and use the
    per-query MIN across that round's cuts (driver capture + builder
    headline/full + replays): transients are always high-side, so
    min-across-cuts is a robust steady-state estimate even when one cut
    is polluted. Returns canonical-name -> median seconds (empty when no
    artifact exists — the pass is then skipped, as before)."""
    import glob
    import re
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", _REPO, "ls-files", "BENCH_r*.json"],
            capture_output=True,
            text=True,
            timeout=10,
        )
        files = out.stdout.split() if out.returncode == 0 else []
    except (OSError, subprocess.SubprocessError):
        files = []
    if not files:
        files = [
            os.path.basename(f) for f in glob.glob(os.path.join(_REPO, "BENCH_r*.json"))
        ]
    by_round: dict[int, list[str]] = {}
    for f in files:
        m = re.match(r"BENCH_r(\d+)", f)
        if m:
            by_round.setdefault(int(m.group(1)), []).append(f)
    if not by_round:
        return {}
    base: dict[str, float] = {}
    for f in by_round[max(by_round)]:
        try:
            with open(os.path.join(_REPO, f)) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        # driver captures wrap the compact stdout line under "parsed"
        qs = (data.get("parsed") or {}).get("queries") or data.get("queries") or {}
        for k, v in qs.items():
            if isinstance(v, (int, float)):
                canon = k.removeprefix("a0_")
                base[canon] = min(base.get(canon, float(v)), float(v))
    return base


def _resolve(queries: dict, name: str) -> str:
    """Resolve a headline name across verification-window rotations: the
    registry may carry a temporary ``a0_`` prefix (see README) in the round
    where a query awaits driver verification."""
    if name in queries:
        return name
    if f"a0_{name}" in queries:
        return f"a0_{name}"
    if name.startswith("a0_") and name[3:] in queries:
        return name[3:]
    raise KeyError(name)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    queries = plans.all_queries()

    # SPARK_GRAFT_BENCH_SET=all times EVERY registered query (round-over-
    # round regression sweep, archived as BENCH_r{N}_full.json); default
    # stays the curated headline set
    full_sweep = os.environ.get("SPARK_GRAFT_BENCH_SET") == "all"
    if full_sweep:
        headline = tuple(queries)
    else:
        headline = tuple(_resolve(queries, n) for n in HEADLINE)
    # full sweep default stays 1 run/query (the driver's quick regression
    # signal), but SPARK_GRAFT_BENCH_RUNS now overrides it too: the
    # archived BENCH_r{N}_full artifacts are cut at 3-run medians, which
    # absorbs the single-JVM GC transients a 150-query sweep accumulates
    # (r6 archived an 8.4s reading of a 1.0s query; r7's first cut
    # inflated six queries 2-4x vs their standalone medians)
    raw_runs = os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1" if full_sweep else "3")
    try:
        runs = max(1, int(raw_runs))
    except ValueError:
        sys.exit(f"SPARK_GRAFT_BENCH_RUNS must be an integer, got {raw_runs!r}")

    # Warm-up: run every headline query once at the SMALLEST scale factor.
    # Whole-stage codegen compiles per plan structure, so this JIT-compiles
    # the exact generated classes the measured runs will use — the sf0.1
    # timings then measure data work, not first-run compilation (worth
    # ~2-7s on the shingle-heavy dedup plans).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in headline:
        queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        # drop each warm-up's persisted staging tables immediately: across
        # a 150-query sweep the accumulated pins otherwise sit as live-set
        # pressure under the FIRST measured queries (the measurement loop
        # only clears between measured queries)
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    from projet_pipeline_bigdata_org_spark import catalog
    from projet_pipeline_bigdata_org_spark.operators.dedup import (
        release_scoped_pins,
    )

    def time_once(name: str) -> float:
        # clock starts BEFORE the builder call: iterative operators
        # (CC fixpoint loops) execute their rounds eagerly while the
        # DataFrame is built, and timing only the final write would
        # credit them ~0s; for everything else the build is ~ms
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # cold-build tier (VERDICT r15 #4a): one stage-cache clear, then each
    # trainer timed ONCE against its cold stage — the one-time-per-corpus-
    # epoch cost, reported separately so the sweep medians below measure
    # steady state. Each trainer owns a distinct stage, so tier order
    # cannot warm a later trainer's build.
    cold_build: dict[str, float] = {}
    cold_names = [n for n in headline if n.removeprefix("a0_") in TRAINERS]
    if cold_names:
        catalog._STAGE_CACHE.clear()
        for name in cold_names:
            cold_build[name.removeprefix("a0_")] = round(time_once(name), 3)
            spark.catalog.clearCache()

    for name in headline:
        samples = [time_once(name) for _ in range(runs)]
        timings[name] = round(statistics.median(samples), 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]
        # drop caches between queries: operators persist staging tables
        # (scoped, one per operator), and across a 140-query sweep the
        # accumulated pins inflate later queries ~1.5-3x via memory
        # pressure — each query should be timed against a clean executor
        # (the parquet silver-layer stage tables are unaffected by design).
        # release_scoped_pins additionally clears the scope registry —
        # the release-discipline call a long-lived session makes after
        # each query's terminal action (r18; timing methodology
        # unchanged, both calls sit outside the timed region)
        release_scoped_pins()
        spark.catalog.clearCache()

    # auto re-time pass (VERDICT r15 #4b): transient readings vs the prior
    # round's same-host baseline are re-measured at N=RETIME_RUNS before
    # the artifact is written, so the committed number is never one GC
    # hiccup. The original reading rides in "retimed" for auditability.
    retimed: dict[str, list[float]] = {}
    baseline_path = os.environ.get("SPARK_GRAFT_BENCH_BASELINE", "")
    if baseline_path and os.path.isfile(baseline_path):
        with open(baseline_path) as fh:
            base = json.load(fh).get("queries", {})
        basec = {k.removeprefix("a0_"): v for k, v in base.items()}
    else:
        # no env var (the driver's invocation): self-correct against the
        # newest tracked round's artifacts so the committed capture is
        # never one GC hiccup (VERDICT r16 #2)
        basec = _default_baseline_queries()
    if basec:
        for name in timings:
            canon = name.removeprefix("a0_")
            b = basec.get(canon)
            if (
                b
                and timings[name] >= RETIME_MIN_SEC
                and timings[name] > RETIME_FACTOR * b
            ):
                samples = []
                for _ in range(RETIME_RUNS):
                    samples.append(time_once(name))
                    spark.catalog.clearCache()
                med = round(statistics.median(samples), 3)
                retimed[canon] = [timings[name], med]
                timings[name] = med
                spread[name] = [round(min(samples), 3), round(max(samples), 3)]

    total = round(sum(timings.values()), 3)
    tiers = {
        name: TIERS[name.removeprefix("a0_")]
        for name in timings
        if name.removeprefix("a0_") in TIERS
    }
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "tiers": tiers,
        "runs": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cold_build": cold_build,
        "cold_build_total_sec": round(sum(cold_build.values()), 3),
    }
    canon_t = {n.removeprefix("a0_"): t for n, t in timings.items()}
    tpch = [canon_t[n] for n in TPCH_22 if n in canon_t]
    out["suites"] = {
        "tpch22": {"present": len(tpch), "total_sec": round(sum(tpch), 3)}
    }
    if retimed:
        out["retimed"] = retimed
    if runs > 1:
        out["spread"] = spread
    # Full payload to a file (the driver's stdout capture keeps only the
    # last ~2000 chars — BENCH_r12/r13/r14.json all came back parsed:null
    # once the single JSON line outgrew that); the FINAL stdout line is a
    # compact summary that always fits: headline total + the 12
    # r1-comparable medians, canonical names (a0_ rotation prefix
    # stripped).
    full_path = Path(_REPO) / "BENCH_full_latest.json"
    full_path.write_text(json.dumps(out) + "\n")
    canon = {n.removeprefix("a0_"): t for n, t in timings.items()}
    compact = {
        "metric": out["metric"],
        "value": total,
        "unit": "sec",
        "sf": out["sf"],
        "runs": runs,
        "n_queries": len(timings),
        "cold_build_total_sec": out["cold_build_total_sec"],
        "n_retimed": len(retimed),
        "tpch22": out["suites"]["tpch22"],
        "queries": {n: canon[n] for n in R1_COMPARABLE if n in canon},
        "full": full_path.name,
    }
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
