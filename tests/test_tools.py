"""Unit tests for the repo tooling (no Spark session needed)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_delta_canonicalizes_and_reports(tmp_path):
    """bench_delta must canonicalize a0_/ext_ rotation prefixes, compare
    only the common subset, and list each side's exclusive queries —
    accepting both raw bench lines and driver-recorded wrappers."""
    old = {
        "metric": "headline_queries_total_sec",
        "value": 3.0,
        "queries": {"a0_q_one": 1.0, "q_two": 2.0, "q_gone": 5.0},
    }
    new_wrapped = {
        "n": 1,
        "parsed": {
            "queries": {"q_one": 1.5, "ext_q_two": 2.0, "q_new": 9.0}
        },
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new_wrapped))
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_delta.py"), str(po), str(pn)],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    # common subset = {q_one, q_two}: 3.0s -> 3.5s (+16.7%)
    assert "common queries: 2" in out
    assert "+16.7%" in out
    assert "q_gone" in out and "q_new" in out


def test_bench_default_baseline_is_newest_round_min():
    """VERDICT r16 #2: with $SPARK_GRAFT_BENCH_BASELINE unset (the
    external driver's invocation), bench.py must still auto-retime, using
    the per-query MIN across the NEWEST tracked round's BENCH_r*
    artifacts — so one polluted cut (r16's driver capture carried an
    8.4s sample of a 3.3s query) can never become the committed number
    again. Checks the live repo artifacts: every baseline value must be
    <= the corresponding value in each newest-round cut it was drawn
    from, and driver-wrapper files (queries under ``parsed``) must be
    understood."""
    import re

    sys.path.insert(0, str(REPO))
    import bench

    base = bench._default_baseline_queries()
    assert base, "no tracked BENCH_r* artifacts found"
    # mirror the implementation's artifact set: git-TRACKED files only
    # (mid-round the working tree holds fresher untracked cuts the
    # default baseline must ignore — same rule as the rotation)
    tracked = subprocess.run(
        ["git", "-C", str(REPO), "ls-files", "BENCH_r*.json"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    rounds = [
        int(m.group(1))
        for f in tracked
        if (m := re.match(r"BENCH_r(\d+)", f))
    ]
    newest = max(rounds)
    checked = 0
    for f in tracked:
        if not f.startswith(f"BENCH_r{newest}"):
            continue
        data = json.loads((REPO / f).read_text())
        qs = (data.get("parsed") or {}).get("queries") or data.get("queries") or {}
        for k, v in qs.items():
            canon = k.removeprefix("a0_")
            assert canon in base and base[canon] <= v + 1e-9, (f, k)
            checked += 1
    assert checked > 0
