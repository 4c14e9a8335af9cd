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
