"""Compute like-for-like deltas between two committed BENCH_*.json
artifacts — the reproducible number round notes must cite (VERDICT r11
#6: a round note claimed +11% while its own archived artifact computed
+3%; deltas now come from a command anyone can re-run).

Per-query names are canonicalized across verification-window rotations
(``a0_`` prefixes come and go as the driver window rotates), the common
subset is compared, and per-side exclusive queries are listed so a
"faster" total can never silently ride on a changed query mix.

Usage: python tools/bench_delta.py BENCH_old.json BENCH_new.json [--top N]
"""

from __future__ import annotations

import argparse
import json


def canon(name: str) -> str:
    return name.removeprefix("a0_").removeprefix("ext_")


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    # driver-recorded artifacts wrap the bench line under "parsed";
    # builder-archived ones ARE the bench line
    if "queries" not in data and "parsed" in data:
        data = data["parsed"]
    return {canon(k): float(v) for k, v in data["queries"].items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=8, help="largest movers to list")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    if t_old == 0:
        # empty common subset (or all-zero timings): still report the
        # per-side exclusives below instead of dividing by zero
        print(f"common queries: {len(common)} — no comparable timings")
    else:
        print(
            f"common queries: {len(common)}  "
            f"old {t_old:.1f}s -> new {t_new:.1f}s  "
            f"({(t_new - t_old) / t_old * 100:+.1f}%)"
        )
    movers = sorted(common, key=lambda q: abs(new[q] - old[q]), reverse=True)
    for q in movers[: args.top]:
        # 1-run sweeps record phantom 3-5x movers (r10-r12: LPA,
        # distinct_counts, sketch_heavy_hitters); any query whose ratio
        # leaves the observed host band is flagged for an N=5 re-time
        # before it is believed
        ratio = new[q] / old[q] if old[q] > 0 else float("inf")
        flag = (
            "  << suspected transient: re-time N=5 before believing"
            if (ratio > 1.5 or ratio < 1 / 1.5) and abs(new[q] - old[q]) > 0.5
            else ""
        )
        print(
            f"  {q:<40s} {old[q]:7.2f}s -> {new[q]:7.2f}s "
            f"({new[q] - old[q]:+.2f}s){flag}"
        )
    if only_old:
        print(f"only in {args.old} ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"only in {args.new} ({len(only_new)}): {', '.join(only_new)}")


if __name__ == "__main__":
    main()
