#!/usr/bin/env python3
"""Adjudicate bench noise mechanically: diff a graft.Bench detail file
against the per-query envelope recorded in BASELINE.md and print every
query more than FACTOR x its recorded time (the co-tenant-spike
pattern this host shows 2-5x of, documented in BASELINE.md).

Usage: check_bench.py <bench_detail.json> [factor=2.0] [baseline=BASELINE.md]

Exit code 0 = all inside the envelope; 1 = spikes listed (re-measure
them isolated: SPARK_GRAFT_ONLY=<q> SPARK_GRAFT_REPS=3 before calling
a plan regression). Queries absent from the envelope (new this round)
are listed informationally and do not fail the check.
"""
import json
import os
import re
import sys


def load_envelope(baseline_path):
    """Parse the `| query | spark s | duckdb s | ratio |` table rows."""
    env = {}
    with open(baseline_path) as f:
        for line in f:
            m = re.match(r"\|\s*(q_?\w+)\s*\|\s*([0-9.]+)\s*\|", line)
            if m:
                env[m.group(1)] = float(m.group(2))
    return env


def main(detail_path, factor=2.0, baseline_path=None):
    if baseline_path is None:
        baseline_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            if os.path.basename(os.path.dirname(os.path.abspath(__file__)))
            == "tools" else ".", "BASELINE.md")
    env = load_envelope(baseline_path)
    if not env:
        print(f"no envelope table found in {baseline_path}", file=sys.stderr)
        return 2
    detail = json.load(open(detail_path))
    queries = detail.get("queries", detail)
    if not (isinstance(queries, dict)
            and all(isinstance(v, (int, float)) for v in queries.values())):
        # driver-captured BENCH_r*.json wraps only the summary line —
        # the per-query map lives in graft.Bench's target/bench_detail.json
        print(f"{detail_path} has no per-query map; point this at a "
              "graft.Bench detail file (target/bench_detail.json)",
              file=sys.stderr)
        return 2
    # sub-second envelope entries are fixed plan/launch overhead where
    # 2x is noise by construction; use an absolute floor as well
    floor = 1.0
    spikes, new = [], []
    for name, t in sorted(queries.items()):
        if t < 0:
            spikes.append((name, t, None))  # failed query: always flag
            continue
        if name not in env:
            new.append((name, t))
            continue
        ref = env[name]
        if t > max(factor * ref, floor):
            spikes.append((name, t, ref))
    for name, t in new:
        print(f"NEW   {name}: {t:.2f} s (no envelope entry yet)")
    for name, t, ref in spikes:
        if ref is None:
            print(f"FAIL  {name}: query failed (-1)")
        else:
            print(f"SPIKE {name}: {t:.2f} s vs envelope {ref:.2f} s "
                  f"({t / ref:.1f}x)")
    n = len(queries)
    print(f"\n{n - len(spikes) - len(new)}/{n} inside the envelope "
          f"(factor {factor}, floor {floor}s); {len(new)} new, "
          f"{len(spikes)} spiked")
    return 1 if spikes else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sys.exit(main(args[0],
                  float(args[1]) if len(args) > 1 else 2.0,
                  args[2] if len(args) > 2 else None))
