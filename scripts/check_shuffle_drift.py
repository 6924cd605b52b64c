#!/usr/bin/env python3
"""Shuffle-bytes drift gate: diff per-query shuffle_mb between two bench
artifacts (bench_last.json / BENCH_rN.json). Wall time on this container
moves 2-8x with host load; bytes through the shuffle are deterministic
for a fixed plan + SF, so THIS diff is the box-immune perf-regression
signal: a query whose shuffle grew is doing more data movement at any
cluster size, whatever the clock said.

Usage: check_shuffle_drift.py BASELINE.json CURRENT.json [pct] [mb]
Flags queries whose shuffle grew by more than pct% (default 25) AND
more than mb MB (default 2.0) — both thresholds, so MB-scale jitter on
tiny queries and percent-scale jitter on sub-MB queries stay quiet.
Exit 1 if anything is flagged; NEW/REMOVED queries are informational.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    sh = d.get("shuffle_mb")
    if not isinstance(sh, dict) or not sh:
        sys.exit(f"{path}: no shuffle_mb map — not a full-sweep artifact?")
    return sh


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    base, cur = load(sys.argv[1]), load(sys.argv[2])
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    mb = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    for q in sorted(set(cur) - set(base)):
        print(f"NEW {q} {cur[q]:.1f} MB")
    for q in sorted(set(base) - set(cur)):
        print(f"REMOVED {q} (was {base[q]:.1f} MB)")
    grew = []
    for q in sorted(set(base) & set(cur)):
        d = cur[q] - base[q]
        if d > mb and base[q] > 0 and d / base[q] * 100 > pct:
            grew.append((q, base[q], cur[q]))
        elif d > mb and base[q] == 0:
            grew.append((q, base[q], cur[q]))
    for q, b, c in grew:
        print(f"GREW {q} {b:.1f} -> {c:.1f} MB")
    if grew:
        print(f"== {len(grew)} queries shuffle-grew beyond {pct}% + {mb} MB ==")
        sys.exit(1)
    print("== no shuffle drift ==")
    sys.exit(0)


if __name__ == "__main__":
    main()
