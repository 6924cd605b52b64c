#!/usr/bin/env python3
"""Shuffle-bytes + CPU-time drift gate: diff per-query shuffle_mb (and,
when both artifacts carry it, cpu_s) between two bench artifacts
(bench_last.json / BENCH_rN.json / SHUFFLE_BASELINE.json). Wall time on
this container moves 2-8x with host load; bytes through the shuffle are
deterministic for a fixed plan + SF, and executor CPU time consumed by
a query's own tasks is near-immune to contention — so these diffs are
the box-immune perf-regression signals: shuffle growth means more data
movement at any cluster size, CPU growth means more compute, whatever
the clock said.

Usage: check_shuffle_drift.py BASELINE.json CURRENT.json [pct] [mb] [cpu_pct] [cpu_s]
Flags queries whose shuffle grew by more than pct% (default 25) AND
more than mb MB (default 2.0), and queries whose CPU grew by more than
cpu_pct% (default 40) AND more than cpu_s seconds (default 1.5) — both
thresholds each, so MB/s-scale jitter on tiny queries and percent-scale
jitter on sub-MB/sub-second queries stay quiet. CPU thresholds are
looser than shuffle: JIT warm-up and GC attribution add real variance
that bytes don't have. Exit 1 if anything is flagged; NEW/REMOVED
queries and a missing cpu_s map are informational.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    sh = d.get("shuffle_mb")
    if not isinstance(sh, dict) or not sh:
        sys.exit(f"{path}: no shuffle_mb map — not a full-sweep artifact?")
    cpu = d.get("cpu_s")
    return sh, (cpu if isinstance(cpu, dict) and cpu else None)


def drift(base, cur, pct, floor, unit):
    for q in sorted(set(cur) - set(base)):
        print(f"NEW {q} {cur[q]:.1f} {unit}")
    for q in sorted(set(base) - set(cur)):
        print(f"REMOVED {q} (was {base[q]:.1f} {unit})")
    grew = []
    for q in sorted(set(base) & set(cur)):
        d = cur[q] - base[q]
        if d > floor and base[q] > 0 and d / base[q] * 100 > pct:
            grew.append((q, base[q], cur[q]))
        elif d > floor and base[q] == 0:
            grew.append((q, base[q], cur[q]))
    for q, b, c in grew:
        print(f"GREW {q} {b:.1f} -> {c:.1f} {unit}")
    return grew


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    (base_sh, base_cpu), (cur_sh, cur_cpu) = load(sys.argv[1]), load(sys.argv[2])
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    mb = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    cpu_pct = float(sys.argv[5]) if len(sys.argv) > 5 else 40.0
    cpu_floor = float(sys.argv[6]) if len(sys.argv) > 6 else 1.5
    grew = drift(base_sh, cur_sh, pct, mb, "MB")
    cpu_grew = []
    if base_cpu is not None and cur_cpu is not None:
        cpu_grew = drift(base_cpu, cur_cpu, cpu_pct, cpu_floor, "cpu-s")
    else:
        print("(cpu_s map absent in one artifact — shuffle-only diff)")
    if grew or cpu_grew:
        print(f"== {len(grew)} queries shuffle-grew beyond {pct}% + {mb} MB; "
              f"{len(cpu_grew)} cpu-grew beyond {cpu_pct}% + {cpu_floor} s ==")
        sys.exit(1)
    print("== no shuffle/cpu drift ==")
    sys.exit(0)


if __name__ == "__main__":
    main()
