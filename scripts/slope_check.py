#!/usr/bin/env python3
"""Per-query scale slopes between two Bench JSON lines.

Usage: slope_check.py <bench_small.json> <bench_big.json> <size_ratio>

Prints slope = log(t_big/t_small)/log(ratio) per query, sorted worst
first, and flags slopes > 1.1 (super-linear) among queries whose big
run costs enough to matter (>1 s) — sub-second timings are noise.
"""
import json
import math
import sys


def main() -> int:
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    ratio = float(sys.argv[3])
    rows = []
    for q in sorted(set(small) & set(big)):
        t1, t2 = small[q], big[q]
        if t1 <= 0 or t2 <= 0:
            continue
        slope = math.log(t2 / t1) / math.log(ratio)
        rows.append((slope, q, t1, t2))
    rows.sort(reverse=True)
    flagged = [(s, q, a, b) for s, q, a, b in rows if s > 1.1 and b > 1.0]
    print(f"queries={len(rows)} flagged(slope>1.1 & t_big>1s)="
          f"{len(flagged)}")
    for s, q, a, b in flagged:
        print(f"FLAG {s:5.2f}  {q}  {a:.2f}s -> {b:.2f}s")
    print("-- top 15 slopes --")
    for s, q, a, b in rows[:15]:
        print(f"{s:5.2f}  {q}  {a:.2f}s -> {b:.2f}s")
    missing = sorted(set(small) - set(big)) + sorted(set(big) - set(small))
    if missing:
        print(f"missing from one side: {missing}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
