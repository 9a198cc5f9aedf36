#!/usr/bin/env python3
"""Compare two bench_timings.json files: per-query deltas, sorted.

Usage: scripts/bench_diff.py old.json new.json [threshold_sec]

Prints queries added/removed and any timing that moved more than the
threshold (default 0.3 s), slowest regressions first — the quick answer
to "did this round regress anything" without eyeballing 190 numbers.
"""
import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): " +
              ", ".join(f"{q}={new[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    moved = [(new[q] - old[q], q) for q in set(old) & set(new)
             if abs(new[q] - old[q]) >= thresh]
    for delta, q in sorted(moved, reverse=True):
        print(f"{'+' if delta > 0 else ''}{delta:.2f}s  {q}  "
              f"{old[q]:.2f} -> {new[q]:.2f}")
    ot = sum(old.values())
    nt = sum(new.values())
    print(f"total: {ot:.1f}s ({len(old)} queries) -> "
          f"{nt:.1f}s ({len(new)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
