#!/usr/bin/env python3
"""Per-query scaling audit between two graft.Bench JSON dumps at different
SFs (dev tooling, driver-side python). Flags queries whose time grew faster
than the data (ratio > factor) — the empirical superlinearity gate the
100 TB claim rests on. Fixed-cost floors (streaming state-store setup, tiny
dims) make most ratios LESS than the data factor; anything well above it is
a plan that does not scale linearly and needs a fix or a declared tag.

Usage: python3 tools/scalecheck.py BENCH_LOCAL_sf0.1.json BENCH_sf1.json 10
"""
import json
import sys


def load(p):
    s = open(p).read()
    return json.loads(s[s.index('{"metric"'):])


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb), key=lambda k: -qb[k] / max(qa[k], 1e-9))
    print(f"{'query':38s}{'small':>8s}{'big':>8s}{'ratio':>7s}  flag")
    flagged = 0
    for k in common:
        r = qb[k] / max(qa[k], 1e-9)
        flag = "SUPERLINEAR" if (r > factor and qb[k] > 1.0) else ""
        if flag:
            flagged += 1
        if flag or r > factor / 2 or qb[k] > 3.0:
            print(f"{k:38s}{qa[k]:8.2f}{qb[k]:8.2f}{r:7.1f}  {flag}")
    ta, tb = sum(qa[k] for k in common), sum(qb[k] for k in common)
    print(f"\ntotal (common {len(common)}): {ta:.1f}s -> {tb:.1f}s "
          f"= {tb / ta:.2f}x at {factor:.0f}x data; {flagged} superlinear")


if __name__ == "__main__":
    main()
