#!/usr/bin/env python3
"""Cross-round per-query bench delta table, NORMALIZED by the same-window
host-rate control (r10 verdict #2 / r11 verdict #5).

Raw per-query seconds from two rounds are not comparable when the host rate
differed between their windows; the control median embedded in each
BENCH_*.json calibrates that rate. Per query:

    normalized = raw * (control_ref / control)

Usage:
    tools/benchdiff.py OLD_BENCH.json NEW_BENCH.json [--top N] [--min-delta S]

Prints a markdown table of the N largest |normalized delta| queries plus
totals, so round adjudications start from normalized deltas instead of
re-deriving the rate correction by hand. Files without a control field
(pre-r11) get factor 1.0 and a footnote.
"""
import argparse
import json
import sys


def load(path):
    """Accepts either the full BENCH_LOCAL.json/BENCH_COLD.json (has
    'queries') or a driver BENCH_r{N}.json wrapper (the final stdout line
    parsed under 'parsed', with a truncated slowest-first query map plus
    omitted_total)."""
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        sys.exit(f"{path}: no query map (wrapper with parsed=null?)")
    control = d.get("control")
    ref = d.get("control_ref", 0.62)
    factor = (ref / control) if control else 1.0
    return d, factor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--min-delta", type=float, default=0.05)
    args = ap.parse_args()

    old, f_old = load(args.old)
    new, f_new = load(args.new)
    qo, qn = old["queries"], new["queries"]

    rows = []
    for name in sorted(set(qo) | set(qn)):
        ro, rn = qo.get(name), qn.get(name)
        no = ro * f_old if ro is not None else None
        nn = rn * f_new if rn is not None else None
        if no is None or nn is None:
            rows.append((name, ro, rn, no, nn, None))
        else:
            rows.append((name, ro, rn, no, nn, nn - no))

    def fmt(v):
        return "—" if v is None else f"{v:.2f}"

    print(f"old: {args.old} control={old.get('control', '—')} "
          f"(norm factor {f_old:.3f}{'' if old.get('control') else ', NO CONTROL — raw'})")
    print(f"new: {args.new} control={new.get('control', '—')} "
          f"(norm factor {f_new:.3f}{'' if new.get('control') else ', NO CONTROL — raw'})")
    to = sum(v for v in qo.values())
    tn = sum(v for v in qn.values())
    print(f"totals: raw {to:.1f} -> {tn:.1f}; "
          f"normalized {to * f_old:.1f} -> {tn * f_new:.1f}\n")

    ranked = [r for r in rows if r[5] is not None and abs(r[5]) >= args.min_delta]
    ranked.sort(key=lambda r: -abs(r[5]))
    added = [r for r in rows if r[3] is None]
    removed = [r for r in rows if r[4] is None]

    print("| query | raw old | raw new | norm old | norm new | norm delta |")
    print("|---|---|---|---|---|---|")
    for name, ro, rn, no, nn, d in ranked[: args.top]:
        print(f"| {name} | {fmt(ro)} | {fmt(rn)} | {fmt(no)} | {fmt(nn)} | {d:+.2f} |")
    if added:
        print(f"\nadded ({len(added)}): "
              + ", ".join(f"{n}={fmt(v)}" for n, _, _, _, v, _ in added))
    if removed:
        print(f"removed ({len(removed)}): "
              + ", ".join(f"{n}={fmt(v)}" for n, _, _, v, _, _ in removed))


if __name__ == "__main__":
    main()
