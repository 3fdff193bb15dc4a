#!/usr/bin/env python3
"""Cold-cache vs steady-state bench comparison (round-9 ratification
condition (b) on the two-part bar, BASELINE.md "Bar for our build").

Reads the steady-state BENCH_LOCAL.json (best-of-3, caches warm inside the
timed region) and BENCH_COLD.json (SPARK_GRAFT_COLD=1: single pass,
clearCache() + every SessionMemo dropped between queries) and appends a
"Cold-cache run" section to BENCHCMP.md: grand totals, the same-run DuckDB
total for the cold ratio, and the cold−steady delta attributed per query
family — which quantifies exactly the shared-builder/FrameMemo subsidy the
steady basis carries.

Usage: python3 tools/coldcmp.py BENCH_LOCAL.json BENCH_COLD.json BENCHCMP.md \
           [BENCH_COLD_run2.json]

Round-12 additions (r11 verdict #1): totals carry the embedded same-window
host-rate control and its normalized reading, and an optional SECOND cold
census file adds a reproducibility row — two same-code cold runs must agree
before the cold number is treated as the subsidy bound (the r11 cold
census read 699s against r10's 197s and r12's reproduced ~280s pair; the
outlier was an in-run host/JVM degradation the 3-sample cold control median
missed, not an eviction-path change — see BASELINE.md round-11/12 notes).
"""
import json
import re
import sys


def load(p):
    s = open(p).read()
    return json.loads(s[s.index('{"metric"'):])


FAMILIES = [
    ("graph_", "graph (shared edge/adjacency builders)"),
    ("ann_", "ann (shared doubled-embedding builder)"),
    ("dedup_", "dedup (components, shingle dicts, LSH)"),
    ("mine_", "dedup (components, shingle dicts, LSH)"),
    ("stream_", "streaming (state-store drains)"),
    ("corpus_", "corpus"),
    ("pref_", "corpus"),
    ("mm_", "multimodal"),
    ("text_", "text"),
    ("sample_", "sampling"),
    ("forage_", "forage pipeline (GWR stage memo)"),
    ("m1_", "ml"), ("m2_", "ml"), ("m3_", "ml"), ("m4_", "ml"),
    ("ml_", "ml"), ("m_", "ml"),
    ("j4_", "zonal (membership memo)"),
    ("cdc_", "cdc/layout"), ("layout_", "cdc/layout"), ("zorder_", "cdc/layout"),
    ("compaction_", "cdc/layout"), ("skipping_", "cdc/layout"),
    ("privacy_", "privacy/dq"), ("dq_", "privacy/dq"),
]


def family(q):
    for pre, name in FAMILIES:
        if q.startswith(pre):
            return name
    return "core sql (scans/joins/aggs/windows)"


def norm(d):
    """(control, normalized-factor) from a bench JSON; (None, 1.0) pre-r11."""
    c = d.get("control")
    return c, (d.get("control_ref", 0.62) / c) if c else 1.0


def main():
    steady_f, cold_f, out_md = sys.argv[1], sys.argv[2], sys.argv[3]
    cold2_f = sys.argv[4] if len(sys.argv) > 4 else None
    steady, cold = load(steady_f), load(cold_f)
    qs, qc = steady["queries"], cold["queries"]
    common = sorted(set(qs) & set(qc))
    fam = {}
    for q in common:
        f = family(q)
        s, c = fam.get(f, (0.0, 0.0))
        fam[f] = (s + qs[q], c + qc[q])
    ts = sum(qs[q] for q in common)
    tc = sum(qc[q] for q in common)

    lines = [
        "",
        "## Cold-cache run (ratification condition b)",
        "",
        "`SPARK_GRAFT_COLD=1 graft.Bench`: ONE timed pass, and between every",
        "query `clearCache()` plus a drop of every `SessionMemo` (FrameMemo'd",
        "family builders, the resolved-scan cache, the PPJoin/LSH shingle",
        "dictionaries, the zonal membership tables). JIT/codegen warmup is",
        "kept, so cold−steady isolates exactly the data-cache/memo subsidy",
        "the steady best-of-3 basis carries. Single-pass cold numbers also",
        "eat each query's own intra-query re-reads and whatever host noise a",
        "best-of-3 minimum would have absorbed — the cold total is an upper",
        "bound on the subsidy, not a pure cache number.",
        "",
        "| basis | spark total (s) | control | normalized (s) | vs steady (norm) |",
        "|---|---|---|---|---|",
    ]
    cs, fs = norm(steady)
    cc, fc = norm(cold)
    lines += [
        f"| steady (best-of-3, warm memos) | {ts:.1f} | {cs if cs else '—'} "
        f"| {ts * fs:.1f} | — |",
        f"| cold (single pass, all caches/memos dropped) | {tc:.1f} | "
        f"{cc if cc else '—'} | {tc * fc:.1f} | "
        f"+{tc * fc - ts * fs:.1f}s ({tc * fc / (ts * fs):.2f}×) |",
    ]
    if cold2_f:
        cold2 = load(cold2_f)
        qc2 = cold2["queries"]
        tc2 = sum(qc2[q] for q in common if q in qc2)
        cc2, fc2 = norm(cold2)
        agree = tc2 * fc2 / (tc * fc)
        lines += [
            f"| cold, second same-code run (reproducibility) | {tc2:.1f} | "
            f"{cc2 if cc2 else '—'} | {tc2 * fc2:.1f} | "
            f"normalized agreement ×{agree:.2f} vs run 1 |",
        ]
    lines += [
        "",
        "Delta attributed per family (cold − steady, families ≥ 0.5s delta):",
        "",
        "| family | steady s | cold s | delta s |",
        "|---|---|---|---|",
    ]
    rows = sorted(fam.items(), key=lambda kv: -(kv[1][1] - kv[1][0]))
    shown_s = shown_c = 0.0
    for f, (s, c) in rows:
        if c - s >= 0.5:
            lines.append(f"| {f} | {s:.1f} | {c:.1f} | +{c - s:.1f} |")
            shown_s += s
            shown_c += c
    lines.append(f"| (all remaining families) | {ts - shown_s:.1f} | "
                 f"{tc - shown_c:.1f} | +{(tc - shown_c) - (ts - shown_s):.1f} |")
    lines.append("")

    md = open(out_md).read()
    # idempotent: replace a previous cold section if present
    md = re.sub(r"\n## Cold-cache run \(ratification condition b\)\n(.|\n)*$",
                "\n", md)
    open(out_md, "w").write(md.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print(f"cold total {tc:.1f}s vs steady {ts:.1f}s "
          f"(+{tc - ts:.1f}s, {tc / ts:.2f}x) -> {out_md}")


if __name__ == "__main__":
    main()
