#!/usr/bin/env python3
"""Round-gate for plan-audit completeness (the round-6 bitext lesson,
institutionalized):

1. Every query in the bench registry must have a row in PLANS.md — a query
   that never went through the plan audit is how a CartesianProduct ships.
2. PLANS.md must not carry stale rows for queries no longer registered.
3. Every query NOT in the grandfather list (tools/plan_spec_known.txt —
   the registry snapshot when this guard landed) must be referenced by name
   in PlanRegressionSpec.scala: a NEW operator lands WITH a plan-shape
   regression test in the same commit, or the regen gate goes red.

The registry is derived from the SOURCE OF TRUTH — the `Q("name", ...)`
registration literals in src/main/scala/graft/queries/*.scala (the same
census the round-8 judge scripted) — not from the committed
BENCH_LOCAL.json, so a query added without a bench rerun is caught, not
invisible. BENCH_LOCAL.json is still cross-checked: a count/set mismatch
against the source means the committed bench census is stale → fail.

Usage: python3 tools/plan_guard.py BENCH_LOCAL.json PLANS.md \
           src/test/scala/graft/PlanRegressionSpec.scala tools/plan_spec_known.txt
Exits non-zero on any violation.
"""
import glob
import json
import os
import re
import sys


def main():
    bench_file, plans_file, spec_file, known_file = sys.argv[1:5]

    src_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "src", "main", "scala", "graft", "queries")
    registry = set()
    for f in glob.glob(os.path.join(src_dir, "*.scala")):
        registry |= set(re.findall(r'\bQ\("([a-z0-9_]+)"', open(f).read()))
    if not registry:
        print("PLAN-GUARD FAIL: no Q(\"...\") registrations found under "
              f"{src_dir} — source-census extraction broken")
        sys.exit(1)

    s = open(bench_file).read()
    benched = set(json.loads(s[s.index('{"metric"'):])["queries"].keys())

    plans_rows = set(re.findall(r"^\| `([^`]+)` \|", open(plans_file).read(),
                                re.MULTILINE))
    spec_src = open(spec_file).read()
    known = set(l.strip() for l in open(known_file) if l.strip())

    bad = False
    unbenched = sorted(registry - benched)
    if unbenched:
        bad = True
        print(f"PLAN-GUARD FAIL: {len(unbenched)} source-registered queries "
              f"missing from BENCH_LOCAL.json (stale bench census — rerun "
              f"graft.Bench): {unbenched}")
    unregistered = sorted(benched - registry)
    if unregistered:
        bad = True
        print(f"PLAN-GUARD FAIL: {len(unregistered)} BENCH_LOCAL.json queries "
              f"no longer in the source registry: {unregistered}")
    missing_rows = sorted(registry - plans_rows)
    if missing_rows:
        bad = True
        print(f"PLAN-GUARD FAIL: {len(missing_rows)} registry queries have no "
              f"PLANS.md row: {missing_rows}")
    stale_rows = sorted(plans_rows - registry)
    if stale_rows:
        bad = True
        print(f"PLAN-GUARD FAIL: {len(stale_rows)} stale PLANS.md rows for "
              f"unregistered queries: {stale_rows}")
    untested_new = sorted(q for q in registry - known
                          if f'"{q}"' not in spec_src)
    if untested_new:
        bad = True
        print(f"PLAN-GUARD FAIL: {len(untested_new)} queries added after the "
              f"guard lack a PlanRegressionSpec reference: {untested_new}\n"
              "  Add a plan-shape assertion (or extend an existing sweep test "
              "to name them).")
    if bad:
        sys.exit(1)
    print(f"PLAN-GUARD OK: {len(registry)} registry queries all audited; "
          f"{len(registry - known)} post-guard queries all plan-tested.")


if __name__ == "__main__":
    main()
