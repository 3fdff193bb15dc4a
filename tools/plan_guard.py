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

Usage: python3 tools/plan_guard.py BENCH_LOCAL.json PLANS.md \
           src/test/scala/graft/PlanRegressionSpec.scala tools/plan_spec_known.txt
Exits non-zero on any violation.
"""
import json
import re
import sys


def main():
    bench_file, plans_file, spec_file, known_file = sys.argv[1:5]

    s = open(bench_file).read()
    registry = set(json.loads(s[s.index('{"metric"'):])["queries"].keys())

    plans_rows = set(re.findall(r"^\| `([^`]+)` \|", open(plans_file).read(),
                                re.MULTILINE))
    spec_src = open(spec_file).read()
    known = set(l.strip() for l in open(known_file) if l.strip())

    bad = False
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
