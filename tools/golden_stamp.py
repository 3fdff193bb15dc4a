#!/usr/bin/env python3
"""Stamp GOLDEN.md's status table from the ScalaTest JUnit XML reports.

Dev tooling (driver-side python, like check.py). Reads
target/test-reports/TEST-graft.<Suite>.xml for each golden suite, extracts
pass/fail counts and the report timestamp, and rewrites the block between
the GOLDEN_STATUS markers. Run after `sbt test`; exits non-zero if any
golden suite is missing or not green, so regen_round.sh can gate on it.
"""
import glob
import os
import sys
import xml.etree.ElementTree as ET

SUITES = [
    "GoldenGpSpec", "GoldenHindcastSpec", "GoldenGwrSpec", "GoldenE2eSpec",
    "GoldenZonalSpec", "GoldenPipelineSpec", "SourcesSpec", "PublishSpec",
    "NotifyProgressSpec", "MlSpec",
]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rows = ["| suite | tests | failures | stamped |", "|---|---|---|---|"]
    ok = True
    for s in SUITES:
        path = os.path.join(ROOT, "target", "test-reports", f"TEST-graft.{s}.xml")
        if not os.path.exists(path):
            rows.append(f"| `{s}` | — | — | MISSING |")
            ok = False
            continue
        t = ET.parse(path).getroot()
        tests = int(t.get("tests", 0))
        bad = int(t.get("failures", 0)) + int(t.get("errors", 0))
        stamp = t.get("timestamp", "?")
        status = "green" if bad == 0 and tests > 0 else "RED"
        if status != "green":
            ok = False
        rows.append(f"| `{s}` | {tests} | {bad} | {stamp} ({status}) |")
    table = "\n".join(rows)

    md_path = os.path.join(ROOT, "GOLDEN.md")
    md = open(md_path).read()
    b, e = "<!-- GOLDEN_STATUS_BEGIN -->", "<!-- GOLDEN_STATUS_END -->"
    pre, rest = md.split(b)
    _, post = rest.split(e)
    open(md_path, "w").write(pre + b + "\n" + table + "\n" + e + post)
    print(table)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
