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
import subprocess
import sys
import xml.etree.ElementTree as ET

SUITES = [
    "GoldenGpSpec", "GoldenHindcastSpec", "GoldenGwrSpec", "GoldenE2eSpec",
    "GoldenZonalSpec", "GoldenPipelineSpec", "SourcesSpec", "PublishSpec",
    "NotifyProgressSpec", "MlSpec", "LiveRestSpec", "LiveNotifySpec",
]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_src_mtime():
    """mtime of the newest file under src/ — a report older than this is
    stale: it predates some source change and proves nothing about HEAD."""
    newest = 0.0
    for dirpath, _, files in os.walk(os.path.join(ROOT, "src")):
        for f in files:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(dirpath, f)))
            except OSError:
                pass
    return newest


def git_head():
    try:
        return subprocess.run(
            ["git", "-C", ROOT, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip() or "?"
    except Exception:
        return "?"


def main():
    rows = ["| suite | tests | failures | stamped |", "|---|---|---|---|"]
    ok = True
    src_mtime = newest_src_mtime()
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
        # Freshness gate: a green report whose file predates the newest
        # source file was produced against different code — mark STALE and
        # fail, so the stamp can never launder an out-of-date test run.
        if status == "green" and os.path.getmtime(path) < src_mtime:
            status = "STALE"
        if status != "green":
            ok = False
        rows.append(f"| `{s}` | {tests} | {bad} | {stamp} ({status}) |")
    rows.append(f"\nStamped at git `{git_head()}`.")
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
