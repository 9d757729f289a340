#!/usr/bin/env python
"""Test runner with per-suite timing artifacts (reference
scripts/agent_test_runner.py:1 — suite execution with printed command +
exit code; here extended with the timing data VERDICT r3 asked for).

Runs pytest once with JUnit XML, aggregates per-suite (per-file) wall
time and outcomes, and writes ``artifacts/test-runs/<ts>/summary.json``
plus a rolling ``latest.json`` — agent_ci_summary and agent_history read
these.

  python scripts/agent_test_runner.py                 # full suite
  python scripts/agent_test_runner.py -m smoke        # a marker tier
  python scripts/agent_test_runner.py -k prefix       # filtered
  python scripts/agent_test_runner.py --slowest 10    # print hotspots
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART_DIR = os.path.join(ROOT, "artifacts", "test-runs")


def aggregate(junit_path: str) -> dict:
    tree = ET.parse(junit_path)
    suites = defaultdict(lambda: {"tests": 0, "failures": 0, "errors": 0,
                                  "skipped": 0, "seconds": 0.0})
    failed_ids = []
    for case in tree.iter("testcase"):
        cls = case.get("classname") or ""
        # classname is dotted ("tests.test_app_api[.TestClass]"); the
        # suite is the test_* module segment
        suite = next((part for part in cls.split(".")
                      if part.startswith("test_")),
                     cls.split(".")[-1] if cls else "unknown")
        s = suites[suite]
        s["tests"] += 1
        s["seconds"] += float(case.get("time") or 0.0)
        if case.find("failure") is not None:
            s["failures"] += 1
            failed_ids.append(f"{cls}::{case.get('name')}")
        if case.find("error") is not None:
            s["errors"] += 1
            failed_ids.append(f"{cls}::{case.get('name')}")
        if case.find("skipped") is not None:
            s["skipped"] += 1
    rows = [
        {"suite": name, **{k: (round(v, 2) if k == "seconds" else v)
                           for k, v in data.items()}}
        for name, data in sorted(suites.items())
    ]
    return {
        "suites": rows,
        "failed": failed_ids,
        "totals": {
            "suites": len(rows),
            "tests": sum(r["tests"] for r in rows),
            "failures": sum(r["failures"] + r["errors"] for r in rows),
            "skipped": sum(r["skipped"] for r in rows),
            "seconds": round(sum(r["seconds"] for r in rows), 1),
        },
    }


def main() -> int:
    p = argparse.ArgumentParser(description="test runner with artifacts")
    p.add_argument("-m", dest="marker", default=None)
    p.add_argument("-k", dest="keyword", default=None)
    p.add_argument("paths", nargs="*", default=[])
    p.add_argument("--slowest", type=int, default=5,
                   help="print the N slowest suites")
    p.add_argument("--no-artifact", action="store_true")
    args = p.parse_args()

    ts = time.strftime("%Y%m%d-%H%M%S", time.gmtime())
    run_dir = os.path.join(ART_DIR, ts)
    os.makedirs(run_dir, exist_ok=True)
    junit = os.path.join(run_dir, "junit.xml")

    cmd = [sys.executable, "-m", "pytest"] + (args.paths or ["tests/"]) + [
        "-q", "--no-header", "-p", "no:cacheprovider",
        f"--junitxml={junit}",
    ]
    if args.marker:
        cmd += ["-m", args.marker]
    if args.keyword:
        cmd += ["-k", args.keyword]

    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    wall = time.time() - t0

    summary = {"kind": "test-run", "ts": ts,
               "command": " ".join(cmd[2:]),
               "returncode": proc.returncode,
               "wall_seconds": round(wall, 1)}
    if os.path.exists(junit):
        summary.update(aggregate(junit))
    else:
        summary["error"] = "no junit output (collection error?)"
        summary["tail"] = proc.stdout.strip().splitlines()[-10:]

    for row in sorted(summary.get("suites", []),
                      key=lambda r: -r["seconds"])[: args.slowest]:
        print(f"{row['seconds']:8.2f}s  {row['suite']}"
              f"  ({row['tests']} tests"
              + (f", {row['failures']} FAILED" if row['failures'] else "")
              + ")")
    t = summary.get("totals", {})
    status = "OK" if proc.returncode == 0 else "FAILED"
    print(f"{status}: {t.get('tests', 0)} tests / "
          f"{t.get('failures', 0)} failures / "
          f"{t.get('skipped', 0)} skipped in {wall:.1f}s "
          f"({t.get('suites', 0)} suites)")
    for fid in summary.get("failed", [])[:20]:
        print(f"  FAILED {fid}")

    if not args.no_artifact:
        with open(os.path.join(run_dir, "summary.json"), "w",
                  encoding="utf-8") as fh:
            json.dump(summary, fh, ensure_ascii=False, indent=1)
        with open(os.path.join(ART_DIR, "latest.json"), "w",
                  encoding="utf-8") as fh:
            json.dump(summary, fh, ensure_ascii=False, indent=1)
        print(f"artifact: {os.path.join(run_dir, 'summary.json')}")
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
