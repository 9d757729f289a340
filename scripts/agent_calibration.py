#!/usr/bin/env python
"""Evaluator calibration runner (reference scripts/agent_calibration.py:1).

The harness's scenario evaluator (scripts/agent_eval.py) is itself a
detector — and detectors rot.  This tool proves the evaluator still has
teeth by replaying the MUST-FAIL corpus (tests/harness_calibration/):
every sample encodes a regression class (anonymous write, license
bypass, tenant leak, status-contract break, …) as a scenario that a
healthy app makes the evaluator FAIL on.  A sample that "passes" means
the detector for that class regressed.

  python scripts/agent_calibration.py            # run corpus, exit!=0 on
                                                 # any detector regression
  python scripts/agent_calibration.py --list     # inventory + categories
  python scripts/agent_calibration.py --json out.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CALIBRATION_DIR = os.path.join(ROOT, "tests", "harness_calibration")


def load_samples() -> list:
    samples = []
    for path in sorted(glob.glob(os.path.join(CALIBRATION_DIR, "*.json"))):
        with open(path, encoding="utf-8") as fh:
            payload = json.load(fh)
        name = os.path.basename(path)
        # category from the filename convention <class>-must-fail.json /
        # <class>-should-warn.json
        stem = name.rsplit(".", 1)[0]
        for suffix in ("-must-fail", "-should-warn"):
            if stem.endswith(suffix):
                category, expectation = stem[: -len(suffix)], suffix[1:]
                break
        else:
            category, expectation = stem, payload.get(
                "expect_outcome", "fail")
        samples.append({
            "file": name,
            "name": payload.get("name", stem),
            "category": category,
            "expectation": expectation,
            "scenario": payload,
        })
    return samples


def run_sample(scenario: dict):
    """One isolated app per sample; returns the evaluator's failures."""
    from agent_eval import run_scenario  # scripts/agent_eval.py

    from deepvision_tpu.web.server import create_app

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        app = create_app(data_dir=tmp, overrides={
            "AI_MODE": "template", "SMS_PROVIDER": "mock",
            "SMS_TEST_CODE": "666666", "DEBUG_MODE": True,
            "ADMIN_PHONE_NUMBERS": "13800000001",
            "SMS_SEND_COOLDOWN_SECONDS": 0,
        })
        try:
            failures = run_scenario(app.test_client(), scenario, app=app)
            app.state.report_queue.drain(timeout=20)
        finally:
            app.state.shutdown()
    return failures


def main() -> int:
    ap = argparse.ArgumentParser(description="evaluator calibration")
    ap.add_argument("--list", action="store_true",
                    help="inventory only, no execution")
    ap.add_argument("--json", default="",
                    help="write the full result payload to this file")
    args = ap.parse_args()

    samples = load_samples()
    if not samples:
        print("no calibration samples under tests/harness_calibration/",
              file=sys.stderr)
        return 2

    if args.list:
        for s in samples:
            print(f"{s['category']:<24} {s['expectation']:<12} {s['file']}")
        cats = sorted({s["category"] for s in samples})
        print(f"\n{len(samples)} samples over {len(cats)} regression "
              f"classes: {', '.join(cats)}")
        return 0

    os.environ.setdefault("DEEPVISION_TPU_TESTING", "1")
    results, regressed = [], 0
    for s in samples:
        failures = run_sample(s["scenario"])
        expect_fail = s["scenario"].get("expect_outcome") == "fail"
        if expect_fail:
            detected = bool(failures)
            ok = detected
        else:  # should-warn class: finding list may be advisory
            detected = bool(failures)
            ok = True
        results.append({**{k: s[k] for k in
                           ("file", "name", "category", "expectation")},
                        "detected": detected, "ok": ok,
                        "findings": len(failures)})
        mark = "✅" if ok else "❌"
        verb = ("detected" if detected else
                ("MISSED — detector regression" if expect_fail
                 else "no findings (advisory)"))
        print(f"{mark} {s['category']}: {verb}")
        if not ok:
            regressed += 1

    payload = {"ok": regressed == 0, "samples": len(samples),
               "regressed": regressed, "results": results}
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, ensure_ascii=False, indent=1)
    print(f"CALIBRATION {'OK' if regressed == 0 else 'FAIL'}: "
          f"{len(samples) - regressed}/{len(samples)} detectors alive")
    return 0 if regressed == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
