#!/usr/bin/env python
"""Curated test harness (reference scripts/agent_harness.py:49): profile
presets composing doctor -> suites -> guardrails, with artifacts.

  python scripts/agent_harness.py --profile local   # fast main-path checks
  python scripts/agent_harness.py --profile auto    # full aggregate gate
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROFILES = {
    "local": [
        ("doctor", [sys.executable, os.path.join(ROOT, "scripts",
                                                 "agent_doctor.py")]),
        # the curated `smoke` marker tier (<1 min; scripts/agent_smoke.py
        # is the standalone entry with --list)
        ("smoke", [sys.executable, "-m", "pytest", "tests/", "-m", "smoke",
                   "-q", "--no-header", "-p", "no:cacheprovider"]),
    ],
    "auto": [
        ("doctor", [sys.executable, os.path.join(ROOT, "scripts",
                                                 "agent_doctor.py")]),
        ("suites", [sys.executable, "-m", "pytest", "tests/", "-q",
                    "--no-header"]),
        ("scenarios", [sys.executable, os.path.join(
            ROOT, "scripts", "agent_eval.py")]),
        # committed generation-quality artifact must stay above the
        # schema-validity floor (skips when no EVAL_r*.json exists yet)
        ("generation-quality", [sys.executable, os.path.join(
            ROOT, "scripts", "eval_generation_quality.py"),
            "--gate", "EVAL_r04.json", "--min-schema-valid", "90"]),
        ("static-guardrails", [sys.executable, os.path.join(
            ROOT, "scripts", "agent_static_guardrails.py")]),
        # route + A.2/A.3/A.5 payload fixtures: drift fails the gate
        # (update with `agent_contracts.py --update` when intentional)
        ("contracts", [sys.executable, os.path.join(
            ROOT, "scripts", "agent_contracts.py")]),
        # the evaluator's own detectors replayed against the must-fail
        # corpus — a "passing" must-fail sample = detector regression
        ("calibration", [sys.executable, os.path.join(
            ROOT, "scripts", "agent_calibration.py")]),
        # task-profile data (risk map the other tools consume) stays valid
        ("profiles", [sys.executable, os.path.join(
            ROOT, "scripts", "agent_profiles.py"), "validate"]),
        ("browser-smoke", [sys.executable, os.path.join(
            ROOT, "scripts", "agent_browser_smoke.py")]),
        # the frontend EXECUTED in the minijs runtime (reference runs
        # Playwright UI smoke: agent_browser_smoke_runner.mjs) — kept as
        # a named stage so a JS regression is visible as its own failure
        ("frontend-js", [sys.executable, "-m", "pytest",
                         "tests/test_frontend_js.py",
                         "tests/test_guard_matrix.py", "-q",
                         "--no-header"]),
    ],
}


def main():
    p = argparse.ArgumentParser(description="test harness")
    p.add_argument("--profile", choices=list(PROFILES), default="local")
    p.add_argument("--artifact-dir", default=None)
    args = p.parse_args()

    results = []
    ok = True
    for name, cmd in PROFILES[args.profile]:
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
        passed = proc.returncode == 0
        ok = ok and passed
        results.append({
            "step": name,
            "passed": passed,
            "seconds": round(time.time() - t0, 1),
            "tail": proc.stdout.strip().splitlines()[-3:],
        })
        icon = "✅" if passed else "❌"
        print(f"{icon} {name} ({results[-1]['seconds']}s)")
        if not passed:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:], file=sys.stderr)
    if args.artifact_dir:
        os.makedirs(args.artifact_dir, exist_ok=True)
        path = os.path.join(
            args.artifact_dir, f"harness-{int(time.time())}.json")
        with open(path, "w", encoding="utf-8") as fh:
            json.dump({"profile": args.profile, "ok": ok,
                       "results": results}, fh, ensure_ascii=False, indent=1)
        print(f"artifact: {path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
