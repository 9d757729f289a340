#!/usr/bin/env python
"""Scenario evaluator (reference scripts/agent_eval.py): run JSON-described
API scenarios from tests/harness_scenarios/ against a fresh app instance.

Scenario format:
  {"name": ..., "steps": [
     {"login": "<phone>"} |
     {"request": {"method", "path", "json"}, "expect": {"status": N,
      "contains": "...", "json_path": {"key": value}},
      "save": {"var": "json_key"}}
  ]}
``$var`` placeholders in paths/bodies substitute saved values.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENARIO_DIR = os.path.join(ROOT, "tests", "harness_scenarios")


def substitute(obj, env):
    if isinstance(obj, str):
        for key, val in env.items():
            obj = obj.replace(f"${key}", str(val))
        return obj
    if isinstance(obj, dict):
        return {k: substitute(v, env) for k, v in obj.items()}
    if isinstance(obj, list):
        return [substitute(v, env) for v in obj]
    return obj


def run_scenario(client, scenario: dict, app=None) -> list:
    failures = []
    env: dict = {}
    for i, step in enumerate(scenario.get("steps", [])):
        step = substitute(step, env)
        if "login" in step:
            phone = step["login"]
            client.post("/api/auth/sms/send-code",
                        json_body={"phone": phone})
            r = client.post("/api/auth/login/code",
                            json_body={"phone": phone, "code": "666666"})
            if r.status_code != 200:
                failures.append(f"step {i}: login failed {r.status_code}")
            elif step.get("save_user"):
                user = r.get_json().get("user") or {}
                for var in step["save_user"]:
                    env[var] = user.get("user_id")
            continue
        if "logout" in step:
            client.post("/api/auth/logout")
            continue
        if "drain_reports" in step:
            if app is not None:
                app.state.report_queue.drain(timeout=30)
            continue
        if "upload" in step:
            up = step["upload"]
            resp = client.post(
                up["path"],
                files={"file": (up["filename"],
                                up["content"].encode("utf-8"),
                                up.get("content_type", "text/plain"))},
            )
            expect = step.get("expect", {})
            if "status" in expect and resp.status_code != expect["status"]:
                failures.append(
                    f"step {i}: upload {up['path']} -> "
                    f"{resp.status_code}, expected {expect['status']}")
            continue
        if "seed_report" in step:
            seed = step["seed_report"]
            if app is not None:
                app.state.reports.save(
                    seed["name"], seed.get("content", "# seed"),
                    owner_user_id=str(seed.get("owner", "")) or None,
                    instance_scope=seed.get(
                        "scope", app.state.instance_scope),
                )
            continue
        req = step["request"]
        method = req.get("method", "GET").upper()
        resp = client.open(req["path"], method,
                           json_body=req.get("json"))
        expect = step.get("expect", {})
        if "status" in expect and resp.status_code != expect["status"]:
            failures.append(
                f"step {i}: {method} {req['path']} -> "
                f"{resp.status_code}, expected {expect['status']} "
                f"({resp.text[:120]})"
            )
            continue
        data = resp.get_json()
        if "contains" in expect and expect["contains"] not in resp.text:
            failures.append(
                f"step {i}: body missing {expect['contains']!r}"
            )
        for key, val in (expect.get("json") or {}).items():
            if not isinstance(data, dict) or data.get(key) != val:
                failures.append(
                    f"step {i}: json[{key}] = "
                    f"{data.get(key) if isinstance(data, dict) else data!r}"
                    f", expected {val!r}"
                )
        for var, key in (step.get("save") or {}).items():
            if isinstance(data, dict) and key in data:
                env[var] = data[key]
    return failures


CALIBRATION_DIR = os.path.join(ROOT, "tests", "harness_calibration")


def main():
    p = argparse.ArgumentParser(description="scenario evaluator")
    p.add_argument("--pattern", default="*.json")
    p.add_argument("--calibration", action="store_true",
                   help="run the must-fail calibration corpus: every "
                        "scenario marked expect_outcome=fail MUST fail, "
                        "proving the evaluator still detects regressions "
                        "(reference tests/harness_calibration/)")
    args = p.parse_args()

    from deepvision_tpu.web.server import create_app

    scan_dir = CALIBRATION_DIR if args.calibration else SCENARIO_DIR
    paths = sorted(glob.glob(os.path.join(scan_dir, "**", args.pattern),
                             recursive=True))
    if not paths:
        print("no scenarios found", file=sys.stderr)
        return 1
    total_fail = 0
    for path in paths:
        with open(path, encoding="utf-8") as fh:
            scenario = json.load(fh)
        with tempfile.TemporaryDirectory(
            ignore_cleanup_errors=True
        ) as tmp:
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
        rel = os.path.relpath(path, scan_dir)
        must_fail = scenario.get("expect_outcome") == "fail"
        if must_fail:
            # calibration semantics: a scenario that PASSES means the
            # evaluator lost its teeth for this regression class
            if failures:
                print(f"✅ {rel} correctly detected "
                      f"({len(failures)} findings)")
            else:
                total_fail += 1
                print(f"❌ {rel}: expected the evaluator to fail "
                      f"but it passed — detector regression")
            continue
        if failures:
            total_fail += 1
            print(f"❌ {rel}")
            for f in failures:
                print(f"   - {f}")
        else:
            print(f"✅ {rel} ({len(scenario.get('steps', []))} steps)")
    return 1 if total_fail else 0


if __name__ == "__main__":
    sys.exit(main())
