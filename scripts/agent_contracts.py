#!/usr/bin/env python
"""Route / data-contract drift gate (reference scripts/agent_contracts.py:1
— sprint contracts with done_when/hard_failures; here the contract set is
the live product surface itself).

Two contract classes, both diffed against committed fixtures under
``resources/harness/contracts/``:

* **routes.json** — the app's LIVE route inventory (rule + methods),
  enumerated from the registered route table of a booted template-mode
  app.  A route added, removed, or re-versed without updating the
  fixture fails the gate: routes cannot silently ship (or vanish).
* **data_contracts.json** — the byte-compat payload keys the frontend
  and exports depend on: the A.2 question result, the A.3 report-draft
  schema, and the A.5 solution payload's top-level keys, each extracted
  from the RUNNING code (not hand-listed), so the fixture pins behavior.

Usage:
  python scripts/agent_contracts.py            # gate (exit 1 on drift)
  python scripts/agent_contracts.py --update   # intentional change: rewrite
  python scripts/agent_contracts.py --json     # machine-readable report
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CONTRACTS_DIR = os.path.join(ROOT, "resources", "harness", "contracts")


def collect_routes() -> list:
    os.environ.setdefault("AI_MODE", "template")
    os.environ.setdefault("DEEPVISION_TPU_TESTING", "1")
    os.environ.setdefault("SMS_PROVIDER", "mock")
    os.environ.setdefault("SMS_TEST_CODE", "666666")
    tmp = tempfile.mkdtemp(prefix="dv-contracts-")
    os.environ["DEEPVISION_DATA_DIR"] = tmp

    from deepvision_tpu.web.server import create_app

    app = create_app(data_dir=tmp)
    out = []
    for _regex, methods, _fn, rule in app._routes:
        out.append({"rule": rule, "methods": sorted(methods)})
    out.sort(key=lambda r: (r["rule"], r["methods"]))
    return out


def collect_data_contracts() -> dict:
    """Extract the contract keys from running code, not from a list."""
    from deepvision_tpu.web.runtime import report_v3, solution
    from deepvision_tpu.web.runtime.interview import (
        normalize_generated_question_result,
    )

    # A.2 question result: whatever normalization GUARANTEES on any parse
    a2 = sorted(normalize_generated_question_result(
        {"question": "示例问题？"}).keys())

    # A.5 solution payload: derived from a minimal real derivation
    payload = solution.build_solution_payload(
        "r.md", "# 标题\n\n## 概述\n内容。\n", session={"topic": "t"})
    a5 = sorted(payload.keys())

    return {
        "question_a2_keys": a2,
        "report_draft_required": list(report_v3.DRAFT_REQUIRED_KEYS),
        "report_draft_all": list(report_v3.DRAFT_ALL_KEYS),
        "report_analysis_keys": list(report_v3.ANALYSIS_KEYS),
        "solution_a5_top_level": a5,
    }


def _load(name):
    path = os.path.join(CONTRACTS_DIR, name)
    if not os.path.isfile(path):
        return None
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def _save(name, data):
    os.makedirs(CONTRACTS_DIR, exist_ok=True)
    with open(os.path.join(CONTRACTS_DIR, name), "w",
              encoding="utf-8") as fh:
        json.dump(data, fh, ensure_ascii=False, indent=1, sort_keys=True)
        fh.write("\n")


def diff_routes(expected, actual) -> dict:
    exp = {(r["rule"], tuple(r["methods"])) for r in expected}
    act = {(r["rule"], tuple(r["methods"])) for r in actual}
    return {
        "missing": sorted(f"{m} {rule}" for rule, ms in exp - act
                          for m in ms),
        "unexpected": sorted(f"{m} {rule}" for rule, ms in act - exp
                             for m in ms),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description="contract drift gate")
    ap.add_argument("--update", action="store_true",
                    help="rewrite fixtures from the live app (reviewed "
                         "intentional change)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    routes = collect_routes()
    data = collect_data_contracts()

    if args.update:
        _save("routes.json", routes)
        _save("data_contracts.json", data)
        print(f"contracts updated: {len(routes)} routes, "
              f"{len(data)} data-contract classes -> {CONTRACTS_DIR}")
        return 0

    exp_routes = _load("routes.json")
    exp_data = _load("data_contracts.json")
    if exp_routes is None or exp_data is None:
        print("no committed contracts yet — run with --update first",
              file=sys.stderr)
        return 2

    rdiff = diff_routes(exp_routes, routes)
    ddiff = {}
    for key in sorted(set(exp_data) | set(data)):
        if exp_data.get(key) != data.get(key):
            ddiff[key] = {"expected": exp_data.get(key),
                          "actual": data.get(key)}

    ok = not (rdiff["missing"] or rdiff["unexpected"] or ddiff)
    report = {"ok": ok, "n_routes": len(routes),
              "route_drift": rdiff, "data_contract_drift": ddiff}
    if args.json:
        print(json.dumps(report, ensure_ascii=False, indent=1))
    else:
        if ok:
            print(f"CONTRACTS OK: {len(routes)} routes, "
                  f"{len(data)} data-contract classes match fixtures")
        else:
            for line in rdiff["missing"]:
                print(f"ROUTE MISSING (in fixture, not served): {line}")
            for line in rdiff["unexpected"]:
                print(f"ROUTE UNEXPECTED (served, not in fixture): {line}")
            for key, d in ddiff.items():
                print(f"DATA CONTRACT DRIFT {key}:")
                print(f"  expected: {d['expected']}")
                print(f"  actual:   {d['actual']}")
            print("-> review; if intentional, commit "
                  "`agent_contracts.py --update` output")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
