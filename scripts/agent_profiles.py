#!/usr/bin/env python
"""Task profiles for the agent harness (reference scripts/agent_profiles.py:1).

A task profile maps a CLASS of change (engine perf, serving API,
frontend, security, ops tooling) to its risk level, the docs to read
first, the suites that gate it, done-when criteria, and hard-failure
tripwires.  Profiles live as data under ``resources/harness/tasks/`` so
they are reviewable and the harness can consume them.

  python scripts/agent_profiles.py list
  python scripts/agent_profiles.py show engine-perf
  python scripts/agent_profiles.py run engine-perf     # execute its suites
  python scripts/agent_profiles.py validate            # schema + file refs
  python scripts/agent_profiles.py match deepvision_tpu/engine/runner.py
"""

from __future__ import annotations

import argparse
import fnmatch
import glob
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TASKS_DIR = os.path.join(ROOT, "resources", "harness", "tasks")

# path globs -> profile, for `match` (what profile governs this file?)
PATH_MAP = [
    ("deepvision_tpu/engine/*", "engine-perf"),
    ("deepvision_tpu/engine/kernels/*", "engine-perf"),
    ("bench.py", "engine-perf"),
    ("deepvision_tpu/web/routes/*", "serving-api"),
    ("deepvision_tpu/web/runtime/*", "serving-api"),
    ("deepvision_tpu/web/stores.py", "serving-api"),
    ("deepvision_tpu/web/static/*", "frontend"),
    ("deepvision_tpu/web/authn.py", "security"),
    ("deepvision_tpu/web/licensing.py", "security"),
    ("deepvision_tpu/web/levels.py", "security"),
    ("deepvision_tpu/web/ownership.py", "security"),
    ("scripts/import_*", "ops-migration"),
    ("scripts/rollback_*", "ops-migration"),
    ("scripts/admin_migrate_*", "ops-migration"),
    ("scripts/migrate_*", "ops-migration"),
]

REQUIRED_KEYS = ("name", "title", "risk", "description", "suites",
                 "done_when", "hard_failures")


def load_profiles() -> dict:
    out = {}
    for path in sorted(glob.glob(os.path.join(TASKS_DIR, "*.json"))):
        with open(path, encoding="utf-8") as fh:
            p = json.load(fh)
        p["_file"] = os.path.relpath(path, ROOT)
        out[p.get("name") or os.path.basename(path)] = p
    return out


def cmd_list(profiles):
    for name, p in profiles.items():
        print(f"{name:<14} risk={p.get('risk', '?'):<7} "
              f"suites={len(p.get('suites', []))}  {p.get('title', '')}")
    return 0


def cmd_show(profiles, name):
    p = profiles.get(name)
    if not p:
        print(f"unknown profile {name!r}; have: {sorted(profiles)}",
              file=sys.stderr)
        return 2
    print(f"# {p['title']}  (risk: {p['risk']})\n\n{p['description']}\n")
    if p.get("docs"):
        print("Read first: " + ", ".join(p["docs"]))
    print("\nGates:")
    for cmd in p["suites"]:
        print("  $ " + " ".join(cmd))
    print("\nDone when:")
    for item in p["done_when"]:
        print(f"  - {item}")
    print("\nHard failures:")
    for item in p["hard_failures"]:
        print(f"  ! {item}")
    return 0


def cmd_run(profiles, name):
    p = profiles.get(name)
    if not p:
        print(f"unknown profile {name!r}", file=sys.stderr)
        return 2
    for cmd in p["suites"]:
        exe = [sys.executable] + cmd[1:] if cmd[0] == "python" else cmd
        print(f"\n=== {name}: {' '.join(cmd)}")
        rc = subprocess.call(exe, cwd=ROOT)
        if rc != 0:
            print(f"PROFILE {name} FAIL at: {' '.join(cmd)}")
            return rc
    print(f"\nPROFILE {name} OK ({len(p['suites'])} gates)")
    return 0


def cmd_validate(profiles):
    bad = 0
    for name, p in profiles.items():
        for key in REQUIRED_KEYS:
            if not p.get(key):
                print(f"❌ {p['_file']}: missing {key}")
                bad += 1
        for doc in p.get("docs", []):
            if not os.path.exists(os.path.join(ROOT, doc)):
                print(f"❌ {p['_file']}: docs ref does not exist: {doc}")
                bad += 1
        for cmd in p.get("suites", []):
            # every referenced script/test path must exist
            for part in cmd:
                if ("/" in part and not part.startswith("-")
                        and not os.path.exists(os.path.join(ROOT, part))):
                    print(f"❌ {p['_file']}: suite path missing: {part}")
                    bad += 1
    mapped = {prof for _, prof in PATH_MAP}
    for prof in mapped - set(profiles):
        print(f"❌ PATH_MAP references unknown profile: {prof}")
        bad += 1
    print(f"{'VALID' if bad == 0 else 'INVALID'}: "
          f"{len(profiles)} profiles, {bad} problems")
    return 0 if bad == 0 else 1


def cmd_match(profiles, paths):
    hits = {}
    for path in paths:
        rel = os.path.relpath(os.path.join(ROOT, path), ROOT)
        for pattern, prof in PATH_MAP:
            if fnmatch.fnmatch(rel, pattern):
                hits.setdefault(prof, []).append(rel)
                break
    if not hits:
        print("no profile governs these paths (general change — run "
              "`agent_harness.py --profile local`)")
        return 0
    for prof, files in hits.items():
        print(f"{prof}: {', '.join(files)}")
        print(f"  -> python scripts/agent_profiles.py run {prof}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description="harness task profiles")
    sub = ap.add_subparsers(dest="cmd")
    sub.add_parser("list")
    sp = sub.add_parser("show")
    sp.add_argument("name")
    rp = sub.add_parser("run")
    rp.add_argument("name")
    sub.add_parser("validate")
    mp = sub.add_parser("match")
    mp.add_argument("paths", nargs="+")
    args = ap.parse_args()

    profiles = load_profiles()
    if args.cmd == "show":
        return cmd_show(profiles, args.name)
    if args.cmd == "run":
        return cmd_run(profiles, args.name)
    if args.cmd == "validate":
        return cmd_validate(profiles)
    if args.cmd == "match":
        return cmd_match(profiles, args.paths)
    return cmd_list(profiles)


if __name__ == "__main__":
    sys.exit(main())
