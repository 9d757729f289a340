#!/usr/bin/env python
"""Artifact store helper (reference scripts/agent_artifacts.py): list,
inspect, and prune the run artifacts the harness tools write under
``artifacts/`` (harness-runs, test-runs, smoke, doc-gardening).

  python scripts/agent_artifacts.py list                 # inventory
  python scripts/agent_artifacts.py show test-runs       # latest payload
  python scripts/agent_artifacts.py prune --keep 10      # retention
  python scripts/agent_artifacts.py prune --keep 5 --dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "artifacts")

KINDS = {
    "harness-runs": "harness-*.json",
    "test-runs": None,            # one DIRECTORY per run
    "smoke": "smoke-*.json",
    "doc-gardening": "doc-gardening-*.json",
}


def _runs(kind):
    """(sort_key, path) per recorded run, oldest first."""
    base = os.path.join(ART, kind)
    if not os.path.isdir(base):
        return []
    out = []
    for name in os.listdir(base):
        if name == "latest.json":
            continue
        path = os.path.join(base, name)
        if KINDS[kind] is None and not os.path.isdir(path):
            continue
        out.append((name, path))
    return sorted(out)


def _size(path):
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for dirpath, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f))
                     for f in files)
    return total


def cmd_list():
    any_rows = False
    for kind in KINDS:
        runs = _runs(kind)
        if not runs:
            continue
        any_rows = True
        total = sum(_size(p) for _, p in runs)
        print(f"{kind}: {len(runs)} runs, {total / 1e6:.1f} MB "
              f"(latest {runs[-1][0]})")
    if not any_rows:
        print("no artifacts recorded (run the harness/test runner first)")
    return 0


def cmd_show(kind):
    if kind not in KINDS:
        print(f"unknown kind {kind!r}; known: {', '.join(KINDS)}")
        return 1
    runs = _runs(kind)
    if not runs:
        print(f"{kind}: no runs")
        return 1
    name, path = runs[-1]
    payload_path = (os.path.join(path, "summary.json")
                    if os.path.isdir(path) else path)
    with open(payload_path, encoding="utf-8") as fh:
        print(json.dumps(json.load(fh), ensure_ascii=False, indent=1))
    return 0


def cmd_prune(keep, dry_run):
    removed = 0
    for kind in KINDS:
        runs = _runs(kind)
        for name, path in runs[:-keep] if keep else runs:
            print(f"{'would remove' if dry_run else 'removing'} "
                  f"{kind}/{name} ({_size(path) / 1e3:.0f} KB)")
            if not dry_run:
                if os.path.isdir(path):
                    shutil.rmtree(path)
                else:
                    os.remove(path)
            removed += 1
    print(f"{'would prune' if dry_run else 'pruned'} {removed} runs "
          f"(keeping newest {keep} per kind)")
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description="artifact store helper")
    sub = p.add_subparsers(dest="cmd")
    sub.add_parser("list")
    sp = sub.add_parser("show")
    sp.add_argument("kind")
    pp = sub.add_parser("prune")
    pp.add_argument("--keep", type=int, default=10)
    pp.add_argument("--dry-run", action="store_true")
    args = p.parse_args()
    if args.cmd == "show":
        return cmd_show(args.kind)
    if args.cmd == "prune":
        return cmd_prune(args.keep, args.dry_run)
    return cmd_list()


if __name__ == "__main__":
    sys.exit(main())
