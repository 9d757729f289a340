#!/usr/bin/env python
"""Version manager (reference scripts/version_manager.py): changelog
fragments in changes/unreleased/*.json aggregated into a release entry in
web-compatible version.json."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRAGMENTS_DIR = os.path.join(ROOT, "changes", "unreleased")
VERSION_JSON = os.path.join(ROOT, "version.json")


def cmd_add(args):
    os.makedirs(FRAGMENTS_DIR, exist_ok=True)
    name = f"{int(time.time())}-{args.kind}.json"
    fragment = {
        "kind": args.kind,
        "summary": args.summary,
        "created_at": time.strftime("%Y-%m-%d"),
    }
    path = os.path.join(FRAGMENTS_DIR, name)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(fragment, fh, ensure_ascii=False, indent=1)
    print(path)


def cmd_release(args):
    fragments = []
    if os.path.isdir(FRAGMENTS_DIR):
        for name in sorted(os.listdir(FRAGMENTS_DIR)):
            if name.endswith(".json"):
                with open(os.path.join(FRAGMENTS_DIR, name),
                          encoding="utf-8") as fh:
                    fragments.append(json.load(fh))
    if not fragments and not args.force:
        print("no unreleased fragments", file=sys.stderr)
        return 1
    data = {"version": "0.0.0", "releases": []}
    if os.path.isfile(VERSION_JSON):
        with open(VERSION_JSON, encoding="utf-8") as fh:
            data = json.load(fh)
    data["version"] = args.version
    data["releaseDate"] = time.strftime("%Y-%m-%d")
    data.setdefault("releases", []).insert(0, {
        "version": args.version,
        "date": time.strftime("%Y-%m-%d"),
        "changes": fragments,
    })
    with open(VERSION_JSON, "w", encoding="utf-8") as fh:
        json.dump(data, fh, ensure_ascii=False, indent=1)
    for name in os.listdir(FRAGMENTS_DIR) if os.path.isdir(
            FRAGMENTS_DIR) else []:
        if name.endswith(".json"):
            os.remove(os.path.join(FRAGMENTS_DIR, name))
    print(f"released {args.version} with {len(fragments)} changes")


def cmd_show(args):
    if not os.path.isfile(VERSION_JSON):
        print("no version.json yet")
        return 0
    with open(VERSION_JSON, encoding="utf-8") as fh:
        print(json.dumps(json.load(fh), ensure_ascii=False, indent=1))


def main():
    p = argparse.ArgumentParser(description="version manager")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("add")
    sp.add_argument("kind", choices=["feature", "fix", "perf", "docs"])
    sp.add_argument("summary")
    sp.set_defaults(fn=cmd_add)
    sp = sub.add_parser("release")
    sp.add_argument("version")
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_release)
    sp = sub.add_parser("show")
    sp.set_defaults(fn=cmd_show)
    args = p.parse_args()
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
