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


VALID_KINDS = ("feature", "fix", "perf", "docs", "breaking")


def _load_fragments():
    fragments = []
    if os.path.isdir(FRAGMENTS_DIR):
        for name in sorted(os.listdir(FRAGMENTS_DIR)):
            if name.endswith(".json"):
                path = os.path.join(FRAGMENTS_DIR, name)
                try:
                    with open(path, encoding="utf-8") as fh:
                        fragments.append((name, json.load(fh)))
                except (OSError, json.JSONDecodeError) as e:
                    fragments.append((name, {"_error": str(e)}))
    return fragments


def cmd_validate(args):
    """Fragment schema + version.json consistency gate (the reference
    runs this in CI before release aggregation)."""
    problems = []
    for name, frag in _load_fragments():
        if "_error" in frag:
            problems.append(f"{name}: unreadable ({frag['_error']})")
            continue
        if frag.get("kind") not in VALID_KINDS:
            problems.append(f"{name}: kind {frag.get('kind')!r} "
                            f"not in {VALID_KINDS}")
        if not (frag.get("summary") or "").strip():
            problems.append(f"{name}: empty summary")
        elif len(frag["summary"]) > 200:
            problems.append(f"{name}: summary over 200 chars")
    if os.path.isfile(VERSION_JSON):
        with open(VERSION_JSON, encoding="utf-8") as fh:
            data = json.load(fh)
        releases = data.get("releases", [])
        versions = [r.get("version") for r in releases]
        if data.get("version") and versions and \
                data["version"] != versions[0]:
            problems.append(
                f"version.json top-level version {data['version']} != "
                f"latest release {versions[0]}")
        if len(versions) != len(set(versions)):
            problems.append("duplicate release versions in version.json")
    for prob in problems:
        print(f"❌ {prob}")
    if not problems:
        print(f"✅ {len(_load_fragments())} fragments valid; "
              "version.json consistent")
    return 1 if problems else 0


def cmd_next(args):
    """Infer the next semver from unreleased fragment kinds
    (breaking -> major, feature/perf -> minor, fix/docs -> patch)."""
    kinds = {frag.get("kind") for _, frag in _load_fragments()
             if "_error" not in frag}
    current = "0.0.0"
    if os.path.isfile(VERSION_JSON):
        with open(VERSION_JSON, encoding="utf-8") as fh:
            current = json.load(fh).get("version", "0.0.0")
    try:
        major, minor, patch = (int(x) for x in current.split("."))
    except ValueError:
        major, minor, patch = 0, 0, 0
    if "breaking" in kinds:
        major, minor, patch = major + 1, 0, 0
    elif kinds & {"feature", "perf"}:
        minor, patch = minor + 1, 0
    elif kinds:
        patch += 1
    print(f"{major}.{minor}.{patch}")
    return 0


_KIND_LABELS = {"breaking": "⚠️ 不兼容变更", "feature": "✨ 新特性",
                "perf": "⚡ 性能", "fix": "🐛 修复", "docs": "📝 文档"}


def cmd_notes(args):
    """Render release notes markdown (latest release, or unreleased
    fragments with --unreleased)."""
    if args.unreleased:
        frags = [f for _, f in _load_fragments() if "_error" not in f]
        title = "Unreleased"
    else:
        if not os.path.isfile(VERSION_JSON):
            print("no version.json yet", file=sys.stderr)
            return 1
        with open(VERSION_JSON, encoding="utf-8") as fh:
            data = json.load(fh)
        releases = data.get("releases", [])
        if not releases:
            print("no releases", file=sys.stderr)
            return 1
        rel = releases[0]
        frags = rel.get("changes", [])
        title = f"{rel.get('version')} ({rel.get('date')})"
    print(f"## {title}\n")
    by_kind = {}
    for f in frags:
        by_kind.setdefault(f.get("kind", "other"), []).append(f)
    for kind in ("breaking", "feature", "perf", "fix", "docs"):
        if kind in by_kind:
            print(f"### {_KIND_LABELS.get(kind, kind)}\n")
            for f in by_kind[kind]:
                print(f"- {f.get('summary', '')}")
            print()
    return 0


def main():
    p = argparse.ArgumentParser(description="version manager")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("add")
    sp.add_argument("kind", choices=list(VALID_KINDS))
    sp.add_argument("summary")
    sp.set_defaults(fn=cmd_add)
    sp = sub.add_parser("release")
    sp.add_argument("version")
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_release)
    sp = sub.add_parser("show")
    sp.set_defaults(fn=cmd_show)
    sp = sub.add_parser("validate")
    sp.set_defaults(fn=cmd_validate)
    sp = sub.add_parser("next")
    sp.set_defaults(fn=cmd_next)
    sp = sub.add_parser("notes")
    sp.add_argument("--unreleased", action="store_true")
    sp.set_defaults(fn=cmd_notes)
    args = p.parse_args()
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
