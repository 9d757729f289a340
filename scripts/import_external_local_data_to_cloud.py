#!/usr/bin/env python
"""Local -> cloud data import (reference
scripts/import_external_local_data_to_cloud.py): copy another deployment's
session files + reports into this instance's stores, re-stamping owner and
instance scope, with a rollback manifest."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.meta_index import MetaIndex, utc_now_iso  # noqa: E402
from deepvision_tpu.web.stores import ReportStore, SessionStore  # noqa: E402


def main():
    p = argparse.ArgumentParser(description="import external local data")
    p.add_argument("source_dir", help="source deployment data dir")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--owner", required=True,
                   help="owner_user_id to stamp on imported records")
    p.add_argument("--scope", default="default")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    meta = MetaIndex(os.path.join(args.data_dir, "meta_index.sqlite3"))
    sessions = SessionStore(args.data_dir, meta)
    reports = ReportStore(args.data_dir, meta)

    manifest = {"sessions": [], "reports": [], "created_at": utc_now_iso(),
                "source": os.path.abspath(args.source_dir)}

    src_sessions = os.path.join(args.source_dir, "sessions")
    if os.path.isdir(src_sessions):
        for name in sorted(os.listdir(src_sessions)):
            if not name.endswith(".json"):
                continue
            path = os.path.join(src_sessions, name)
            try:
                with open(path, encoding="utf-8") as fh:
                    session = json.load(fh)
            except (OSError, json.JSONDecodeError) as e:
                print(f"skip {name}: {e}", file=sys.stderr)
                continue
            sid = session.get("session_id") or name[:-5]
            session["session_id"] = sid
            session["owner_user_id"] = str(args.owner)
            session["instance_scope"] = args.scope
            if args.dry_run:
                print(f"[dry-run] session {sid}")
            else:
                sessions.save(session)
            manifest["sessions"].append(sid)

    src_reports = os.path.join(args.source_dir, "reports")
    if os.path.isdir(src_reports):
        for name in sorted(os.listdir(src_reports)):
            if not name.endswith(".md"):
                continue
            try:
                with open(os.path.join(src_reports, name),
                          encoding="utf-8") as fh:
                    content = fh.read()
            except OSError as e:
                print(f"skip {name}: {e}", file=sys.stderr)
                continue
            if args.dry_run:
                print(f"[dry-run] report {name}")
            else:
                reports.save(
                    name, content, owner_user_id=str(args.owner),
                    instance_scope=args.scope,
                )
            manifest["reports"].append(name)

    ops_dir = os.path.join(args.data_dir, "operations")
    os.makedirs(ops_dir, exist_ok=True)
    manifest_path = os.path.join(
        ops_dir, f"import-{int(time.time())}.json")
    if not args.dry_run:
        with open(manifest_path, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, ensure_ascii=False, indent=1)
    print(f"imported {len(manifest['sessions'])} sessions, "
          f"{len(manifest['reports'])} reports"
          + ("" if args.dry_run else f"; manifest: {manifest_path}"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
