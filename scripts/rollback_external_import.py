#!/usr/bin/env python
"""Rollback a local->cloud import using its manifest.

Safety model (reference import rollback companion, reference
scripts/*rollback*):
  * --dry-run shows exactly what would be removed;
  * records modified AFTER the import are refused unless --force
    (someone continued the interview / regenerated the report);
  * removed content is archived under data/operations/rollback-<ts>/
    before deletion, so a rollback is itself reversible;
  * the manifest is stamped rolled_back_at so double-rollback is a no-op.

  python scripts/rollback_external_import.py \
      data/operations/import-<ts>.json [--data-dir data] [--dry-run]
      [--force]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.meta_index import MetaIndex, utc_now_iso  # noqa: E402
from deepvision_tpu.web.stores import ReportStore, SessionStore  # noqa: E402


def main():
    p = argparse.ArgumentParser(description="rollback import")
    p.add_argument("manifest")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--force", action="store_true",
                   help="remove records even if modified after the import")
    args = p.parse_args()

    with open(args.manifest, encoding="utf-8") as fh:
        manifest = json.load(fh)
    if manifest.get("rolled_back_at"):
        print(f"manifest already rolled back at "
              f"{manifest['rolled_back_at']}; nothing to do")
        return 0
    imported_at = manifest.get("created_at", "")

    meta = MetaIndex(os.path.join(args.data_dir, "meta_index.sqlite3"))
    sessions = SessionStore(args.data_dir, meta)
    reports = ReportStore(args.data_dir, meta)

    backup_dir = os.path.join(
        args.data_dir, "operations", f"rollback-{int(time.time())}")

    removed = {"sessions": 0, "reports": 0}
    skipped = []

    def backup(kind: str, name: str, src_path: str):
        if args.dry_run or not os.path.isfile(src_path):
            return
        dst = os.path.join(backup_dir, kind)
        os.makedirs(dst, exist_ok=True)
        shutil.copy2(src_path, dst)

    for sid in manifest.get("sessions", []):
        row = meta.query_one(
            "SELECT updated_at FROM session_index WHERE session_id = ?",
            (sid,))
        if row is None:
            skipped.append((sid, "already gone"))
            continue
        if (not args.force and imported_at and row["updated_at"]
                and row["updated_at"] > imported_at):
            skipped.append((sid, f"modified after import "
                                 f"({row['updated_at']}); use --force"))
            continue
        if args.dry_run:
            print(f"[dry-run] would remove session {sid}")
        else:
            backup("sessions", sid, sessions.path(sid))
            sessions.delete(sid)
        removed["sessions"] += 1

    for name in manifest.get("reports", []):
        row = meta.query_one(
            "SELECT created_at FROM report_index WHERE report_name = ? "
            "AND deleted = 0", (name,))
        if row is None:
            skipped.append((name, "already gone"))
            continue
        if args.dry_run:
            print(f"[dry-run] would remove report {name}")
        else:
            backup("reports", name, reports.path(name))
            reports.delete(name)
        removed["reports"] += 1

    for item, reason in skipped:
        print(f"skip {item}: {reason}")
    mode = "[dry-run] " if args.dry_run else ""
    print(f"{mode}rolled back {removed['sessions']} sessions, "
          f"{removed['reports']} reports; {len(skipped)} skipped")
    refused = [s for s in skipped if "modified after import" in s[1]]
    if not args.dry_run:
        if os.path.isdir(backup_dir):
            print(f"removed content archived under {backup_dir}")
        if not refused:
            # only a complete rollback is final; refused records keep the
            # manifest live so --force can finish the job later
            manifest["rolled_back_at"] = utc_now_iso()
            with open(args.manifest, "w", encoding="utf-8") as fh:
                json.dump(manifest, fh, ensure_ascii=False, indent=1)
    return 1 if refused else 0


if __name__ == "__main__":
    sys.exit(main())
