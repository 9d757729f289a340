#!/usr/bin/env python
"""Manual object-storage history sync (reference
scripts/sync_object_storage_history.py, object_storage_history.py:11).

Backfills stored artifacts to the configured S3-compatible bucket (or the
local-FS backend when no endpoint is configured):

  * export assets (export_asset_store) -> exports/<report>/<asset>/<file>
  * report markdown snapshots          -> reports/<name>
  * ops artifacts (operations/ dir)    -> operations/<file>

Flags: --dry-run lists what would upload; --kinds narrows the set;
--verify re-reads each uploaded object and compares bytes; --missing-only
skips keys that already exist in the bucket.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KINDS = ("exports", "reports", "operations")


def main():
    p = argparse.ArgumentParser(description="object storage sync")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--kinds", default="exports",
                   help=f"comma list of {KINDS}")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--verify", action="store_true",
                   help="read back each object and compare bytes")
    p.add_argument("--missing-only", action="store_true",
                   help="skip keys already present in the bucket")
    args = p.parse_args()
    kinds = [k.strip() for k in args.kinds.split(",") if k.strip()]
    for k in kinds:
        if k not in KINDS:
            print(f"unknown kind {k!r}; choose from {KINDS}")
            return 2

    from deepvision_tpu.web.object_storage import ObjectStorageHistoryService
    from deepvision_tpu.web.server import AppState

    state = AppState(data_dir=args.data_dir, overrides={"AI_MODE": "off",
                                                        "ENABLE_AI": False})
    svc = ObjectStorageHistoryService(state)
    existing = set()
    if args.missing_only:
        try:
            existing = set(svc.backend.list_keys(""))
        except Exception as e:  # noqa: BLE001
            print(f"list_keys failed ({e}); syncing everything")

    synced = skipped = failed = 0

    def put(key: str, data: bytes):
        nonlocal synced, skipped, failed
        if args.missing_only and key in existing:
            skipped += 1
            return
        if args.dry_run:
            print(f"[dry-run] {key} ({len(data):,} bytes)")
            synced += 1
            return
        try:
            svc.backend.put_object(key, data)
            if args.verify:
                back = svc.backend.get_object(key)
                if back != data:
                    raise RuntimeError("verify mismatch")
            synced += 1
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"FAILED {key}: {e}", file=sys.stderr)

    if "exports" in kinds:
        rows = state.meta.query(
            "SELECT asset_id, report_name, filename, content "
            "FROM export_asset_store")
        for row in rows:
            data = (row["content"] if isinstance(row["content"], bytes)
                    else (row["content"] or "").encode())
            put(f"exports/{row['report_name']}/{row['asset_id']}/"
                f"{row['filename']}", data)

    if "reports" in kinds:
        rows = state.meta.query(
            "SELECT report_name FROM report_index WHERE deleted = 0")
        for row in rows:
            content = state.reports.load(row["report_name"])
            if content is not None:
                put(f"reports/{row['report_name']}", content.encode())

    if "operations" in kinds:
        ops_dir = os.path.join(args.data_dir, "operations")
        if os.path.isdir(ops_dir):
            for root, _, files in os.walk(ops_dir):
                for fn in files:
                    path = os.path.join(root, fn)
                    rel = os.path.relpath(path, ops_dir)
                    with open(path, "rb") as fh:
                        put(f"operations/{rel}", fh.read())

    mode = "[dry-run] " if args.dry_run else ""
    print(f"{mode}synced={synced} skipped={skipped} failed={failed} "
          f"(kinds={','.join(kinds)}, backend="
          f"{type(svc.backend).__name__})")
    state.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
