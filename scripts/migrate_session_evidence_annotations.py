#!/usr/bin/env python
"""Evidence-annotation migration for historical sessions (reference
scripts/migrate_session_evidence_annotations.py:1).

The full operator workflow over the deterministic backfill
(runtime/followup.backfill_evidence_annotations): DRY-RUN by default
with a per-session field diff, --apply writes with a per-file backup
and a migration manifest, and `restore` undoes a migration from its
manifest. The thin scripts/backfill_evidence_annotations.py remains as
the quick path; this tool is for audited fleet-wide migrations.

Usage:
  python scripts/migrate_session_evidence_annotations.py migrate --all
  python scripts/migrate_session_evidence_annotations.py migrate \
      --session dv-... --apply --backup-dir evmig-001
  python scripts/migrate_session_evidence_annotations.py restore \
      --manifest data/operations/evmig-001/manifest.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANNOTATION_FIELDS = ("evidence_class", "quality_score", "answer_mode",
                     "evidence_intent")


def _stores(data_dir: str):
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    meta_path = os.path.join(data_dir, "meta_index.sqlite3")
    if not os.path.isfile(meta_path):
        raise SystemExit(f"no meta index at {meta_path}")
    meta = MetaIndex(meta_path)
    return meta, SessionStore(data_dir, meta)


def _diff_session(session: dict) -> dict:
    """What the backfill WOULD change: per-field fill counts and the
    evidence-class distribution before/after (computed on a copy)."""
    import copy

    from deepvision_tpu.web.runtime.followup import (
        backfill_evidence_annotations,
    )

    log = session.get("interview_log") or []
    before_missing = Counter()
    for entry in log:
        for field in ANNOTATION_FIELDS:
            if entry.get(field) in (None, ""):
                before_missing[field] += 1
    before_classes = Counter(
        e.get("evidence_class") or "(missing)" for e in log)

    preview = copy.deepcopy(session)
    changed = backfill_evidence_annotations(preview)
    after_classes = Counter(
        e.get("evidence_class") or "(missing)"
        for e in preview.get("interview_log") or [])
    return {
        "entries": len(log),
        "entries_changed": changed,
        "missing_by_field": dict(before_missing),
        "classes_before": dict(before_classes),
        "classes_after": dict(after_classes),
        "migrated_session": preview,
    }


def cmd_migrate(args) -> int:
    meta, store = _stores(args.data_dir)
    if args.all:
        rows = meta.query("SELECT session_id FROM session_index")
        session_ids = [r["session_id"] for r in rows]
    else:
        session_ids = args.session or []
        if not session_ids:
            raise SystemExit("需要 --session 或 --all")

    backup_name = args.backup_dir or f"evmig-{int(time.time())}"
    backup_root = os.path.join(args.data_dir, "operations", backup_name)
    manifest = {"backup_dir": backup_root, "applied": args.apply,
                "sessions": [], "created_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}

    total_changed = 0
    for sid in session_ids:
        session = store.load(sid)
        if session is None:
            print(f"会话不存在: {sid}")
            return 1
        diff = _diff_session(session)
        if not diff["entries_changed"]:
            continue
        total_changed += diff["entries_changed"]
        print(f"{sid}: {diff['entries_changed']}/{diff['entries']} "
              f"条问答需要补标注")
        for field, n in sorted(diff["missing_by_field"].items()):
            if n:
                print(f"  - 缺 {field}: {n} 条")
        print(f"  证据等级分布: {diff['classes_before']} -> "
              f"{diff['classes_after']}")
        manifest["sessions"].append({
            "session_id": sid,
            "entries_changed": diff["entries_changed"],
            "missing_by_field": diff["missing_by_field"],
        })
        if args.apply:
            os.makedirs(backup_root, exist_ok=True)
            src = store.path(sid)
            shutil.copyfile(src, os.path.join(backup_root,
                                              f"{sid}.json"))
            store.save(diff["migrated_session"])

    if not manifest["sessions"]:
        print("没有需要迁移的会话。")
        return 0
    if args.apply:
        os.makedirs(backup_root, exist_ok=True)
        with open(os.path.join(backup_root, "manifest.json"), "w",
                  encoding="utf-8") as fh:
            json.dump(manifest, fh, ensure_ascii=False, indent=2)
        print(f"\n已迁移 {len(manifest['sessions'])} 个会话"
              f"（{total_changed} 条问答）。备份: {backup_root}")
        print(f"回滚命令：python scripts/"
              f"migrate_session_evidence_annotations.py restore "
              f"--manifest {os.path.join(backup_root, 'manifest.json')} "
              f"--data-dir {args.data_dir}")
    else:
        print(f"\nDRY-RUN：{len(manifest['sessions'])} 个会话、"
              f"{total_changed} 条问答将被补标注。确认后追加 --apply。")
    if args.summary_json:
        with open(args.summary_json, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, ensure_ascii=False, indent=2)
    return 0


def cmd_restore(args) -> int:
    _, store = _stores(args.data_dir)
    with open(args.manifest, encoding="utf-8") as fh:
        manifest = json.load(fh)
    backup_root = os.path.dirname(os.path.abspath(args.manifest))
    restored = 0
    for entry in manifest.get("sessions", []):
        sid = entry["session_id"]
        src = os.path.join(backup_root, f"{sid}.json")
        if not os.path.isfile(src):
            print(f"备份缺失: {src}")
            return 1
        with open(src, encoding="utf-8") as fh:
            session = json.load(fh)
        store.save(session)
        restored += 1
    print(f"已从备份恢复 {restored} 个会话。")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="历史会话证据标注迁移（默认 dry-run，--apply 落盘）")
    ap.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("migrate", help="补齐缺失的证据标注")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--session", action="append")
    g.add_argument("--all", action="store_true")
    p.add_argument("--apply", action="store_true",
                   help="确认落盘；默认 dry-run")
    p.add_argument("--backup-dir", default="",
                   help="备份目录名（默认自动生成）")
    p.add_argument("--summary-json", default="")
    p.set_defaults(fn=cmd_migrate)

    p = sub.add_parser("restore", help="根据迁移 manifest 恢复备份")
    p.add_argument("--manifest", required=True)
    p.set_defaults(fn=cmd_restore)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
