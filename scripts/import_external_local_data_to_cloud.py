#!/usr/bin/env python
"""Local -> cloud data import (reference
scripts/import_external_local_data_to_cloud.py, 1,752 LoC).

Copies another deployment's data dir into this instance's stores with the
reference's operational guarantees:

  * owner + instance-scope re-stamping on every record;
  * conflict policy per colliding id: --on-conflict skip|overwrite|suffix
    (suffix re-ids the incoming record and rewrites its report bindings);
  * session validation (structure, interview-log shape) with a reject
    list rather than a crash;
  * evidence-annotation backfill on imported sessions (legacy logs get
    quality_score/evidence_class derived);
  * session<->report binding restore (current_report_name pointers are
    remapped when reports are re-suffixed);
  * custom scenarios + summary cache import (optional);
  * rollback manifest under data/operations/ consumed by
    scripts/rollback_external_import.py.

  python scripts/import_external_local_data_to_cloud.py SRC_DIR \
      --owner 7 [--scope default] [--on-conflict skip] [--dry-run]
      [--limit N] [--include-scenarios] [--include-summaries]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.meta_index import MetaIndex, utc_now_iso  # noqa: E402
from deepvision_tpu.web.runtime.followup import (  # noqa: E402
    backfill_evidence_annotations,
)
from deepvision_tpu.web.stores import ReportStore, SessionStore  # noqa: E402


def load_sqlite_users(db_path: str) -> list:
    """users rows (user_id, phone, nickname) + wechat openid joins from a
    deployment's auth DB — both source and target sides share the
    schema (authn.py)."""
    import sqlite3

    conn = sqlite3.connect(db_path)
    conn.row_factory = sqlite3.Row
    users = [dict(r) for r in conn.execute(
        "SELECT user_id, phone, nickname FROM users")]
    openids = {}
    try:
        for r in conn.execute(
                "SELECT user_id, openid FROM wechat_identities"):
            openids.setdefault(r["user_id"], []).append(r["openid"])
    except sqlite3.OperationalError:
        pass
    conn.close()
    for u in users:
        u["openids"] = openids.get(u["user_id"], [])
    return users


def resolve_user_mapping(source_users: list, target_users: list,
                         user_map: dict, fallback_owner) -> dict:
    """source user_id -> {target, method} (reference
    resolve_source_user_mappings import_external...py:408): explicit
    JSON map wins, then phone match, then WeChat openid match, then the
    --owner fallback; otherwise unmapped (reported, refused on apply)."""
    by_phone = {u["phone"]: u for u in target_users if u.get("phone")}
    by_openid = {}
    for u in target_users:
        for oid in u.get("openids", []):
            by_openid[oid] = u
    mapping = {}
    for su in source_users:
        sid = str(su["user_id"])
        if sid in user_map:
            mapping[sid] = {"target": str(user_map[sid]),
                            "method": "user_map_json"}
            continue
        hit = by_phone.get(su.get("phone"))
        if hit is not None:
            mapping[sid] = {"target": str(hit["user_id"]),
                            "method": "phone_match"}
            continue
        hit = next((by_openid[o] for o in su.get("openids", [])
                    if o in by_openid), None)
        if hit is not None:
            mapping[sid] = {"target": str(hit["user_id"]),
                            "method": "wechat_match"}
            continue
        if fallback_owner is not None:
            mapping[sid] = {"target": str(fallback_owner),
                            "method": "fallback_owner"}
        else:
            mapping[sid] = {"target": None, "method": "unmapped"}
    return mapping


def validate_session(session: dict) -> list:
    problems = []
    if not isinstance(session, dict):
        return ["not an object"]
    if not session.get("topic"):
        problems.append("missing topic")
    log = session.get("interview_log")
    if log is not None and not isinstance(log, list):
        problems.append("interview_log not a list")
    for i, e in enumerate(log or []):
        if not isinstance(e, dict) or not e.get("question"):
            problems.append(f"interview_log[{i}] malformed")
            break
    return problems


def main():
    p = argparse.ArgumentParser(description="import external local data")
    p.add_argument("source_dir", help="source deployment data dir")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--owner", default=None,
                   help="owner_user_id to stamp on imported records "
                        "(fallback when --source-auth-db is given)")
    p.add_argument("--source-auth-db", default="",
                   help="source deployment's auth DB: enables multi-user "
                        "import with per-owner mapping (phone/WeChat "
                        "match against this instance's accounts)")
    p.add_argument("--user-map-json", default="",
                   help='explicit {"users": {"<src_id>": <target_id>}} '
                        "mapping overrides")
    p.add_argument("--scope", default="default")
    p.add_argument("--on-conflict", choices=("skip", "overwrite", "suffix"),
                   default="skip")
    p.add_argument("--limit", type=int, default=0,
                   help="max sessions to import (0 = all)")
    p.add_argument("--include-scenarios", action="store_true")
    p.add_argument("--include-summaries", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--output-json", default="",
                   help="write the import plan/result to a JSON file")
    args = p.parse_args()
    if args.owner is None and not args.source_auth_db:
        p.error("--owner is required without --source-auth-db")

    meta = MetaIndex(os.path.join(args.data_dir, "meta_index.sqlite3"))
    sessions = SessionStore(args.data_dir, meta)
    reports = ReportStore(args.data_dir, meta)

    # ---- user mapping plan (reference :408-495) -------------------------
    user_mapping: dict = {}
    if args.source_auth_db:
        if not os.path.isfile(args.source_auth_db):
            print(f"source auth db not found: {args.source_auth_db}")
            return 1
        source_users = load_sqlite_users(args.source_auth_db)
        target_db = os.path.join(args.data_dir, "auth", "auth.sqlite3")
        target_users = (load_sqlite_users(target_db)
                        if os.path.isfile(target_db) else [])
        user_map = {}
        if args.user_map_json:
            with open(args.user_map_json, encoding="utf-8") as fh:
                user_map = {str(k): v for k, v in
                            (json.load(fh).get("users") or {}).items()}
        user_mapping = resolve_user_mapping(
            source_users, target_users, user_map, args.owner)
        print("用户映射计划：")
        for sid, m in sorted(user_mapping.items(), key=lambda x: x[0]):
            print(f"  源用户 {sid} -> "
                  f"{m['target'] if m['target'] else '（未映射）'} "
                  f"[{m['method']}]")
        unmapped = [sid for sid, m in user_mapping.items()
                    if m["target"] is None]
        if unmapped and not args.dry_run:
            print(f"拒绝执行：{len(unmapped)} 个源用户无法映射 "
                  f"({', '.join(unmapped[:5])})。提供 --user-map-json "
                  f"或 --owner 兜底后重试。")
            return 1

    def owner_for(source_owner) -> str:
        if user_mapping:
            m = user_mapping.get(str(source_owner))
            if m and m["target"]:
                return m["target"]
        return str(args.owner)

    suffix = f"-imp{int(time.time()) % 100000}"
    manifest = {
        "sessions": [], "reports": [], "scenarios": [],
        "rejected": [], "conflicts": [],
        "created_at": utc_now_iso(),
        "source": os.path.abspath(args.source_dir),
        "owner": str(args.owner), "scope": args.scope,
        "on_conflict": args.on_conflict,
        "user_mapping": user_mapping,
    }
    report_renames: dict = {}

    # pre-scan source sessions: report -> source owner (reference
    # build_source_report_owner_map :523) so multi-user imports stamp
    # each report with its mapped owner, not a blanket --owner
    report_source_owner: dict = {}
    src_sessions_dir = os.path.join(args.source_dir, "sessions")
    if os.path.isdir(src_sessions_dir):
        for name in os.listdir(src_sessions_dir):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(src_sessions_dir, name),
                          encoding="utf-8") as fh:
                    s = json.load(fh)
            except (OSError, json.JSONDecodeError):
                continue
            for key in ("current_report_name", "last_report_name"):
                if s.get(key):
                    report_source_owner[s[key]] = s.get("owner_user_id")

    # ---- reports first (so session pointers can remap) -----------------
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
                manifest["rejected"].append({"report": name, "why": str(e)})
                continue
            target = name
            exists = reports.load(name) is not None
            if exists:
                manifest["conflicts"].append({"report": name})
                if args.on_conflict == "skip":
                    continue
                if args.on_conflict == "suffix":
                    target = name[:-3] + suffix + ".md"
                    report_renames[name] = target
            if args.dry_run:
                print(f"[dry-run] report {name}"
                      + (f" -> {target}" if target != name else ""))
            else:
                reports.save(
                    target, content,
                    owner_user_id=owner_for(
                        report_source_owner.get(name)),
                    instance_scope=args.scope)
            manifest["reports"].append(target)

    # ---- sessions -------------------------------------------------------
    src_sessions = os.path.join(args.source_dir, "sessions")
    n_imported = 0
    if os.path.isdir(src_sessions):
        for name in sorted(os.listdir(src_sessions)):
            if not name.endswith(".json"):
                continue
            if args.limit and n_imported >= args.limit:
                break
            path = os.path.join(src_sessions, name)
            try:
                with open(path, encoding="utf-8") as fh:
                    session = json.load(fh)
            except (OSError, json.JSONDecodeError) as e:
                manifest["rejected"].append({"session": name, "why": str(e)})
                continue
            problems = validate_session(session)
            if problems:
                manifest["rejected"].append(
                    {"session": name, "why": "; ".join(problems)})
                continue
            sid = session.get("session_id") or name[:-5]
            exists = sessions.load(sid) is not None
            if exists:
                manifest["conflicts"].append({"session": sid})
                if args.on_conflict == "skip":
                    continue
                if args.on_conflict == "suffix":
                    sid = sid + suffix
            session["session_id"] = sid
            session["owner_user_id"] = owner_for(
                session.get("owner_user_id"))
            session["instance_scope"] = args.scope
            # remap report bindings if the report was re-suffixed
            for key in ("current_report_name", "last_report_name"):
                if session.get(key) in report_renames:
                    session[key] = report_renames[session[key]]
            filled = backfill_evidence_annotations(session)
            if args.dry_run:
                print(f"[dry-run] session {sid} "
                      f"(backfilled {filled} entries)")
            else:
                sessions.save(session)
            manifest["sessions"].append(sid)
            n_imported += 1

    # ---- custom scenarios ------------------------------------------------
    if args.include_scenarios:
        src_meta = os.path.join(args.source_dir, "meta_index.sqlite3")
        src_dir = os.path.join(args.source_dir, "custom_scenarios")
        payloads = []
        if os.path.isdir(src_dir):
            for fn in sorted(os.listdir(src_dir)):
                if fn.endswith(".json"):
                    try:
                        with open(os.path.join(src_dir, fn),
                                  encoding="utf-8") as fh:
                            payloads.append(json.load(fh))
                    except (OSError, json.JSONDecodeError):
                        pass
        elif os.path.isfile(src_meta):
            src = MetaIndex(src_meta)
            for row in src.query("SELECT payload FROM custom_scenarios"):
                try:
                    payloads.append(json.loads(row["payload"]))
                except ValueError:
                    pass
        for sc in payloads:
            if not args.dry_run:
                meta.execute(
                    "INSERT INTO custom_scenarios (scenario_id, "
                    "owner_user_id, instance_scope, payload, created_at) "
                    "VALUES (?, ?, ?, ?, ?) ON CONFLICT(scenario_id) "
                    "DO NOTHING",
                    (sc.get("id"), str(args.owner), args.scope,
                     json.dumps(sc, ensure_ascii=False), utc_now_iso()),
                )
            manifest["scenarios"].append(sc.get("id"))

    # ---- summary cache ----------------------------------------------------
    if args.include_summaries:
        src_meta = os.path.join(args.source_dir, "meta_index.sqlite3")
        if os.path.isfile(src_meta):
            src = MetaIndex(src_meta)
            n = 0
            for row in src.query(
                "SELECT content_hash, summary, doc_name, created_at "
                "FROM summary_cache_store"
            ):
                if not args.dry_run:
                    meta.execute(
                        "INSERT INTO summary_cache_store (content_hash, "
                        "summary, doc_name, created_at) VALUES (?, ?, ?, ?) "
                        "ON CONFLICT(content_hash) DO NOTHING",
                        (row["content_hash"], row["summary"],
                         row["doc_name"], row["created_at"]),
                    )
                n += 1
            print(f"summary cache entries considered: {n}")

    # ---- manifest ---------------------------------------------------------
    # created_at is re-stamped HERE, after the last item was written:
    # rollback's modified-after-import guard compares each row's
    # updated_at (stamped per item DURING the import) against this value,
    # so a start-of-run stamp spuriously flags every import whose wall
    # clock crossed a second boundary mid-run.
    manifest["created_at"] = utc_now_iso()
    ops_dir = os.path.join(args.data_dir, "operations")
    os.makedirs(ops_dir, exist_ok=True)
    manifest_path = os.path.join(ops_dir, f"import-{int(time.time())}.json")
    if not args.dry_run:
        with open(manifest_path, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, ensure_ascii=False, indent=1)

    if args.output_json:
        with open(args.output_json, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, ensure_ascii=False, indent=1)

    mode = "[dry-run] " if args.dry_run else ""
    print(f"{mode}imported {len(manifest['sessions'])} sessions, "
          f"{len(manifest['reports'])} reports, "
          f"{len(manifest['scenarios'])} scenarios; "
          f"{len(manifest['conflicts'])} conflicts "
          f"({args.on_conflict}), {len(manifest['rejected'])} rejected"
          + ("" if args.dry_run else f"; manifest: {manifest_path}"))
    for rej in manifest["rejected"][:10]:
        print(f"  rejected: {rej}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
