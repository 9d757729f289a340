#!/usr/bin/env python
"""Instance-scope / ownership isolation audit (reference
scripts/audit_identity_isolation.py, 270 LoC): find sessions, reports,
share tokens, and session<->report bindings whose scope or ownership
stamps are missing, inconsistent, or crossing tenant boundaries.

Audit groups:
  sessions   missing owner, scope mismatch, file<->index owner drift
  reports    missing owner, owner-map mismatch, scope mismatch
  bindings   report bound to a session with a DIFFERENT owner or scope,
             bindings to sessions that no longer exist
  shares     share tokens pointing at deleted or missing reports

--apply stamps a missing instance_scope with --expected-scope (the only
auto-fixable class; ownership is never guessed — reference ownership
migration requires an explicit admin flow).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.meta_index import MetaIndex  # noqa: E402
from deepvision_tpu.web.stores import SessionStore  # noqa: E402


def audit_sessions(meta, store, expected_scope, problems, fixes):
    rows = meta.query("SELECT * FROM session_index")
    for row in rows:
        sid = row["session_id"]
        if not row["owner_user_id"]:
            problems.append(
                {"kind": "session_missing_owner", "id": sid})
        if not row["instance_scope"]:
            problems.append(
                {"kind": "session_missing_scope", "id": sid})
            fixes.append(("session", sid))
        elif row["instance_scope"] != expected_scope:
            problems.append({
                "kind": "session_scope_mismatch", "id": sid,
                "scope": row["instance_scope"],
            })
        session = store.load(sid)
        if session and session.get("owner_user_id") != row["owner_user_id"]:
            problems.append({
                "kind": "session_owner_drift", "id": sid,
                "file_owner": session.get("owner_user_id"),
                "index_owner": row["owner_user_id"],
            })
    return len(rows)


def audit_reports(meta, expected_scope, problems, fixes):
    rrows = meta.query("SELECT * FROM report_index WHERE deleted = 0")
    owners = {
        r["report_name"]: r["owner_user_id"]
        for r in meta.query("SELECT * FROM report_meta_owners")
    }
    for row in rrows:
        name = row["report_name"]
        if not row["owner_user_id"]:
            problems.append({"kind": "report_missing_owner", "id": name})
        if name in owners and owners[name] != row["owner_user_id"]:
            problems.append({
                "kind": "report_owner_map_mismatch", "id": name,
                "map_owner": owners[name],
                "index_owner": row["owner_user_id"],
            })
        if not row["instance_scope"]:
            problems.append({"kind": "report_missing_scope", "id": name})
            fixes.append(("report", name))
        elif row["instance_scope"] != expected_scope:
            problems.append({
                "kind": "report_scope_mismatch", "id": name,
                "scope": row["instance_scope"],
            })
    return rrows


def audit_bindings(meta, rrows, problems):
    """A report bound to a session must share its owner and scope —
    cross-owner bindings are how one tenant's evidence leaks into
    another's report."""
    sess_by_id = {
        r["session_id"]: r
        for r in meta.query(
            "SELECT session_id, owner_user_id, instance_scope "
            "FROM session_index")
    }
    for row in rrows:
        sid = row["session_id"]
        if not sid:
            continue
        sess = sess_by_id.get(sid)
        if sess is None:
            problems.append({
                "kind": "binding_to_missing_session",
                "id": row["report_name"], "session_id": sid,
            })
            continue
        if (row["owner_user_id"] and sess["owner_user_id"]
                and row["owner_user_id"] != sess["owner_user_id"]):
            problems.append({
                "kind": "binding_cross_owner", "id": row["report_name"],
                "report_owner": row["owner_user_id"],
                "session_owner": sess["owner_user_id"],
            })
        if (row["instance_scope"] and sess["instance_scope"]
                and row["instance_scope"] != sess["instance_scope"]):
            problems.append({
                "kind": "binding_cross_scope", "id": row["report_name"],
            })


def audit_shares(meta, problems):
    live = {r["report_name"] for r in meta.query(
        "SELECT report_name FROM report_index WHERE deleted = 0")}
    deleted = {r["report_name"] for r in meta.query(
        "SELECT report_name FROM report_index WHERE deleted = 1")}
    try:
        shares = meta.query("SELECT * FROM report_meta_shares")
    except Exception:
        return
    for row in shares:
        name = row["report_name"]
        if name in deleted:
            problems.append({
                "kind": "share_to_deleted_report", "id": name,
                "token": (row["share_token"] or "")[:8] + "…",
            })
        elif name not in live:
            problems.append({
                "kind": "share_to_missing_report", "id": name,
            })


def apply_fixes(meta, fixes, expected_scope):
    applied = 0
    for kind, ident in fixes:
        table = "session_index" if kind == "session" else "report_index"
        col = "session_id" if kind == "session" else "report_name"
        meta.execute(
            f"UPDATE {table} SET instance_scope = ? WHERE {col} = ? "
            "AND (instance_scope IS NULL OR instance_scope = '')",
            (expected_scope, ident),
        )
        applied += 1
    return applied


def main():
    p = argparse.ArgumentParser(description="identity isolation audit")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--expected-scope", default="default")
    p.add_argument("--apply", action="store_true",
                   help="stamp missing instance_scope values (only class "
                        "that is auto-fixable)")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    meta = MetaIndex(os.path.join(args.data_dir, "meta_index.sqlite3"))
    store = SessionStore(args.data_dir, meta)
    problems: list = []
    fixes: list = []

    n_sessions = audit_sessions(meta, store, args.expected_scope,
                                problems, fixes)
    rrows = audit_reports(meta, args.expected_scope, problems, fixes)
    audit_bindings(meta, rrows, problems)
    audit_shares(meta, problems)

    applied = 0
    if args.apply and fixes:
        applied = apply_fixes(meta, fixes, args.expected_scope)

    if args.json:
        print(json.dumps({
            "sessions": n_sessions, "reports": len(rrows),
            "problems": problems, "fixes_applied": applied,
        }, ensure_ascii=False, indent=1))
    else:
        if problems:
            print(f"{len(problems)} problems:")
            for pr in problems:
                extra = {k: v for k, v in pr.items()
                         if k not in ("kind", "id")}
                print(f" - {pr['kind']}: {pr['id']}"
                      + (f" {extra}" if extra else ""))
        else:
            print(f"OK: {n_sessions} sessions, {len(rrows)} reports, "
                  "no isolation problems")
        if applied:
            print(f"applied {applied} scope fixes")
    return 1 if problems and not args.apply else 0


if __name__ == "__main__":
    sys.exit(main())
