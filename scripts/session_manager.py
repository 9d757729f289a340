#!/usr/bin/env python
"""Session ops CLI (reference scripts/session_manager.py, 585 LoC):
list / search / show / delete / export / backup / stats / repair / trim
sessions directly against the data dir — the operator's toolbox for
index drift, disk cleanup, and incident forensics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.meta_index import MetaIndex  # noqa: E402
from deepvision_tpu.web.stores import SessionStore  # noqa: E402


def _store(data_dir: str) -> SessionStore:
    meta = MetaIndex(os.path.join(data_dir, "meta_index.sqlite3"))
    return SessionStore(data_dir, meta)


def _iter_session_files(data_dir: str):
    root = os.path.join(data_dir, "sessions")
    if not os.path.isdir(root):
        return
    for fn in sorted(os.listdir(root)):
        if fn.endswith(".json"):
            yield os.path.join(root, fn)


def cmd_list(args):
    store = _store(args.data_dir)
    rows, total = store.list_index(
        args.owner, args.scope, page=1, page_size=args.limit
    )
    print(f"total: {total}")
    for r in rows:
        print(f"{r['session_id']}  {r['status']:<12} "
              f"{r['interview_count']:>3}条  {r['topic']}")


def cmd_search(args):
    """Keyword search over topic + interview log (forensics helper)."""
    store = _store(args.data_dir)
    needle = args.keyword
    hits = 0
    for path in _iter_session_files(args.data_dir):
        sid = os.path.splitext(os.path.basename(path))[0]
        session = store.load(sid)
        if session is None:
            continue
        hay = session.get("topic", "") + session.get("description", "")
        for e in session.get("interview_log", []):
            hay += (e.get("question") or "") + (e.get("answer") or "")
        if needle in hay:
            hits += 1
            print(f"{sid}  {session.get('status'):<12} "
                  f"{session.get('topic')}")
            if args.context:
                for e in session.get("interview_log", []):
                    line = (e.get("question") or "") + (e.get("answer") or "")
                    if needle in line:
                        print(f"    …{line[:120]}")
    print(f"{hits} sessions matched")
    return 0 if hits else 1


def cmd_show(args):
    store = _store(args.data_dir)
    session = store.load(args.session_id)
    if session is None:
        print("not found", file=sys.stderr)
        return 1
    print(json.dumps(session, ensure_ascii=False, indent=1))


def cmd_delete(args):
    store = _store(args.data_dir)
    if store.delete(args.session_id):
        print("deleted")
    else:
        print("not found", file=sys.stderr)
        return 1


def cmd_backup(args):
    store = _store(args.data_dir)
    path = store.backup(args.session_id, label=args.label)
    if path is None:
        print("not found", file=sys.stderr)
        return 1
    print(path)


def cmd_export(args):
    store = _store(args.data_dir)
    session = store.load(args.session_id)
    if session is None:
        print("not found", file=sys.stderr)
        return 1
    lines = [f"# {session.get('topic')}（访谈实录）", ""]
    for i, e in enumerate(session.get("interview_log", []), 1):
        lines.append(f"**Q{i}** {e.get('question')}")
        lines.append(f"> {e.get('answer')}")
        if e.get("rationale_text"):
            lines.append(f"> 理由：{e['rationale_text']}")
        lines.append("")
    print("\n".join(lines))


def cmd_stats(args):
    """Aggregate session statistics: status / scenario / mode mix, answer
    depth, evidence quality distribution."""
    store = _store(args.data_dir)
    status = Counter()
    scenario = Counter()
    mode = Counter()
    n_answers = 0
    n_sessions = 0
    quality_buckets = Counter()
    for path in _iter_session_files(args.data_dir):
        sid = os.path.splitext(os.path.basename(path))[0]
        session = store.load(sid)
        if session is None:
            continue
        n_sessions += 1
        status[session.get("status", "?")] += 1
        scenario[session.get("scenario_id", "?")] += 1
        mode[session.get("interview_mode", "standard")] += 1
        for e in session.get("interview_log", []):
            n_answers += 1
            q = e.get("quality_score")
            if isinstance(q, (int, float)):
                quality_buckets[
                    "high" if q >= 0.7 else "mid" if q >= 0.4 else "low"
                ] += 1
    out = {
        "sessions": n_sessions,
        "answers": n_answers,
        "avg_answers_per_session": round(n_answers / n_sessions, 2)
        if n_sessions else 0,
        "by_status": dict(status),
        "by_scenario": dict(scenario),
        "by_mode": dict(mode),
        "answer_quality": dict(quality_buckets),
    }
    print(json.dumps(out, ensure_ascii=False, indent=1))


def cmd_repair(args):
    """Rebuild the session_index from the session files on disk — the
    recovery path for index drift (DB restored from an older backup,
    partial imports, manual file surgery)."""
    store = _store(args.data_dir)
    meta = store.meta
    seen = set()
    fixed = 0
    for path in _iter_session_files(args.data_dir):
        sid = os.path.splitext(os.path.basename(path))[0]
        session = store.load(sid)
        if session is None:
            continue
        seen.add(sid)
        row = meta.query_one(
            "SELECT session_id, updated_at FROM session_index "
            "WHERE session_id = ?", (sid,),
        )
        if row is None or row["updated_at"] != session.get("updated_at"):
            if args.dry_run:
                print(f"would reindex {sid}")
            else:
                store.save(session)  # save() refreshes the index row
                print(f"reindexed {sid}")
            fixed += 1
    orphans = [
        r["session_id"] for r in meta.query(
            "SELECT session_id FROM session_index")
        if r["session_id"] not in seen
    ]
    for sid in orphans:
        if args.dry_run:
            print(f"would drop orphan index row {sid}")
        else:
            meta.execute(
                "DELETE FROM session_index WHERE session_id = ?", (sid,))
            print(f"dropped orphan index row {sid}")
    print(f"repair: {fixed} reindexed, {len(orphans)} orphan rows"
          f"{' (dry-run)' if args.dry_run else ''}")


def cmd_trim(args):
    """Purge completed sessions older than --days (dry-run by default;
    pass --apply to delete)."""
    import datetime as dt

    store = _store(args.data_dir)
    cutoff = (dt.datetime.now(dt.timezone.utc)
              - dt.timedelta(days=args.days)).strftime("%Y-%m-%dT%H:%M:%SZ")
    rows, _ = store.list_index(None, args.scope, page=1, page_size=10000)
    victims = [
        r for r in rows
        if r["status"] == "completed" and (r["updated_at"] or "") < cutoff
    ]
    for r in victims:
        if args.apply:
            store.backup(r["session_id"], label="trim")
            store.delete(r["session_id"])
            print(f"deleted {r['session_id']} ({r['updated_at']})")
        else:
            print(f"would delete {r['session_id']} ({r['updated_at']})")
    print(f"{len(victims)} sessions {'deleted' if args.apply else 'matched'}"
          f" (completed, idle > {args.days}d)")


def main():
    p = argparse.ArgumentParser(description="session manager")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--scope", default="default")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("list")
    sp.add_argument("--owner", default=None)
    sp.add_argument("--limit", type=int, default=50)
    sp.set_defaults(fn=cmd_list)
    sp = sub.add_parser("search", help="keyword search over Q/A text")
    sp.add_argument("keyword")
    sp.add_argument("--context", action="store_true")
    sp.set_defaults(fn=cmd_search)
    sp = sub.add_parser("show")
    sp.add_argument("session_id")
    sp.set_defaults(fn=cmd_show)
    sp = sub.add_parser("delete")
    sp.add_argument("session_id")
    sp.set_defaults(fn=cmd_delete)
    sp = sub.add_parser("backup")
    sp.add_argument("session_id")
    sp.add_argument("--label", default="manual")
    sp.set_defaults(fn=cmd_backup)
    sp = sub.add_parser("export")
    sp.add_argument("session_id")
    sp.set_defaults(fn=cmd_export)
    sp = sub.add_parser("stats")
    sp.set_defaults(fn=cmd_stats)
    sp = sub.add_parser("repair", help="rebuild session_index from files")
    sp.add_argument("--dry-run", action="store_true")
    sp.set_defaults(fn=cmd_repair)
    sp = sub.add_parser("trim", help="purge old completed sessions")
    sp.add_argument("--days", type=int, default=90)
    sp.add_argument("--apply", action="store_true")
    sp.set_defaults(fn=cmd_trim)
    args = p.parse_args()
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
