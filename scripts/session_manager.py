#!/usr/bin/env python
"""Session ops CLI (reference scripts/session_manager.py):
list / show / delete / export sessions directly against the data dir."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.meta_index import MetaIndex  # noqa: E402
from deepvision_tpu.web.stores import SessionStore  # noqa: E402


def _store(data_dir: str) -> SessionStore:
    meta = MetaIndex(os.path.join(data_dir, "meta_index.sqlite3"))
    return SessionStore(data_dir, meta)


def cmd_list(args):
    store = _store(args.data_dir)
    rows, total = store.list_index(
        args.owner, args.scope, page=1, page_size=args.limit
    )
    print(f"total: {total}")
    for r in rows:
        print(f"{r['session_id']}  {r['status']:<12} "
              f"{r['interview_count']:>3}条  {r['topic']}")


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
        lines.append("")
    print("\n".join(lines))


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
    sp = sub.add_parser("show")
    sp.add_argument("session_id")
    sp.set_defaults(fn=cmd_show)
    sp = sub.add_parser("delete")
    sp.add_argument("session_id")
    sp.set_defaults(fn=cmd_delete)
    sp = sub.add_parser("export")
    sp.add_argument("session_id")
    sp.set_defaults(fn=cmd_export)
    args = p.parse_args()
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
