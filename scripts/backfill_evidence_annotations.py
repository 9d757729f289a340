#!/usr/bin/env python
"""Backfill evidence annotations on legacy sessions.

Older sessions (or sessions imported from external instances) may lack the
evidence annotations the report pipeline consumes (quality_score /
evidence_class / answer_mode / evidence_intent).  This CLI walks every
session in the data dir and fills the gaps deterministically.
Re-implements reference legacy-log backfill (web/server.py:20903) +
scripts/backfill tooling.

  python scripts/backfill_evidence_annotations.py [--data-dir data] \
      [--dry-run] [--session dv-...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    ap.add_argument("--session", default=None,
                    help="only this session id")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.runtime.followup import (
        backfill_evidence_annotations,
        build_evidence_ledger,
    )
    from deepvision_tpu.web.stores import SessionStore

    meta_path = os.path.join(args.data_dir, "meta_index.sqlite3")
    if not os.path.isfile(meta_path):
        print(f"no meta index at {meta_path}")
        return 1
    meta = MetaIndex(meta_path)
    sessions = SessionStore(args.data_dir, meta)

    rows = meta.query(
        "SELECT session_id FROM session_index"
        + (" WHERE session_id = ?" if args.session else ""),
        (args.session,) if args.session else (),
    )
    touched_sessions = 0
    touched_entries = 0
    for row in rows:
        sid = row["session_id"]
        session = sessions.load(sid)
        if session is None:
            continue
        n = backfill_evidence_annotations(session)
        if n:
            touched_sessions += 1
            touched_entries += n
            ledger = build_evidence_ledger(session)
            print(f"{sid}: {n} entries backfilled "
                  f"(overall evidence: {ledger.get('overall', '?')})")
            if not args.dry_run:
                sessions.save(session)
    mode = "DRY-RUN " if args.dry_run else ""
    print(f"{mode}done: {touched_entries} entries across "
          f"{touched_sessions} sessions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
