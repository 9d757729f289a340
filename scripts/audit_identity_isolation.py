#!/usr/bin/env python
"""Instance-scope isolation audit (reference
scripts/audit_identity_isolation.py): find sessions/reports whose scope or
ownership stamps are missing or inconsistent."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.meta_index import MetaIndex  # noqa: E402
from deepvision_tpu.web.stores import SessionStore  # noqa: E402


def main():
    p = argparse.ArgumentParser(description="identity isolation audit")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--expected-scope", default="default")
    args = p.parse_args()

    meta = MetaIndex(os.path.join(args.data_dir, "meta_index.sqlite3"))
    store = SessionStore(args.data_dir, meta)
    problems = []

    rows = meta.query("SELECT * FROM session_index")
    for row in rows:
        sid = row["session_id"]
        if not row["owner_user_id"]:
            problems.append(f"session {sid}: missing owner")
        if row["instance_scope"] != args.expected_scope:
            problems.append(
                f"session {sid}: scope {row['instance_scope']!r} != "
                f"{args.expected_scope!r}"
            )
        session = store.load(sid)
        if session and session.get("owner_user_id") != row["owner_user_id"]:
            problems.append(
                f"session {sid}: file owner {session.get('owner_user_id')!r}"
                f" != index owner {row['owner_user_id']!r}"
            )

    rrows = meta.query("SELECT * FROM report_index WHERE deleted = 0")
    owners = {
        r["report_name"]: r["owner_user_id"]
        for r in meta.query("SELECT * FROM report_meta_owners")
    }
    for row in rrows:
        name = row["report_name"]
        if not row["owner_user_id"]:
            problems.append(f"report {name}: missing owner")
        if name in owners and owners[name] != row["owner_user_id"]:
            problems.append(f"report {name}: owner map mismatch")
        if row["instance_scope"] != args.expected_scope:
            problems.append(f"report {name}: scope mismatch")

    if problems:
        print(f"{len(problems)} problems:")
        for pr in problems:
            print(" -", pr)
        return 1
    print(f"OK: {len(rows)} sessions, {len(rrows)} reports, "
          "no isolation problems")
    return 0


if __name__ == "__main__":
    sys.exit(main())
