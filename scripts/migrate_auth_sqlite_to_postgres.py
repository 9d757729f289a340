#!/usr/bin/env python
"""Auth SQLite -> Postgres migration (reference
scripts/migrate_auth_sqlite_to_postgres.py).  Requires psycopg in the
target environment; performs schema create + row copy with conflict skip."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.authn import AUTH_SCHEMA  # noqa: E402
from deepvision_tpu.web.db import connect_db, is_postgres_url  # noqa: E402

TABLES = ("users", "wechat_identities", "auth_sms_codes", "auth_meta")


def main():
    p = argparse.ArgumentParser(description="auth sqlite->postgres")
    p.add_argument("sqlite_path")
    p.add_argument("postgres_url")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    if not is_postgres_url(args.postgres_url):
        print("target must be a postgres:// URL", file=sys.stderr)
        return 1
    src = connect_db(args.sqlite_path)
    dst = connect_db(args.postgres_url)
    cur = dst.cursor()
    for ddl in AUTH_SCHEMA:
        cur.execute(ddl)
    total = 0
    for table in TABLES:
        rows = src.execute(f"SELECT * FROM {table}").fetchall()
        if not rows:
            continue
        cols = rows[0].keys()
        placeholders = ", ".join("?" for _ in cols)
        for row in rows:
            if args.dry_run:
                continue
            try:
                cur.execute(
                    f"INSERT INTO {table} ({', '.join(cols)}) "
                    f"VALUES ({placeholders})",
                    tuple(row[c] for c in cols),
                )
            except Exception as e:  # conflict -> skip
                print(f"skip {table} row: {e}", file=sys.stderr)
        total += len(rows)
        print(f"{table}: {len(rows)} rows")
    if not args.dry_run:
        dst.commit()
    print(f"migrated {total} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
