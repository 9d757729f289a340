#!/usr/bin/env python
"""Auth DB migration (reference scripts/migrate_auth_sqlite_to_postgres.py,
347 LoC): copy the auth store (users / wechat identities / sms codes /
auth meta) from a SQLite file to a Postgres URL — or any target the
db-compat shim accepts, which makes the whole workflow testable
sqlite->sqlite.

Workflow:
  migrate   schema create + batched row copy with per-row conflict skip,
            inserted/skipped accounting, --tables subset, --dry-run
  --verify  post-copy row counts + per-table content checksums on the
            key columns (catches silent truncation / encoding drift)
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.authn import AUTH_SCHEMA  # noqa: E402
from deepvision_tpu.web.db import connect_db, is_postgres_url  # noqa: E402

TABLES = ("users", "wechat_identities", "auth_sms_codes", "auth_meta")

# checksum columns per table: stable identity content, no autoincrement ids
CHECKSUM_COLS = {
    "users": ("phone", "level", "is_admin"),
    "wechat_identities": ("openid", "user_id"),
    "auth_sms_codes": ("phone", "code_hash"),
    "auth_meta": ("key", "value"),
}


def _rows(conn, table):
    return conn.execute(f"SELECT * FROM {table}").fetchall()


def _checksum(conn, table) -> str:
    cols = CHECKSUM_COLS[table]
    try:
        rows = conn.execute(
            f"SELECT {', '.join(cols)} FROM {table}").fetchall()
    except Exception:
        return "absent"
    digest = hashlib.sha256()
    for key in sorted("\x1f".join(str(r[c]) for c in cols) for r in rows):
        digest.update(key.encode("utf-8"))
        digest.update(b"\x1e")
    return f"{len(rows)}:{digest.hexdigest()[:16]}"


def migrate(src, dst, tables, dry_run: bool) -> dict:
    cur = dst.cursor()
    for ddl in AUTH_SCHEMA:
        cur.execute(ddl)
    stats = {}
    for table in tables:
        rows = _rows(src, table)
        inserted = skipped = 0
        if rows:
            cols = rows[0].keys()
            placeholders = ", ".join("?" for _ in cols)
            sql = (f"INSERT INTO {table} ({', '.join(cols)}) "
                   f"VALUES ({placeholders})")
            for row in rows:
                if dry_run:
                    continue
                try:
                    cur.execute(sql, tuple(row[c] for c in cols))
                    inserted += 1
                except Exception:  # conflict (already migrated) -> skip
                    skipped += 1
        stats[table] = {"source_rows": len(rows), "inserted": inserted,
                        "skipped": skipped}
    if not dry_run:
        dst.commit()
    return stats


def verify(src, dst, tables) -> list:
    problems = []
    for table in tables:
        cs_src = _checksum(src, table)
        cs_dst = _checksum(dst, table)
        if cs_src != cs_dst:
            problems.append(
                f"{table}: source {cs_src} != target {cs_dst}")
    return problems


def main():
    p = argparse.ArgumentParser(description="auth db migration")
    p.add_argument("sqlite_path")
    p.add_argument("target_url",
                   help="postgres:// URL (or a sqlite path for rehearsal)")
    p.add_argument("--tables", default=",".join(TABLES),
                   help="comma subset of tables to copy")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--verify", action="store_true",
                   help="compare row counts + content checksums after copy")
    p.add_argument("--allow-sqlite-target", action="store_true",
                   help="permit a non-postgres target (rehearsal runs)")
    args = p.parse_args()

    if not is_postgres_url(args.target_url) and not args.allow_sqlite_target:
        print("target must be a postgres:// URL "
              "(--allow-sqlite-target for rehearsal)", file=sys.stderr)
        return 1
    tables = [t.strip() for t in args.tables.split(",") if t.strip()]
    unknown = set(tables) - set(TABLES)
    if unknown:
        print(f"unknown tables: {sorted(unknown)}", file=sys.stderr)
        return 1

    src = connect_db(args.sqlite_path)
    dst = connect_db(args.target_url)
    stats = migrate(src, dst, tables, args.dry_run)
    total = 0
    for table, st in stats.items():
        total += st["source_rows"]
        print(f"{table}: {st['source_rows']} rows "
              f"(+{st['inserted']} inserted, {st['skipped']} skipped)")
    print(f"{'would migrate' if args.dry_run else 'migrated'} "
          f"{total} rows")

    if args.verify and not args.dry_run:
        problems = verify(src, dst, tables)
        if problems:
            print(f"VERIFY FAILED ({len(problems)}):", file=sys.stderr)
            for pr in problems:
                print(" -", pr, file=sys.stderr)
            return 2
        print("verify OK: counts + checksums match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
