#!/usr/bin/env python
"""License CLI (reference scripts/license_manager.py): batch generate,
query, revoke, extend."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.licensing import LicenseService  # noqa: E402
from deepvision_tpu.web.meta_index import MetaIndex  # noqa: E402


def _svc(data_dir: str) -> LicenseService:
    meta = MetaIndex(os.path.join(data_dir, "meta_index.sqlite3"))
    return LicenseService(
        os.path.join(data_dir, "auth", "license.sqlite3"), meta
    )


def main():
    p = argparse.ArgumentParser(description="license manager")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("generate")
    sp.add_argument("--count", type=int, default=1)
    sp.add_argument("--level", default="standard")
    sp.add_argument("--days", type=int, default=365)
    sp.add_argument("--batch-id", default="")

    sp = sub.add_parser("list")
    sp.add_argument("--status", default="")
    sp.add_argument("--batch-id", default="")

    sp = sub.add_parser("summary")

    sp = sub.add_parser("revoke")
    sp.add_argument("license_id", type=int)

    sp = sub.add_parser("extend")
    sp.add_argument("license_id", type=int)
    sp.add_argument("--days", type=int, default=30)

    args = p.parse_args()
    os.makedirs(os.path.join(args.data_dir, "auth"), exist_ok=True)
    svc = _svc(args.data_dir)

    if args.cmd == "generate":
        codes = svc.batch_generate(
            args.count, level=args.level, days_valid=args.days,
            batch_id=args.batch_id,
        )
        for c in codes:
            print(c)
    elif args.cmd == "list":
        for lic in svc.search(status=args.status, batch_id=args.batch_id):
            print(json.dumps(lic, ensure_ascii=False))
    elif args.cmd == "summary":
        print(json.dumps(svc.summary(), ensure_ascii=False, indent=1))
    elif args.cmd == "revoke":
        svc.revoke(args.license_id, "cli")
        print("revoked")
    elif args.cmd == "extend":
        print(json.dumps(svc.extend(args.license_id, args.days),
                         ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
