#!/usr/bin/env python
"""Rollback a local->cloud import using its manifest (reference rollback
companion of import_external_local_data_to_cloud.py)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.meta_index import MetaIndex  # noqa: E402
from deepvision_tpu.web.stores import ReportStore, SessionStore  # noqa: E402


def main():
    p = argparse.ArgumentParser(description="rollback import")
    p.add_argument("manifest")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    args = p.parse_args()

    with open(args.manifest, encoding="utf-8") as fh:
        manifest = json.load(fh)
    meta = MetaIndex(os.path.join(args.data_dir, "meta_index.sqlite3"))
    sessions = SessionStore(args.data_dir, meta)
    reports = ReportStore(args.data_dir, meta)
    for sid in manifest.get("sessions", []):
        sessions.delete(sid)
    for name in manifest.get("reports", []):
        reports.delete(name)
    print(f"rolled back {len(manifest.get('sessions', []))} sessions, "
          f"{len(manifest.get('reports', []))} reports")
    return 0


if __name__ == "__main__":
    sys.exit(main())
