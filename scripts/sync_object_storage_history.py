#!/usr/bin/env python
"""Manual object-storage history sync (reference
scripts/sync_object_storage_history.py): backfill stored export assets to
the configured S3-compatible bucket (or local FS backend)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="object storage sync")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    args = p.parse_args()

    from deepvision_tpu.web.object_storage import ObjectStorageHistoryService
    from deepvision_tpu.web.server import AppState

    state = AppState(data_dir=args.data_dir, overrides={"AI_MODE": "off",
                                                        "ENABLE_AI": False})
    svc = ObjectStorageHistoryService(state)
    result = svc.sync_history()
    print(f"synced {result['synced']} export assets")
    state.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
