#!/usr/bin/env python
"""Report generation CLI (reference scripts/report_generator.py): run the
V3 pipeline for a session outside the web process — useful for batch
re-generation and for benchmarking reports/min."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.engine.client import ModelGateway  # noqa: E402
from deepvision_tpu.web.meta_index import MetaIndex  # noqa: E402
from deepvision_tpu.web.runtime import report_v3  # noqa: E402
from deepvision_tpu.web.stores import (  # noqa: E402
    ReportStore,
    SessionStore,
    build_session_report_filename,
)


def main():
    p = argparse.ArgumentParser(description="report generator")
    p.add_argument("session_ids", nargs="+")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--profile", default="balanced",
                   choices=["balanced", "quality", "release-conservative"])
    p.add_argument("--ai-mode", default="template",
                   choices=["template", "engine", "off"])
    p.add_argument("--scope", default="default")
    args = p.parse_args()

    meta = MetaIndex(os.path.join(args.data_dir, "meta_index.sqlite3"))
    sessions = SessionStore(args.data_dir, meta)
    reports = ReportStore(args.data_dir, meta)
    gateway = ModelGateway(mode=args.ai_mode)
    if args.ai_mode == "engine":
        from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

        gateway.engines["default"] = LLMEngine(EngineConfig())

    t0 = time.time()
    done = 0
    for sid in args.session_ids:
        session = sessions.load(sid)
        if session is None:
            print(f"skip {sid}: not found", file=sys.stderr)
            continue
        result = report_v3.generate_report_v3(
            gateway, session, profile=args.profile
        )
        name = build_session_report_filename(
            session.get("topic", ""), sid,
            variant=args.profile if args.profile != "balanced" else "",
        )
        reports.save(
            name, result.markdown,
            owner_user_id=session.get("owner_user_id"),
            instance_scope=args.scope, session_id=sid,
            topic=session.get("topic", ""), report_profile=args.profile,
        )
        done += 1
        print(f"{sid} -> {name} (quality={result.quality.get('score')}, "
              f"path={result.path})")
    dt = time.time() - t0
    if done:
        print(f"\n{done} reports in {dt:.1f}s "
              f"({done / dt * 60:.1f} reports/min)")
    return 0 if done else 1


if __name__ == "__main__":
    sys.exit(main())
