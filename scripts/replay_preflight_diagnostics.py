#!/usr/bin/env python
"""Offline preflight replay diagnostics (reference
scripts/replay_preflight_diagnostics.py:1, 190 LoC).

Replays historical sessions through the CURRENT evidence-ledger +
mid-interview preflight chain, step by step: after each recorded answer
it rebuilds the ledger as it stood at that point and records which
probes the planner would have fired. The output answers the operator
question "would today's preflight logic over-interrupt this interview?"

Reported per session:
  - trigger count + cooldown-suppressed count
  - distribution by reason and by dimension
  - the first trigger point (question number + probe)
  - up to --max-events key events

Usage:
  python scripts/replay_preflight_diagnostics.py --all
  python scripts/replay_preflight_diagnostics.py \
      --session dv-... --cooldown-steps 3 --json out.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from copy import deepcopy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def replay_session(session: dict, *, cooldown_steps: int = 3,
                   max_events: int = 12) -> dict:
    """Step through the interview log; at each step k the ledger sees
    only entries [0..k] — exactly what the live planner saw mid-interview.
    A probe for a dimension fired within the last ``cooldown_steps``
    answers is counted as cooldown-suppressed (the live engine's
    anti-interruption pacing)."""
    from deepvision_tpu.web.runtime.followup import plan_preflight_probes

    log = session.get("interview_log") or []
    triggers = 0
    suppressed = 0
    by_reason: dict = {}
    by_dimension: dict = {}
    first_trigger = None
    events = []
    last_fired_at: dict = {}    # dimension -> step index

    for step in range(1, len(log) + 1):
        partial = deepcopy(session)
        partial["interview_log"] = log[:step]
        probes = plan_preflight_probes(partial)
        if not probes:
            continue
        probe = probes[0]
        dim = probe.get("dimension") or ""
        fired_at = last_fired_at.get(dim)
        if fired_at is not None and step - fired_at < cooldown_steps:
            suppressed += 1
            if len(events) < max_events:
                events.append({
                    "step": step, "kind": "suppressed",
                    "dimension": dim, "reason": probe.get("reason"),
                })
            continue
        last_fired_at[dim] = step
        triggers += 1
        by_reason[probe.get("reason") or "?"] = \
            by_reason.get(probe.get("reason") or "?", 0) + 1
        by_dimension[dim or "?"] = by_dimension.get(dim or "?", 0) + 1
        if first_trigger is None:
            first_trigger = {"step": step, **probe}
        if len(events) < max_events:
            events.append({"step": step, "kind": "trigger", **probe})

    answered = len(log)
    return {
        "session_id": session.get("session_id"),
        "topic": session.get("topic"),
        "answers": answered,
        "triggers": triggers,
        "suppressed": suppressed,
        "trigger_rate": round(triggers / answered, 3) if answered else 0.0,
        "by_reason": by_reason,
        "by_dimension": by_dimension,
        "first_trigger": first_trigger,
        "events": events,
        "over_interrupted": answered > 0 and triggers / answered > 0.5,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="用历史会话回放预检链路，诊断访谈是否被过度打断")
    ap.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    group = ap.add_mutually_exclusive_group(required=True)
    group.add_argument("--session", action="append", default=None,
                       help="会话 ID（可重复）")
    group.add_argument("--all", action="store_true",
                       help="回放数据目录下的全部会话")
    ap.add_argument("--cooldown-steps", type=int, default=3,
                    help="同一维度两次预检之间的最小答题间隔")
    ap.add_argument("--max-events", type=int, default=12)
    ap.add_argument("--json", default="", help="把完整结果写入 JSON 文件")
    args = ap.parse_args(argv)

    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    meta_path = os.path.join(args.data_dir, "meta_index.sqlite3")
    if not os.path.isfile(meta_path):
        print(f"no meta index at {meta_path}")
        return 1
    meta = MetaIndex(meta_path)
    store = SessionStore(args.data_dir, meta)

    if args.all:
        rows = meta.query("SELECT session_id FROM session_index")
        session_ids = [r["session_id"] for r in rows]
    else:
        session_ids = args.session
    results = []
    for sid in session_ids:
        session = store.load(sid)
        if session is None:
            print(f"会话不存在: {sid}")
            return 1
        results.append(replay_session(
            session, cooldown_steps=args.cooldown_steps,
            max_events=args.max_events))

    over = [r for r in results if r["over_interrupted"]]
    total_triggers = sum(r["triggers"] for r in results)
    total_suppressed = sum(r["suppressed"] for r in results)
    for r in results:
        flag = " ⚠ 过度打断" if r["over_interrupted"] else ""
        print(f"{r['session_id']}  答题{r['answers']}  "
              f"预检{r['triggers']}次  冷却拦截{r['suppressed']}次"
              f"{flag}")
        if r["first_trigger"]:
            ft = r["first_trigger"]
            print(f"  首次触发：第{ft['step']}题  {ft.get('dimension')}"
                  f"/{ft.get('aspect') or '-'}（{ft.get('reason')}）")
        for reason, n in sorted(r["by_reason"].items()):
            print(f"  - {reason}: {n}")
    print(f"\n共 {len(results)} 个会话：预检 {total_triggers} 次、"
          f"冷却拦截 {total_suppressed} 次、"
          f"疑似过度打断 {len(over)} 个")
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump({"sessions": results, "summary": {
                "total": len(results), "triggers": total_triggers,
                "suppressed": total_suppressed,
                "over_interrupted": len(over)}}, fh, ensure_ascii=False,
                indent=2)
        print(f"完整结果已写入 {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
