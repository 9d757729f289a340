#!/usr/bin/env python
"""Read-only runtime observation (reference scripts/agent_observe.py):
dump a live server's status, queues, metrics, and circuit state."""

from __future__ import annotations

import argparse
import json
import sys

import requests


def main():
    p = argparse.ArgumentParser(description="runtime observer")
    p.add_argument("--base-url", default="http://127.0.0.1:8899")
    p.add_argument("--json", action="store_true", dest="as_json")
    args = p.parse_args()

    try:
        status = requests.get(f"{args.base_url}/api/status", timeout=10).json()
    except requests.RequestException as e:
        print(f"server unreachable: {e}", file=sys.stderr)
        return 1

    if args.as_json:
        print(json.dumps(status, ensure_ascii=False, indent=1))
        return 0

    print(f"deepvision-tpu {status.get('version')} "
          f"| ai_mode={status.get('ai_mode')} "
          f"| started={status.get('started_at')}")
    rq = status.get("report_queue", {})
    print(f"report queue: running={rq.get('running')} "
          f"pending_slots={rq.get('pending_slots')}/{rq.get('max_pending')} "
          f"completed={rq.get('completed')} failed={rq.get('failed')} "
          f"rejected={rq.get('rejected')}")
    for name, eng in (status.get("engine") or {}).items():
        q = eng.get("queues", {})
        print(f"engine[{name}] model={eng.get('model')} "
              f"tokens={eng.get('tokens_generated')} "
              f"active={q.get('active')} high={q.get('high')} "
              f"low={q.get('low')} free_pages={q.get('free_pages')}")
    circuit = status.get("gateway_circuit") or {}
    if circuit:
        print("lanes in cooldown:", circuit)
    return 0


if __name__ == "__main__":
    sys.exit(main())
