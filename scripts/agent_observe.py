#!/usr/bin/env python
"""Read-only ops dashboard (reference scripts/agent_observe.py, 1,574 LoC).

Two data sources:
  * live server  — /api/status (+ /api/metrics when admin credentials are
    supplied via --admin-phone, logging in through the SMS test code);
  * local data dir — reads meta_index.sqlite3 directly when no server is
    reachable (post-mortem mode): session/report counts, recent activity,
    metrics snapshots the flusher persisted, export assets, licenses.

Modes:
  python scripts/agent_observe.py                      # one-shot, live
  python scripts/agent_observe.py --watch 5            # refresh every 5s
  python scripts/agent_observe.py --local --data-dir data
  python scripts/agent_observe.py --json               # machine-readable
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# live mode
# ---------------------------------------------------------------------------

def collect_live(base_url: str, admin_phone: str, test_code: str) -> dict:
    import requests

    out: dict = {"source": "live", "base_url": base_url}
    status = requests.get(f"{base_url}/api/status", timeout=10).json()
    out["status"] = status
    if admin_phone:
        s = requests.Session()
        s.post(f"{base_url}/api/auth/sms/send-code",
               json={"phone": admin_phone}, timeout=10)
        r = s.post(f"{base_url}/api/auth/login/code",
                   json={"phone": admin_phone, "code": test_code}, timeout=10)
        if r.ok:
            m = s.get(f"{base_url}/api/metrics", timeout=10)
            if m.ok:
                out["metrics"] = m.json()
            sm = s.get(f"{base_url}/api/summaries", timeout=10)
            if sm.ok:
                out["summaries"] = sm.json()
    return out


def render_live(out: dict) -> None:
    st = out["status"]
    print(f"deepvision-tpu {st.get('version')} | ai_mode={st.get('ai_mode')} "
          f"| scope={st.get('instance_scope')} "
          f"| started={st.get('started_at')}")
    rq = st.get("report_queue", {})
    print(f"  report queue  running={rq.get('running')} "
          f"slots={rq.get('pending_slots')}/{rq.get('max_pending')} "
          f"done={rq.get('completed')} failed={rq.get('failed')} "
          f"rejected={rq.get('rejected')}")
    for name, eng in (st.get("engine") or {}).items():
        q = eng.get("queues", {})
        pc = eng.get("prefix_cache") or {}
        hit = pc.get("hits", 0)
        total = hit + pc.get("misses", 0)
        rate = f"{hit / total:.0%}" if total else "-"
        print(f"  engine[{name}]  tokens={eng.get('tokens_generated')} "
              f"steps={eng.get('decode_steps')} "
              f"active={q.get('active')} q(hi/lo)={q.get('high')}/"
              f"{q.get('low')} free_pages={q.get('free_pages')} "
              f"prefix_hit={rate}")
    circuit = st.get("gateway_circuit") or {}
    if circuit:
        print(f"  lanes in cooldown: {circuit}")

    metrics = out.get("metrics")
    if metrics:
        ai = metrics.get("ai_calls", {})
        print(f"  ai calls      n={ai.get('count')} "
              f"p50={ai.get('total_ms', {}).get('p50')}ms "
              f"p95={ai.get('total_ms', {}).get('p95')}ms "
              f"queue_p95={ai.get('queue_wait_ms', {}).get('p95')}ms "
              f"by_lane={ai.get('by_lane')}")
        qg = metrics.get("question_generation", {})
        print(f"  questions     n={qg.get('count')} "
              f"tiers={qg.get('by_tier')} "
              f"fallbacks={qg.get('fallback_triggered')} "
              f"cache_hits={qg.get('cache_hits')}")
        print("  stage latency (question pipeline):")
        stages = metrics.get("question_generation_runtime", {}).get(
            "stages", {})
        for stage, prof in sorted(stages.items()):
            print(f"    {stage:<16} n={prof.get('count'):<5} "
                  f"p50={prof.get('p50')}ms p95={prof.get('p95')}ms")
        ol = metrics.get("list_overload", {})
        if any(ol.values()):
            print(f"  list overload rejections: {ol}")
    summ = out.get("summaries")
    if summ:
        print(f"  summary cache n={summ.get('cached_count')} "
              f"size={summ.get('cache_size_kb')}KB "
              f"threshold={summ.get('threshold')}")


# ---------------------------------------------------------------------------
# local (post-mortem) mode
# ---------------------------------------------------------------------------

def collect_local(data_dir: str) -> dict:
    from deepvision_tpu.web.meta_index import MetaIndex

    meta_path = os.path.join(data_dir, "meta_index.sqlite3")
    if not os.path.isfile(meta_path):
        raise SystemExit(f"no meta index at {meta_path}")
    meta = MetaIndex(meta_path)

    def one(sql, params=()):
        row = meta.query_one(sql, params)
        return dict(row) if row else {}

    out = {"source": "local", "data_dir": os.path.abspath(data_dir)}
    out["sessions"] = one(
        "SELECT COUNT(*) AS n, MAX(updated_at) AS last FROM session_index")
    out["sessions_by_status"] = {
        r["status"] or "?": r["n"] for r in meta.query(
            "SELECT status, COUNT(*) AS n FROM session_index GROUP BY status")
    }
    out["reports"] = one(
        "SELECT COUNT(*) AS n, MAX(created_at) AS last FROM report_index "
        "WHERE deleted = 0")
    out["exports"] = one(
        "SELECT COUNT(*) AS n, COALESCE(SUM(LENGTH(content)), 0) AS bytes "
        "FROM export_asset_store")
    out["summary_cache"] = one(
        "SELECT COUNT(*) AS n FROM summary_cache_store")
    out["custom_scenarios"] = one(
        "SELECT COUNT(*) AS n FROM custom_scenarios")
    out["shares"] = one(
        "SELECT COUNT(*) AS n FROM report_meta_shares")
    snap = meta.query_one(
        "SELECT payload, created_at FROM runtime_metrics_store "
        "ORDER BY id DESC LIMIT 1")
    if snap:
        try:
            out["last_metrics_snapshot"] = {
                "at": snap["created_at"],
                "payload": json.loads(snap["payload"]),
            }
        except (ValueError, KeyError):
            pass
    out["recent_sessions"] = [
        dict(r) for r in meta.query(
            "SELECT session_id, topic, status, interview_count, updated_at "
            "FROM session_index ORDER BY updated_at DESC LIMIT 8")
    ]
    return out


def render_local(out: dict) -> None:
    print(f"data dir: {out['data_dir']}")
    s = out["sessions"]
    print(f"  sessions      n={s.get('n')} last={s.get('last')} "
          f"by_status={out['sessions_by_status']}")
    r = out["reports"]
    print(f"  reports       n={r.get('n')} last={r.get('last')}")
    e = out["exports"]
    print(f"  export assets n={e.get('n')} "
          f"bytes={e.get('bytes', 0):,}")
    print(f"  summary cache n={out['summary_cache'].get('n')} "
          f"| custom scenarios n={out['custom_scenarios'].get('n')} "
          f"| shares n={out['shares'].get('n')}")
    snap = out.get("last_metrics_snapshot")
    if snap:
        ai = snap["payload"].get("ai_calls", {})
        print(f"  last metrics snapshot @ {snap['at']}: "
              f"ai_calls={ai.get('count')} "
              f"p95={ai.get('total_ms', {}).get('p95')}ms")
    if out["recent_sessions"]:
        print("  recent sessions:")
        for row in out["recent_sessions"]:
            print(f"    {row['session_id']}  [{row['status']}] "
                  f"{(row['topic'] or '')[:28]:<28} "
                  f"answers={row['interview_count']} {row['updated_at']}")


def main():
    p = argparse.ArgumentParser(description="runtime observer")
    p.add_argument("--base-url", default="http://127.0.0.1:8899")
    p.add_argument("--local", action="store_true",
                   help="read the data dir instead of a live server")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--admin-phone", default=os.environ.get(
        "OBSERVE_ADMIN_PHONE", ""))
    p.add_argument("--test-code", default=os.environ.get(
        "SMS_TEST_CODE", "666666"))
    p.add_argument("--watch", type=float, default=0,
                   help="refresh every N seconds")
    p.add_argument("--json", action="store_true", dest="as_json")
    args = p.parse_args()

    def once():
        if args.local:
            out = collect_local(args.data_dir)
        else:
            try:
                out = collect_live(args.base_url, args.admin_phone,
                                   args.test_code)
            except Exception as e:  # noqa: BLE001
                print(f"server unreachable ({e}); falling back to "
                      f"--local {args.data_dir}", file=sys.stderr)
                out = collect_local(args.data_dir)
        if args.as_json:
            print(json.dumps(out, ensure_ascii=False, indent=1,
                             default=str))
        elif out["source"] == "live":
            render_live(out)
        else:
            render_local(out)

    if args.watch > 0:
        try:
            while True:
                os.system("clear" if os.name != "nt" else "cls")
                print(time.strftime("%H:%M:%S"))
                once()
                time.sleep(args.watch)
        except KeyboardInterrupt:
            return 0
    else:
        once()
    return 0


if __name__ == "__main__":
    sys.exit(main())
