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
# health gate (reference agent_observe's alert rules): machine-usable
# for deploy monitors — exit 1 on any critical breach
# ---------------------------------------------------------------------------

HEALTH_THRESHOLDS = {
    "ai_p95_ms": 8000.0,       # report SLO envelope (BASELINE.md 210s cap,
                               # interactive envelope far tighter)
    "queue_wait_p95_ms": 2000.0,
    "min_free_pages": 1,       # 0 free pages = KV pool exhausted
    "max_failed_reports": 0,
    "stale_hours": 0.0,        # 0 disables the stale-activity check
}


def evaluate_health(out: dict, thresholds: dict | None = None) -> list:
    """Rule sweep over a collected snapshot (live or local); returns
    [{severity: crit|warn|info, rule, detail}] sorted crit-first."""
    th = dict(HEALTH_THRESHOLDS)
    th.update(thresholds or {})
    findings = []

    def add(severity, rule, detail):
        findings.append({"severity": severity, "rule": rule,
                         "detail": detail})

    st = out.get("status") or {}
    circuit = st.get("gateway_circuit") or {}
    if circuit:
        add("crit", "lanes_in_cooldown",
            f"gateway circuit open for {sorted(circuit)}")
    rq = st.get("report_queue") or {}
    if (rq.get("failed") or 0) > th["max_failed_reports"]:
        add("crit", "report_failures",
            f"{rq['failed']} failed report jobs")
    if (rq.get("rejected") or 0) > 0:
        add("warn", "report_queue_rejections",
            f"{rq['rejected']} submissions rejected (queue full)")
    for name, eng in (st.get("engine") or {}).items():
        q = eng.get("queues") or {}
        free = q.get("free_pages")
        if free is not None and free < th["min_free_pages"]:
            add("crit", "kv_pool_exhausted",
                f"engine[{name}] free_pages={free}")
        if (q.get("high") or 0) > 16:
            add("warn", "deep_high_priority_queue",
                f"engine[{name}] high-priority backlog {q['high']}")

    metrics = out.get("metrics") or {}
    ai = metrics.get("ai_calls") or {}
    p95 = (ai.get("total_ms") or {}).get("p95")
    if p95 is not None and p95 > th["ai_p95_ms"]:
        add("warn", "ai_latency_p95",
            f"ai call p95 {p95}ms > {th['ai_p95_ms']}ms")
    qw95 = (ai.get("queue_wait_ms") or {}).get("p95")
    if qw95 is not None and qw95 > th["queue_wait_p95_ms"]:
        add("warn", "ai_queue_wait_p95",
            f"queue wait p95 {qw95}ms > {th['queue_wait_p95_ms']}ms")
    ol = metrics.get("list_overload") or {}
    shed = {k: v for k, v in ol.items() if v}
    if shed:
        add("warn", "list_load_shedding", f"429s: {shed}")
    qg = metrics.get("question_generation") or {}
    fb = qg.get("fallback_triggered") or 0
    n = qg.get("count") or 0
    if n >= 10 and fb / n > 0.2:
        add("crit", "question_fallback_rate",
            f"{fb}/{n} questions served by the rule fallback")

    if th["stale_hours"] > 0 and out.get("source") == "local":
        last = (out.get("sessions") or {}).get("last")
        if last:
            import datetime as _dt

            try:
                ts = _dt.datetime.fromisoformat(
                    str(last).replace("Z", "+00:00"))
                age_h = ((_dt.datetime.now(_dt.timezone.utc) - ts)
                         .total_seconds() / 3600.0)
                if age_h > th["stale_hours"]:
                    add("info", "stale_activity",
                        f"no session activity for {age_h:.1f}h")
            except ValueError:
                pass

    order = {"crit": 0, "warn": 1, "info": 2}
    findings.sort(key=lambda f: order[f["severity"]])
    return findings


# ---------------------------------------------------------------------------
# trend history: deltas between persisted metrics snapshots
# ---------------------------------------------------------------------------

def collect_history(data_dir: str, n: int = 12) -> list:
    """Last ``n`` runtime_metrics_store snapshots reduced to per-interval
    rates (the flusher persists CUMULATIVE stats; trends need deltas)."""
    from deepvision_tpu.web.meta_index import MetaIndex

    meta_path = os.path.join(data_dir, "meta_index.sqlite3")
    if not os.path.isfile(meta_path):
        raise SystemExit(f"no meta index at {meta_path}")
    meta = MetaIndex(meta_path)
    rows = list(meta.query(
        "SELECT payload, created_at FROM runtime_metrics_store "
        "WHERE kind = 'snapshot' ORDER BY id DESC LIMIT ?", (n + 1,)))
    rows.reverse()
    points = []
    for row in rows:
        try:
            points.append((row["created_at"], json.loads(row["payload"])))
        except (ValueError, KeyError):
            continue
    trend = []
    for (t0, a), (t1, b) in zip(points, points[1:]):
        na = (a.get("ai_calls") or {}).get("count") or 0
        nb = (b.get("ai_calls") or {}).get("count") or 0
        qa = (a.get("question_generation") or {}).get("count") or 0
        qb = (b.get("question_generation") or {}).get("count") or 0
        fa = (a.get("question_generation") or {}).get(
            "fallback_triggered") or 0
        fb = (b.get("question_generation") or {}).get(
            "fallback_triggered") or 0
        trend.append({
            "at": t1,
            "ai_calls": max(0, nb - na),
            "questions": max(0, qb - qa),
            "fallbacks": max(0, fb - fa),
            "ai_p95_ms": (b.get("ai_calls") or {}).get(
                "total_ms", {}).get("p95"),
        })
    return trend


def render_history(trend: list) -> None:
    if not trend:
        print("no snapshot history (metrics flusher writes every "
              "flush_interval while the server runs)")
        return
    print(f"{'snapshot at':<22}{'ai calls':>9}{'questions':>10}"
          f"{'fallbacks':>10}{'p95 ms':>9}")
    for p in trend:
        print(f"{str(p['at'])[:21]:<22}{p['ai_calls']:>9}"
              f"{p['questions']:>10}{p['fallbacks']:>10}"
              f"{str(p['ai_p95_ms'] or '-'):>9}")


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
    p.add_argument("--health", action="store_true",
                   help="evaluate alert rules; exit 1 on any critical")
    p.add_argument("--stale-hours", type=float, default=0.0,
                   help="flag no-activity staleness (local mode)")
    p.add_argument("--history", type=int, default=0, metavar="N",
                   help="show per-interval trends over the last N "
                        "persisted metrics snapshots (local mode)")
    args = p.parse_args()

    if args.history:
        trend = collect_history(args.data_dir, args.history)
        if args.as_json:
            print(json.dumps(trend, ensure_ascii=False, indent=1))
        else:
            render_history(trend)
        return 0

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
        if args.health:
            findings = evaluate_health(
                out, {"stale_hours": args.stale_hours})
            if args.as_json:
                print(json.dumps(findings, ensure_ascii=False, indent=1))
            else:
                for f in findings:
                    print(f"[{f['severity'].upper():<4}] {f['rule']}: "
                          f"{f['detail']}")
                if not findings:
                    print("healthy: no rule fired")
            return 1 if any(f["severity"] == "crit"
                            for f in findings) else 0
        if args.as_json:
            print(json.dumps(out, ensure_ascii=False, indent=1,
                             default=str))
        elif out["source"] == "live":
            render_live(out)
        else:
            render_local(out)
        return 0

    if args.watch > 0:
        try:
            while True:
                os.system("clear" if os.name != "nt" else "cls")
                print(time.strftime("%H:%M:%S"))
                once()
                time.sleep(args.watch)
        except KeyboardInterrupt:
            return 0
        return 0
    return once()


if __name__ == "__main__":
    sys.exit(main())
