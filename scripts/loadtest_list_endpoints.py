#!/usr/bin/env python
"""Threaded load test of the list endpoints with SMS test login
(reference scripts/loadtest_list_endpoints.py:1-257).

Measures per-endpoint p50/p95/p99, status-code distribution, ETag/304
conditional-GET hit rate, and 429 shed/Retry-After behavior; --ramp runs
the same workload at increasing concurrency stages to find the knee.

  python scripts/loadtest_list_endpoints.py --base-url http://host:8899
  python scripts/loadtest_list_endpoints.py --ramp 1,4,16 --etag --json
"""

from __future__ import annotations

import argparse
import collections
import json
import statistics
import sys
import threading
import time

import requests


def pct(values, p):
    if not values:
        return 0.0
    vals = sorted(values)
    return vals[min(len(vals) - 1, int(round(p / 100 * (len(vals) - 1))))]


def login(base_url: str, phone: str, code: str):
    session = requests.Session()
    session.post(f"{base_url}/api/auth/sms/send-code",
                 json={"phone": phone}, timeout=10)
    r = session.post(
        f"{base_url}/api/auth/login/code",
        json={"phone": phone, "code": code}, timeout=10,
    )
    if r.status_code != 200:
        raise SystemExit(f"login failed: {r.status_code} {r.text}")
    return session.cookies


def run_stage(args, cookies, n_threads: int) -> dict:
    endpoints = args.endpoints.split(",")
    latencies = {e: [] for e in endpoints}
    statuses = collections.Counter()
    etag_hits = collections.Counter()
    retry_after_seen = []
    lock = threading.Lock()
    per_thread = max(1, args.requests // n_threads)

    def worker():
        s = requests.Session()
        s.cookies.update(cookies)
        etags = {}
        for _ in range(per_thread):
            for path in endpoints:
                url = f"{args.base_url}{path}?page=1&page_size=20"
                headers = {}
                if args.etag and path in etags:
                    headers["If-None-Match"] = etags[path]
                t0 = time.time()
                try:
                    resp = s.get(url, timeout=30, headers=headers)
                    code = resp.status_code
                except requests.RequestException:
                    code = -1
                    resp = None
                ms = (time.time() - t0) * 1e3
                with lock:
                    statuses[code] += 1
                    if code == 200:
                        latencies[path].append(ms)
                        if resp is not None and resp.headers.get("ETag"):
                            etags[path] = resp.headers["ETag"]
                    elif code == 304:
                        etag_hits[path] += 1
                        latencies[path].append(ms)
                    elif code == 429 and resp is not None:
                        ra = resp.headers.get("Retry-After")
                        if ra:
                            retry_after_seen.append(float(ra))

    t0 = time.time()
    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    total = sum(statuses.values())
    out = {
        "threads": n_threads,
        "requests": total,
        "seconds": round(wall, 2),
        "req_per_s": round(total / wall, 1) if wall > 0 else None,
        "status": dict(statuses),
        "endpoints": {},
    }
    for path, vals in latencies.items():
        if vals:
            out["endpoints"][path] = {
                "n": len(vals),
                "p50_ms": round(pct(vals, 50), 1),
                "p95_ms": round(pct(vals, 95), 1),
                "p99_ms": round(pct(vals, 99), 1),
                "mean_ms": round(statistics.mean(vals), 1),
            }
            if args.etag:
                out["endpoints"][path]["etag_304"] = etag_hits.get(path, 0)
    if retry_after_seen:
        out["retry_after"] = {
            "count": len(retry_after_seen),
            "values": sorted(set(retry_after_seen)),
        }
    return out


def main():
    p = argparse.ArgumentParser(description="list-endpoint loadtest")
    p.add_argument("--base-url", default="http://127.0.0.1:8899")
    p.add_argument("--phone", default="13900009999")
    p.add_argument("--code", default="666666")
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--requests", type=int, default=200,
                   help="total requests per stage (split across threads)")
    p.add_argument("--endpoints", default="/api/sessions,/api/reports")
    p.add_argument("--etag", action="store_true",
                   help="send If-None-Match on repeat GETs (304 rate)")
    p.add_argument("--ramp", default="",
                   help="comma list of thread counts, e.g. 1,4,16")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    cookies = login(args.base_url, args.phone, args.code)
    stages = ([int(x) for x in args.ramp.split(",") if x]
              if args.ramp else [args.threads])
    results = [run_stage(args, cookies, n) for n in stages]

    if args.json:
        print(json.dumps({"stages": results}, ensure_ascii=False, indent=1))
        return 0
    for res in results:
        print(f"\n== {res['threads']} threads: {res['requests']} requests "
              f"in {res['seconds']}s ({res['req_per_s']} req/s)")
        print(f"   status: {res['status']}")
        for path, ep in res["endpoints"].items():
            extra = (f" 304s={ep['etag_304']}" if "etag_304" in ep else "")
            print(f"   {path}: p50={ep['p50_ms']}ms p95={ep['p95_ms']}ms "
                  f"p99={ep['p99_ms']}ms n={ep['n']}{extra}")
        if "retry_after" in res:
            print(f"   429 Retry-After seen: {res['retry_after']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
