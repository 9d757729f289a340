#!/usr/bin/env python
"""Threaded load test of /api/sessions + /api/reports with SMS test login,
status-code distribution, p50/p95/p99 (reference
scripts/loadtest_list_endpoints.py:1-257)."""

from __future__ import annotations

import argparse
import collections
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


def main():
    p = argparse.ArgumentParser(description="list-endpoint loadtest")
    p.add_argument("--base-url", default="http://127.0.0.1:8899")
    p.add_argument("--phone", default="13900009999")
    p.add_argument("--code", default="666666")
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--requests", type=int, default=200)
    args = p.parse_args()

    session = requests.Session()
    session.post(f"{args.base_url}/api/auth/sms/send-code",
                 json={"phone": args.phone}, timeout=10)
    r = session.post(
        f"{args.base_url}/api/auth/login/code",
        json={"phone": args.phone, "code": args.code}, timeout=10,
    )
    if r.status_code != 200:
        print(f"login failed: {r.status_code} {r.text}", file=sys.stderr)
        return 1
    cookies = session.cookies

    latencies = {"/api/sessions": [], "/api/reports": []}
    statuses = collections.Counter()
    lock = threading.Lock()
    per_thread = args.requests // args.threads

    def worker():
        s = requests.Session()
        s.cookies.update(cookies)
        for i in range(per_thread):
            for path in ("/api/sessions", "/api/reports"):
                t0 = time.time()
                try:
                    resp = s.get(f"{args.base_url}{path}?page=1&page_size=20",
                                 timeout=30)
                    code = resp.status_code
                except requests.RequestException:
                    code = -1
                ms = (time.time() - t0) * 1e3
                with lock:
                    statuses[code] += 1
                    if code == 200:
                        latencies[path].append(ms)

    t0 = time.time()
    threads = [threading.Thread(target=worker)
               for _ in range(args.threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    total = sum(statuses.values())
    print(f"total {total} requests in {wall:.1f}s "
          f"({total / wall:.1f} req/s)")
    print("status distribution:", dict(statuses))
    for path, vals in latencies.items():
        if vals:
            print(f"{path}: p50={pct(vals, 50):.1f}ms "
                  f"p95={pct(vals, 95):.1f}ms p99={pct(vals, 99):.1f}ms "
                  f"mean={statistics.mean(vals):.1f}ms n={len(vals)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
