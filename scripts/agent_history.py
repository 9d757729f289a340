#!/usr/bin/env python
"""Run-history index + diff (reference scripts/agent_history.py:1).

One view over everything the repo records about itself across time:
harness runs, test-runner summaries, smoke runs, driver bench rounds
(BENCH_r*.json) and the build log (PROGRESS.jsonl).

  python scripts/agent_history.py list [--kind test-run|harness|bench|smoke]
  python scripts/agent_history.py diff            # last two test runs
  python scripts/agent_history.py bench           # bench metric trend
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(path):
    try:
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    except Exception:  # noqa: BLE001
        return None


def collect():
    """All runs as (kind, key, payload, path), newest last per kind."""
    runs = []
    for p in sorted(glob.glob(
            os.path.join(ROOT, "artifacts/harness-runs/harness-*.json"))):
        runs.append(("harness", os.path.basename(p), _read(p), p))
    for p in sorted(glob.glob(
            os.path.join(ROOT, "artifacts/test-runs/*/summary.json"))):
        runs.append(("test-run", os.path.basename(os.path.dirname(p)),
                     _read(p), p))
    for p in sorted(glob.glob(
            os.path.join(ROOT, "artifacts/smoke/smoke-*.json"))):
        runs.append(("smoke", os.path.basename(p), _read(p), p))
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        runs.append(("bench", os.path.basename(p), _read(p), p))
    return runs


def cmd_list(kind=None) -> int:
    rows = [r for r in collect() if kind in (None, r[0])]
    if not rows:
        print("no recorded runs")
        return 0
    for k, key, payload, _ in rows:
        line = f"{k:9s} {key:28s}"
        if not isinstance(payload, dict):
            print(line + " (unreadable)")
            continue
        if k == "harness":
            line += " ok=" + str(payload.get("ok"))
        elif k == "test-run":
            t = payload.get("totals", {})
            line += (f" {t.get('tests', '?')} tests"
                     f" {t.get('failures', 0)} fail"
                     f" {payload.get('wall_seconds', '?')}s")
        elif k == "smoke":
            line += f" ok={payload.get('ok')} {payload.get('seconds')}s"
        elif k == "bench":
            parsed = payload.get("parsed") or {}
            line += (f" ttft={parsed.get('value')}ms"
                     f" req/min={parsed.get('requests_per_min')}"
                     f" reports/min={parsed.get('reports_per_min')}")
        print(line)
    return 0


def cmd_diff() -> int:
    runs = [r for r in collect() if r[0] == "test-run"
            and isinstance(r[2], dict) and r[2].get("suites")]
    if len(runs) < 2:
        print("need two recorded test runs to diff")
        return 1
    (_, ka, a, _), (_, kb, b, _) = runs[-2], runs[-1]
    fa, fb = set(a.get("failed", [])), set(b.get("failed", []))
    print(f"diff {ka} -> {kb}")
    for fid in sorted(fb - fa):
        print(f"  NEW FAILURE {fid}")
    for fid in sorted(fa - fb):
        print(f"  fixed       {fid}")
    if not (fa ^ fb):
        print("  failures unchanged")
    ta = {r["suite"]: r for r in a["suites"]}
    deltas = []
    for r in b["suites"]:
        old = ta.get(r["suite"])
        if old and old["seconds"] > 0.5:
            deltas.append((r["seconds"] - old["seconds"], r["suite"],
                           old["seconds"], r["seconds"]))
    for d, suite, olds, news in sorted(deltas, key=lambda x: -abs(x[0]))[:5]:
        if abs(d) >= 0.5:
            print(f"  {d:+7.1f}s  {suite} ({olds:.1f} -> {news:.1f})")
    wa, wb = a.get("wall_seconds"), b.get("wall_seconds")
    if wa and wb:
        print(f"  wall: {wa}s -> {wb}s")
    return 0


BENCH_KEYS = ["value", "ttft_p95_ms", "requests_per_min", "reports_per_min",
              "report_draft_tokens_p50", "doc_ingest_pages_per_s",
              "compile_s", "backend_up_s"]


def cmd_bench() -> int:
    rows = []
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        payload = _read(p) or {}
        parsed = payload.get("parsed") or {}
        n = re.search(r"BENCH_r(\d+)", p)
        rows.append((n.group(1) if n else "?", parsed))
    if not rows:
        print("no bench rounds recorded")
        return 0
    header = "round  " + "  ".join(f"{k[:16]:>16s}" for k in BENCH_KEYS)
    print(header)
    for rnd, parsed in rows:
        cells = []
        for k in BENCH_KEYS:
            v = parsed.get(k)
            cells.append(f"{v if v is not None else '-':>16}")
        print(f"r{rnd:<5s} " + "  ".join(cells))
    # prefix cache trend (the round-4 headline lever)
    print("\nprefix_cache_question per round:")
    for rnd, parsed in rows:
        print(f"  r{rnd}: {parsed.get('prefix_cache_question')}")
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description="run history")
    sub = p.add_subparsers(dest="cmd")
    lp = sub.add_parser("list")
    lp.add_argument("--kind", default=None,
                    choices=["harness", "test-run", "smoke", "bench"])
    sub.add_parser("diff")
    sub.add_parser("bench")
    args = p.parse_args()
    if args.cmd == "diff":
        return cmd_diff()
    if args.cmd == "bench":
        return cmd_bench()
    return cmd_list(getattr(args, "kind", None))


if __name__ == "__main__":
    import sys

    sys.exit(main())
