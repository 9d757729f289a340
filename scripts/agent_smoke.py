#!/usr/bin/env python
"""Minimal main-path regression entry (reference scripts/agent_smoke.py:30).

Runs the curated `smoke` marker tier — auth, session lifecycle, report
contract, solution payload, security boundaries, prefix cache, frontend
journeys — in a fixed <2-minute command so iteration never waits on the
full suite (which exceeds CI-sized windows; VERDICT r3 weak #8).

  python scripts/agent_smoke.py           # run the tier
  python scripts/agent_smoke.py --list    # show what it covers
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Labels for the suites the marker tier covers (modules carry
# ``pytestmark = pytest.mark.smoke``); the listing mirrors the
# reference's labeled SuiteCases.
COVERAGE = [
    ("tests/test_app_api.py", "主链路：鉴权、会话、访谈、报告、方案页"),
    ("tests/test_security_regression.py", "安全边界：匿名写拦截、越权、scope"),
    ("tests/test_guard_matrix.py", "守卫矩阵：每个写路由已分类"),
    ("tests/test_data_contracts.py", "Appendix-A 数据契约（A.1-A.7）"),
    ("tests/test_frontend_js.py", "前端 minijs 旅程（登录→访谈→报告→方案）"),
    ("tests/test_question_strategy.py", "问题生成策略与提示词构建"),
    ("tests/test_prompt_formats.py", "训练/服务共享提示词格式"),
    ("tests/test_prefix_cache.py", "radix 前缀缓存（页共享/引用计数）"),
    ("tests/test_db_compat.py", "DB 兼容层（qmark/DDL）"),
    ("tests/test_web_http.py", "HTTP 层（分页/ETag/429）"),
    ("tests/test_scenarios_loader.py", "场景加载（内置+自定义）"),
    ("tests/test_levels_matrix.py", "用户等级能力矩阵"),
]


def main() -> int:
    p = argparse.ArgumentParser(description="fast smoke tier")
    p.add_argument("--list", action="store_true",
                   help="list covered suites without running")
    p.add_argument("--artifact-dir", default=None,
                   help="write a JSON result artifact here")
    args = p.parse_args()

    if args.list:
        print("Suite: smoke (pytest -m smoke)")
        for i, (path, label) in enumerate(COVERAGE, 1):
            print(f"{i:2d}. {label}: {path}")
        return 0

    cmd = [sys.executable, "-m", "pytest", "tests/", "-m", "smoke",
           "-q", "--no-header", "-p", "no:cacheprovider"]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    wall = time.time() - t0
    tail = proc.stdout.strip().splitlines()[-3:]
    ok = proc.returncode == 0
    print(proc.stdout[-4000:])
    if proc.stderr.strip():
        print(proc.stderr[-2000:], file=sys.stderr)
    print(f"{'SMOKE OK' if ok else 'SMOKE FAILED'} ({wall:.1f}s)")
    if args.artifact_dir:
        os.makedirs(args.artifact_dir, exist_ok=True)
        path = os.path.join(args.artifact_dir,
                            f"smoke-{int(time.time())}.json")
        payload = {"kind": "smoke", "ok": ok,
                   "seconds": round(wall, 1), "tail": tail,
                   "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, ensure_ascii=False, indent=1)
        with open(os.path.join(args.artifact_dir, "latest.json"),
                  "w", encoding="utf-8") as fh:
            json.dump(payload, fh, ensure_ascii=False, indent=1)
        print(f"artifact: {path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
