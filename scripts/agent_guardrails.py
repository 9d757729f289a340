#!/usr/bin/env python
"""Critical-invariant gate (reference scripts/agent_guardrails.py:31).

Collapses the project's security/ops invariants into one fixed command:
anonymous-write blocking, guard-matrix completeness, license gate, level
capability edges, instance-scope isolation, share boundaries, ownership
migration safety, and the hardening sweep — the suites CI and a ship
check must always run together, independent of the full suite's wall
time.

  python scripts/agent_guardrails.py          # run the gate
  python scripts/agent_guardrails.py --list   # show what it enforces
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (pytest node or file, invariant label)
CASES = [
    ("tests/test_guard_matrix.py",
     "每个写路由都已分类并被守卫（完整性强制）"),
    ("tests/test_security_regression.py",
     "匿名写拦截 / 跨用户越权 / License 门禁 / Cookie 完整性"),
    ("tests/test_security_hardening.py",
     "路径穿越 / IDOR 派生资源 / 注入惰性 / 滥用限流 / 提权"),
    ("tests/test_levels_matrix.py",
     "等级能力矩阵（模式/导出/分享/会话上限）"),
    ("tests/test_lifecycle_matrix.py::test_share_lifecycle_public_read_and_owner_only_create",
     "分享边界：匿名只读、仅属主可发、token 不可猜"),
    ("tests/test_ops_scripts.py::test_ownership_cli_dry_run_changes_nothing",
     "归属迁移 dry-run 零副作用"),
    ("tests/test_ops_scripts.py::test_ownership_cli_apply_and_rollback",
     "归属迁移 apply/rollback 可逆"),
    ("tests/test_app_api.py",
     "主链路回归（鉴权→会话→报告→方案页）"),
]


def main() -> int:
    p = argparse.ArgumentParser(description="invariant gate")
    p.add_argument("--list", action="store_true")
    args = p.parse_args()

    if args.list:
        print("Guardrail gate (fixed invariant suite)")
        for i, (target, label) in enumerate(CASES, 1):
            print(f"{i}. {label}: {target}")
        return 0

    cmd = [sys.executable, "-m", "pytest", "-q", "--no-header",
           "-p", "no:cacheprovider"] + [t for t, _ in CASES]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    wall = time.time() - t0
    tail = proc.stdout.strip().splitlines()[-4:]
    for line in tail:
        print(line)
    ok = proc.returncode == 0
    print(f"{'GUARDRAILS OK' if ok else 'GUARDRAILS FAILED'} ({wall:.1f}s)")
    if not ok:
        print(proc.stdout[-3000:])
        print(proc.stderr[-1500:], file=sys.stderr)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
