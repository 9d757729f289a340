#!/usr/bin/env python
"""CI summary generator (reference scripts/agent_ci_summary.py:1).

Collapses the latest run artifacts — harness runs, test-runner summaries,
smoke results, driver bench JSONs — into one short markdown block, so CI
shows conclusions instead of just uploading artifacts.

  python scripts/agent_ci_summary.py                # print markdown
  python scripts/agent_ci_summary.py --out s.md     # also write a file
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


def _latest(pattern):
    paths = sorted(glob.glob(os.path.join(ROOT, pattern)))
    return (_read(paths[-1]), paths[-1]) if paths else (None, None)


def render() -> str:
    lines = ["# CI summary", ""]

    harness, hp = _latest("artifacts/harness-runs/harness-*.json")
    if harness:
        icon = "✅" if harness.get("ok") else "❌"
        steps = harness.get("results", [])
        lines += [f"## Harness {icon} (`{os.path.relpath(hp, ROOT)}`)", ""]
        for s in steps:
            si = "✅" if s.get("passed") else "❌"
            lines.append(f"- {si} `{s.get('step')}` {s.get('seconds')}s")
        lines.append("")

    tests = _read(os.path.join(ROOT, "artifacts/test-runs/latest.json"))
    if tests:
        t = tests.get("totals", {})
        icon = "✅" if tests.get("returncode") == 0 else "❌"
        lines += [
            f"## Tests {icon}",
            "",
            f"- {t.get('tests', '?')} tests, {t.get('failures', 0)} "
            f"failures, {t.get('skipped', 0)} skipped in "
            f"{tests.get('wall_seconds', '?')}s "
            f"({t.get('suites', '?')} suites)",
        ]
        for fid in tests.get("failed", [])[:8]:
            lines.append(f"- ❌ `{fid}`")
        slow = sorted(tests.get("suites", []),
                      key=lambda r: -r["seconds"])[:3]
        if slow:
            lines.append("- slowest: " + ", ".join(
                f"`{r['suite']}` {r['seconds']}s" for r in slow))
        lines.append("")

    smoke = _read(os.path.join(ROOT, "artifacts/smoke/latest.json"))
    if smoke:
        icon = "✅" if smoke.get("ok") else "❌"
        lines += [f"## Smoke {icon} — {smoke.get('seconds')}s", ""]

    benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if benches:
        b = _read(benches[-1]) or {}
        parsed = b.get("parsed") or {}
        if parsed:
            n = re.search(r"BENCH_r(\d+)", benches[-1])
            lines += [
                f"## Bench (round {n.group(1) if n else '?'})",
                "",
                f"- TTFT p50 **{parsed.get('value')}ms** @"
                f"{parsed.get('concurrent_sessions')} sessions "
                f"(p95 {parsed.get('ttft_p95_ms')}ms)",
                f"- {parsed.get('requests_per_min')} req/min, "
                f"{parsed.get('reports_per_min')} reports/min "
                f"({parsed.get('report_draft_tokens_p50')} draft tokens p50)",
                f"- prefix cache: {parsed.get('prefix_cache_question')}",
                f"- compile {parsed.get('compile_s')}s, "
                f"backend-up {parsed.get('backend_up_s')}s",
                "",
            ]

    ev, ep = _latest("EVAL_r*.json")
    if ev:
        lines += [f"## Generation quality (`{os.path.basename(ep)}`)", ""]
        for model, m in sorted(ev.items()):
            if not isinstance(m, dict) or "n" not in m:
                continue
            parts = [f"schema-valid {m.get('schema_valid_pct')}%"]
            if m.get("section_complete_pct") is not None:
                parts.append(f"sections {m['section_complete_pct']}%")
            if m.get("refs_resolve_pct") is not None:
                parts.append(f"refs-resolve {m['refs_resolve_pct']}%")
            if m.get("distinct_question_pct") is not None:
                parts.append(f"distinct {m['distinct_question_pct']}%")
            lines.append(f"- `{model}`: " + ", ".join(parts)
                         + f" (n={m.get('n')})")
        lines.append("")

    if len(lines) == 2:
        lines.append("_no artifacts found — run the harness or tests first_")
    return "\n".join(lines)


def main() -> int:
    p = argparse.ArgumentParser(description="CI summary")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    md = render()
    print(md)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(md + "\n")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
