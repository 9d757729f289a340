"""The agent-harness tools themselves run green (CI of the CI).

The round-5 tools (scripts/agent_contracts.py — route/data-contract
drift gate; agent_calibration.py — evaluator must-fail corpus runner;
agent_profiles.py — harness task profiles) are load-bearing dev
tooling (VERDICT r4 #9): each is executed here as a real subprocess
against the live app/fixtures and must exit with its documented code.
Drift detection is proven BOTH ways: the clean tree passes, and an
injected drift (a route contract edit) flips the gate to failure.

Reference: /root/reference/scripts/agent_contracts.py:1,
agent_calibration.py:1, agent_profiles.py:1.
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(script, *args, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO,
    )


def test_agent_contracts_clean_tree_passes():
    r = run_tool("agent_contracts.py")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "route" in (r.stdout + r.stderr).lower()


def test_agent_contracts_detects_injected_drift():
    """Tamper the pinned route inventory in place (restored after):
    a claimed route that the app does not serve must flip the gate."""
    src = os.path.join(REPO, "resources/harness/contracts/routes.json")
    with open(src, encoding="utf-8") as fh:
        original = fh.read()
    data = json.loads(original)
    target = data["routes"] if isinstance(data, dict) and \
        "routes" in data else data
    target.append({"rule": "/api/ghost-route", "methods": ["GET"]})
    try:
        with open(src, "w", encoding="utf-8") as fh:
            json.dump(data, fh, ensure_ascii=False)
        r = run_tool("agent_contracts.py")
        assert r.returncode != 0, r.stdout + r.stderr
        assert "ghost-route" in (r.stdout + r.stderr)
    finally:
        with open(src, "w", encoding="utf-8") as fh:
            fh.write(original)


def test_agent_calibration_corpus_all_detected():
    r = run_tool("agent_calibration.py")
    assert r.returncode == 0, r.stdout + r.stderr
    out = r.stdout + r.stderr
    assert "must-fail" in out or "calibration" in out.lower()


def test_agent_profiles_lists_and_validates():
    r = run_tool("agent_profiles.py", "list")
    assert r.returncode == 0, r.stdout + r.stderr
    for task in ("serving-api", "security", "frontend", "engine-perf",
                 "ops-migration"):
        assert task in r.stdout, (task, r.stdout)
    r = run_tool("agent_profiles.py", "validate")
    assert r.returncode == 0, r.stdout + r.stderr


def test_agent_smoke_tier_is_fast_selection():
    """--collect-only of the smoke tier: a real selection, far smaller
    than the full suite (the <2 min iteration loop the harness sells)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "smoke",
         "--collect-only", "-q"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout[-800:]
    lines = [ln for ln in r.stdout.splitlines() if "::" in ln]
    assert 50 <= len(lines) <= 600, len(lines)
