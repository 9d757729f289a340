#!/usr/bin/env python
"""Doc gardener: read-only consistency checks across the repo's own
documentation and artifacts (reference scripts/agent_doc_gardener.py —
its checks target the reference's AGENTS/playbook/contract workflow;
these target THIS repo's doc surface).

Checks:
  1. every ENGINE_*/config key mentioned in README/ARCHITECTURE/
     PERF_NOTES exists in web/config.py (stale-flag detector)
  2. every `scripts/<name>.py` referenced in docs exists
  3. every file path cited in CLAUDE.md exists
  4. committed artifacts referenced by the harness exist and parse
     (EVAL_r*.json, BENCH_r*.json)
  5. checkpoints referenced by lane auto-resolution exist with their
     tokenizers
  6. doc TOC anchors in help.html resolve to section ids

Prints actionable findings; exit 1 on any ERROR-level finding.
  python scripts/agent_doc_gardener.py [--artifact-dir DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOCS = ["README.md", "ARCHITECTURE.md", "PERF_NOTES.md", "ROADMAP.md",
        "CLAUDE.md", ".env.example", "docs/ENGINE_MODE.md", "docs/api.md"]


def _read(path):
    try:
        with open(os.path.join(ROOT, path), encoding="utf-8") as fh:
            return fh.read()
    except OSError:
        return ""


def run_checks():
    findings = []

    def finding(level, check, message):
        findings.append({"level": level, "check": check,
                         "message": message})

    config_src = _read("deepvision_tpu/web/config.py")
    config_keys = set(re.findall(r"^([A-Z][A-Z0-9_]+)\s*[:=]", config_src,
                                 re.M))

    # 1. ENGINE_*/flag mentions in docs must exist in config.py
    for doc in DOCS:
        body = _read(doc)
        for key in set(re.findall(r"\b(ENGINE_[A-Z0-9_]+)\b(?!\.md)",
                                  body)):
            if key not in config_keys:
                finding("error", "stale-flag",
                        f"{doc} mentions {key}, not in web/config.py")

    # 2. scripts referenced in docs exist
    for doc in DOCS + ["SURVEY.md"]:
        body = _read(doc)
        for name in set(re.findall(r"scripts/([a-z0-9_]+\.py)", body)):
            if doc == "SURVEY.md":
                continue  # SURVEY cites the REFERENCE's scripts
            if not os.path.isfile(os.path.join(ROOT, "scripts", name)):
                finding("error", "missing-script",
                        f"{doc} references scripts/{name} (absent)")

    # 3. file paths cited in CLAUDE.md exist
    body = _read("CLAUDE.md")
    for path in set(re.findall(
            r"(?<![\w/.])((?:deepvision_tpu|scripts|resources|tests)"
            r"/[\w./-]+)",
            body)):
        path = path.rstrip(".")
        if "*" in path:
            continue
        if not os.path.exists(os.path.join(ROOT, path)):
            finding("error", "claude-path",
                    f"CLAUDE.md cites {path} (absent)")

    # 4. committed artifacts parse
    for pattern in ("EVAL_r*.json", "BENCH_r*.json", "MULTICHIP_r*.json"):
        for path in glob.glob(os.path.join(ROOT, pattern)):
            try:
                with open(path, encoding="utf-8") as fh:
                    json.load(fh)
            except Exception as e:  # noqa: BLE001
                finding("error", "artifact-parse",
                        f"{os.path.basename(path)} unreadable: {e}")

    # 5. lane auto-resolution checkpoints + tokenizers
    pairs = [("dv-mini", "dv_bpe_8k.json"), ("dv-fast", "dv_bpe_16k.json"),
             ("dv-base", "dv_bpe_16k.json")]
    for model, tok in pairs:
        ck = os.path.join(ROOT, "resources", "checkpoints", f"{model}.npz")
        tk = os.path.join(ROOT, "resources", "tokenizer", tok)
        if os.path.isfile(ck) and not os.path.isfile(tk):
            finding("error", "tokenizer-missing",
                    f"{model}.npz present but {tok} absent")
        if not os.path.isfile(ck):
            finding("warn", "checkpoint-missing",
                    f"resources/checkpoints/{model}.npz absent "
                    "(engine mode falls back)")

    # 6. help.html TOC anchors resolve
    help_html = _read("deepvision_tpu/web/static/help.html")
    ids = set(re.findall(r'id="([\w-]+)"', help_html))
    for target in set(re.findall(r'data-target="([\w-]+)"', help_html)):
        if target not in ids:
            finding("error", "help-anchor",
                    f"help.html TOC targets #{target} (no such id)")

    return findings


def main() -> int:
    ap = argparse.ArgumentParser(description="doc consistency gardener")
    ap.add_argument("--artifact-dir", default=None)
    args = ap.parse_args()

    findings = run_checks()
    errors = [f for f in findings if f["level"] == "error"]
    for f in findings:
        icon = "❌" if f["level"] == "error" else "⚠️"
        print(f"{icon} [{f['check']}] {f['message']}")
    print(f"DOC GARDENER: {len(errors)} errors, "
          f"{len(findings) - len(errors)} warnings")
    if args.artifact_dir:
        os.makedirs(args.artifact_dir, exist_ok=True)
        out = os.path.join(args.artifact_dir,
                           f"doc-gardening-{int(time.time())}.json")
        with open(out, "w", encoding="utf-8") as fh:
            json.dump({"findings": findings,
                       "ok": not errors}, fh, ensure_ascii=False, indent=1)
        print(f"artifact: {out}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
