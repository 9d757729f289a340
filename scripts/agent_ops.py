#!/usr/bin/env python
"""Read-only ops dashboard (reference scripts/agent_ops.py:1, 527 LoC:
status / phase / task-gap / latest-runs views over harness artifacts).

Aggregates this deployment's operational surfaces into one entry:

  status        everything below in one markdown view (default)
  latest-runs   newest harness/eval artifacts + their verdicts
  data          data-dir inventory: sessions/reports/users/scenarios,
                operations backups, disk footprint
  models        checkpoint + tokenizer inventory with staleness vs the
                corpus/trainer inputs
  bench         last bench JSONs (BENCH_r*.json) vs BASELINE targets

Default read-only; --write-artifacts persists JSON+markdown under
artifacts/ops/ with a latest pointer (reference write_artifacts :399).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mtime(path):
    try:
        return os.path.getmtime(path)
    except OSError:
        return None


def _age(ts):
    if ts is None:
        return "-"
    mins = (time.time() - ts) / 60
    if mins < 90:
        return f"{mins:.0f}m ago"
    if mins < 60 * 36:
        return f"{mins / 60:.1f}h ago"
    return f"{mins / 1440:.1f}d ago"


def _du(path) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def collect_data(data_dir: str) -> dict:
    out = {"data_dir": os.path.abspath(data_dir), "exists":
           os.path.isdir(data_dir)}
    if not out["exists"]:
        return out
    meta_path = os.path.join(data_dir, "meta_index.sqlite3")
    counts = {}
    if os.path.isfile(meta_path):
        from deepvision_tpu.web.meta_index import MetaIndex

        meta = MetaIndex(meta_path)
        for table in ("session_index", "report_index",
                      "custom_scenarios", "export_asset_store",
                      "ownership_migration_log"):
            try:
                counts[table] = meta.query_one(
                    f"SELECT COUNT(*) AS n FROM {table}")["n"]
            except Exception:
                counts[table] = None
    auth_db = os.path.join(data_dir, "auth", "auth.sqlite3")
    if os.path.isfile(auth_db):
        import sqlite3

        conn = sqlite3.connect(auth_db)
        counts["users"] = conn.execute(
            "SELECT COUNT(*) FROM users").fetchone()[0]
        conn.close()
    ops_dir = os.path.join(data_dir, "operations")
    backups = sorted(glob.glob(os.path.join(ops_dir, "*")))[-5:] \
        if os.path.isdir(ops_dir) else []
    out.update({
        "counts": counts,
        "disk_bytes": _du(data_dir),
        "recent_operations": [os.path.basename(b) for b in backups],
    })
    return out


def collect_models() -> dict:
    ckpt_dir = os.path.join(ROOT, "resources", "checkpoints")
    tok_dir = os.path.join(ROOT, "resources", "tokenizer")
    corpus_builder = os.path.join(ROOT, "scripts", "build_corpus.py")
    prompt_formats = os.path.join(
        ROOT, "deepvision_tpu", "web", "runtime", "prompt_formats.py")
    inputs_mtime = max(filter(None, (_mtime(corpus_builder),
                                     _mtime(prompt_formats))), default=None)
    models = []
    for path in sorted(glob.glob(os.path.join(ckpt_dir, "*.npz"))):
        if path.endswith(".best"):
            continue
        ts = _mtime(path)
        models.append({
            "name": os.path.basename(path),
            "mb": round(os.path.getsize(path) / 1e6, 1),
            "trained": _age(ts),
            # a checkpoint older than the prompt/corpus builders is
            # serving out-of-distribution (the round-2 advisor finding)
            "stale_vs_prompts": bool(inputs_mtime and ts
                                     and ts < inputs_mtime),
        })
    tokenizers = [os.path.basename(p) for p in
                  sorted(glob.glob(os.path.join(tok_dir, "*.json")))]
    return {"checkpoints": models, "tokenizers": tokenizers}


def collect_latest_runs() -> dict:
    runs = []
    for pattern, kind in (("artifacts/harness-runs/*.json", "harness"),
                          ("artifacts/ops/*.json", "ops")):
        for path in sorted(glob.glob(os.path.join(ROOT, pattern)))[-3:]:
            try:
                with open(path, encoding="utf-8") as fh:
                    payload = json.load(fh)
            except (OSError, ValueError):
                continue
            runs.append({
                "kind": kind, "file": os.path.basename(path),
                "age": _age(_mtime(path)),
                "ok": payload.get("ok"),
                "profile": payload.get("profile"),
            })
    return {"runs": runs}


def collect_bench() -> dict:
    targets = {"next_question_ttft_p50": ("<", 1500.0),
               "reports_per_min": (">=", 20.0),
               "report_draft_tokens_p50": (">=", 800.0)}
    benches = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        try:
            with open(path, encoding="utf-8") as fh:
                b = json.load(fh)
        except (OSError, ValueError):
            continue
        # driver-wrapped bench artifacts embed the JSON line in "tail"
        if "tail" in b and "value" not in b:
            import re as _re

            m = _re.search(r'\{"metric".*\}', b.get("tail") or "")
            if not m:
                continue
            try:
                b = json.loads(m.group(0))
            except ValueError:
                continue
        verdicts = {}
        for key, (op, target) in targets.items():
            val = b.get(key) if key != "next_question_ttft_p50" \
                else b.get("value")
            if val is None:
                verdicts[key] = "n/a"
            elif op == "<":
                verdicts[key] = "ok" if val < target else "MISS"
            else:
                verdicts[key] = "ok" if val >= target else "MISS"
        benches.append({"file": os.path.basename(path),
                        "ttft_p50_ms": b.get("value"),
                        "reports_per_min": b.get("reports_per_min"),
                        "draft_tokens_p50":
                        b.get("report_draft_tokens_p50"),
                        "verdicts": verdicts})
    return {"benches": benches}


def build_payload(data_dir: str) -> dict:
    return {
        "kind": "ops_status",
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                      time.gmtime()),
        "data": collect_data(data_dir),
        "models": collect_models(),
        "latest_runs": collect_latest_runs(),
        "bench": collect_bench(),
    }


def render_markdown(p: dict) -> str:
    out = [f"# ops status · {p['generated_at']}", ""]
    d = p["data"]
    out.append(f"## data · {d['data_dir']}")
    if d.get("exists"):
        for k, v in (d.get("counts") or {}).items():
            out.append(f"- {k}: {v}")
        out.append(f"- disk: {d['disk_bytes'] / 1e6:.1f} MB")
        if d.get("recent_operations"):
            out.append("- recent operations: "
                       + ", ".join(d["recent_operations"]))
    else:
        out.append("- (no data dir)")
    out.append("")
    out.append("## models")
    for m in p["models"]["checkpoints"]:
        stale = "  ⚠ trained before current prompt formats" \
            if m["stale_vs_prompts"] else ""
        out.append(f"- {m['name']}  {m['mb']} MB  {m['trained']}{stale}")
    out.append("- tokenizers: " + ", ".join(p["models"]["tokenizers"]))
    out.append("")
    out.append("## latest runs")
    runs = p["latest_runs"]["runs"]
    if runs:
        for r in runs:
            flag = {"True": "✅", "False": "❌"}.get(str(r["ok"]), "·")
            out.append(f"- {flag} [{r['kind']}] {r['file']} "
                       f"({r['age']}, profile={r['profile']})")
    else:
        out.append("- (no artifacts yet — run scripts/agent_harness.py)")
    out.append("")
    out.append("## bench vs BASELINE targets")
    for b in p["bench"]["benches"]:
        verdict = " ".join(f"{k.split('_')[0]}={v}"
                           for k, v in b["verdicts"].items())
        out.append(f"- {b['file']}: ttft_p50={b['ttft_p50_ms']}ms "
                   f"reports/min={b['reports_per_min']} "
                   f"draft_tok_p50={b['draft_tokens_p50']}  [{verdict}]")
    if not p["bench"]["benches"]:
        out.append("- (no BENCH_r*.json yet)")
    return "\n".join(out) + "\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="read-only ops dashboard")
    ap.add_argument("view", nargs="?", default="status",
                    choices=["status", "latest-runs", "data", "models",
                             "bench"])
    ap.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", os.path.join(ROOT, "data")))
    ap.add_argument("--json", action="store_true",
                    help="print JSON instead of markdown")
    ap.add_argument("--write-artifacts", action="store_true",
                    help="persist JSON+markdown under artifacts/ops/")
    args = ap.parse_args(argv)

    payload = build_payload(args.data_dir)
    view_map = {"latest-runs": "latest_runs", "data": "data",
                "models": "models", "bench": "bench"}
    if args.view != "status":
        print(json.dumps(payload[view_map[args.view]],
                         ensure_ascii=False, indent=2))
        return 0
    if args.json:
        print(json.dumps(payload, ensure_ascii=False, indent=2))
    else:
        print(render_markdown(payload), end="")
    if args.write_artifacts:
        art = os.path.join(ROOT, "artifacts", "ops")
        os.makedirs(art, exist_ok=True)
        tag = time.strftime("%Y%m%d-%H%M%S", time.gmtime())
        with open(os.path.join(art, f"ops-{tag}.json"), "w",
                  encoding="utf-8") as fh:
            json.dump(payload, fh, ensure_ascii=False, indent=1)
        with open(os.path.join(art, "latest.md"), "w",
                  encoding="utf-8") as fh:
            fh.write(render_markdown(payload))
        print(f"\nartifacts written under {art}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
