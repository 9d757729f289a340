"""Shared machinery for the report/solution fidelity snapshot suite
(tests/test_fidelity_snapshots.py).

The reference pins its derivation behavior with a fixture corpus
(/root/reference/tests/fixtures/report_solution/ consumed by
test_solution_payload.py:1); this module is our equivalent: it runs a
session fixture through the REAL pipeline (generate_report_v3 with the
deterministic template gateway -> render_report_markdown ->
build_solution_payload) and reduces the outputs to stable structural
snapshots. Volatile values (timestamps, fingerprints, wall-clock
timings) are stripped; everything that encodes derivation behavior —
heading sequence, section/mermaid/refs structure, A.5 key shapes, list
counts, quality decisions — is kept, so any derivation regression
changes the snapshot and fails the diff.

Regenerate committed snapshots after an INTENTIONAL change with:
    UPDATE_SNAPSHOTS=1 python -m pytest tests/test_fidelity_snapshots.py
then review the snapshot diff like any other code change.
"""

import json
import os
import re

from deepvision_tpu.engine.client import ModelGateway
from deepvision_tpu.web.runtime.report_v3 import generate_report_v3
from deepvision_tpu.web.runtime.solution import build_solution_payload

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures",
                           "report_solution")
SESSION_DIR = os.path.join(FIXTURE_DIR, "sessions")
SNAPSHOT_DIR = os.path.join(FIXTURE_DIR, "snapshots")

# Every key the solution payload contract requires (SURVEY Appendix A.5;
# reference _build_solution_payload_from_snapshot web/server.py:43078).
A5_KEYS = (
    "report_name", "title", "subtitle", "overview", "source_mode",
    "report_template", "report_type", "fingerprint", "quality_signals",
    "solution_schema_meta", "hero", "headline_cards", "metrics",
    "decision_summary", "proposal_brief", "chapter_copy", "proposal_page",
    "proposal_support", "decision_brief", "narrative_outline", "page_copy",
    "proposal_content_model", "content_priority_plan", "closing_block",
    "summary_card", "render_model", "render_model_legacy",
    "audience_profile", "comparison_matrix", "value_board",
    "quality_review", "nav_items", "sections",
)


def load_session(name: str) -> dict:
    with open(os.path.join(SESSION_DIR, f"{name}.json"),
              encoding="utf-8") as fh:
        return json.load(fh)


def run_pipeline(session: dict, profile: str = "balanced"):
    """Session -> (result, markdown, solution_payload) through the real
    pipeline with the deterministic template gateway."""
    gw = ModelGateway(mode="template")
    res = generate_report_v3(gw, session, profile=profile)
    payload = build_solution_payload(
        "fixture-report.md", res.markdown, session=session,
        quality_meta=res.quality)
    return res, res.markdown, payload


# ---------------------------------------------------------------------------
# structural reductions
# ---------------------------------------------------------------------------

def report_structure(markdown: str, res) -> dict:
    """Reduce rendered markdown to its structural skeleton."""
    lines = markdown.split("\n")
    headings = [ln.strip() for ln in lines if re.match(r"^#{1,3} ", ln)]
    mermaid_blocks = markdown.count("```mermaid")
    refs_annotations = len(re.findall(r"_\(证据: [^)]*\)_", markdown))
    checklist_items = len(re.findall(r"^- \[ \]", markdown, re.M))
    table_rows = len([ln for ln in lines
                      if ln.startswith("|") and not set(ln) <= {"|", "-",
                                                                " "}])
    quality = res.quality
    return {
        "headings": headings,
        "mermaid_blocks": mermaid_blocks,
        "refs_annotations": refs_annotations,
        "checklist_items": checklist_items,
        "table_rows": table_rows,
        "has_evidence_appendix": "## 附录：证据索引" in markdown,
        "pipeline_path": res.path,
        "quality": {
            "passed": quality.get("passed"),
            "soft_pass": quality.get("soft_pass"),
            "soft_pass_kind": quality.get("soft_pass_kind"),
            "salvaged": quality.get("salvaged", False),
            "gate_issue_types": sorted({
                i["type"] for i in quality.get("gate_issues") or []}),
        },
        "draft_sections": {
            k: len(res.draft.get(k) or [])
            for k in ("needs", "solutions", "risks", "actions",
                      "open_questions", "evidence_index")
        } if res.draft else None,
    }


def _shape(value, depth=0):
    """Recursive shape: dicts keep keys (values reduced), lists keep
    length + first-item shape, strings reduce to a non-empty marker with
    a short head for identity."""
    if isinstance(value, dict):
        return {k: _shape(v, depth + 1) for k, v in sorted(value.items())}
    if isinstance(value, list):
        return {"__len__": len(value),
                "__first__": _shape(value[0], depth + 1) if value else None}
    if isinstance(value, str):
        # wall-clock stamps inside content (e.g. "生成时间：2026-08-20
        # 07:03") would make snapshots drift run-to-run — normalize them
        stable = re.sub(r"\d{4}-\d{2}-\d{2}[ T]?(?:\d{2}:\d{2}(?::\d{2})?Z?)?",
                        "<TS>", value)
        head = stable[:24].replace("\n", " ")
        return f"str:{head}" if value.strip() else "str:EMPTY"
    if isinstance(value, bool) or value is None:
        return value
    if isinstance(value, (int, float)):
        return "num"
    return type(value).__name__


VOLATILE_KEYS = {"fingerprint", "generated_at", "quality_review",
                 "report_name"}


def solution_structure(payload: dict) -> dict:
    """Reduce the solution payload to a stable structural snapshot."""
    reduced = {}
    for key in A5_KEYS:
        if key in VOLATILE_KEYS:
            reduced[key] = "PRESENT" if key in payload else "MISSING"
            continue
        reduced[key] = _shape(payload.get(key))
    reduced["__nav_titles__"] = [n["title"] for n in
                                 payload.get("nav_items") or []]
    reduced["__narrative_outline__"] = payload.get("narrative_outline")
    reduced["__matrix_criteria__"] = (
        (payload.get("comparison_matrix") or {}).get("criteria"))
    return reduced


# ---------------------------------------------------------------------------
# snapshot compare / update
# ---------------------------------------------------------------------------

def check_snapshot(name: str, actual: dict):
    os.makedirs(SNAPSHOT_DIR, exist_ok=True)
    path = os.path.join(SNAPSHOT_DIR, f"{name}.json")
    blob = json.dumps(actual, ensure_ascii=False, indent=1, sort_keys=True)
    if os.environ.get("UPDATE_SNAPSHOTS") == "1" or not os.path.exists(path):
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(blob + "\n")
        return
    with open(path, encoding="utf-8") as fh:
        expected = json.load(fh)
    assert actual == expected, (
        f"fidelity snapshot drift in {name}: derivation output changed.\n"
        f"If intentional, regenerate with UPDATE_SNAPSHOTS=1 and review "
        f"the snapshot diff.\n--- actual ---\n{blob[:4000]}"
    )
