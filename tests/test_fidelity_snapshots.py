"""Report/solution fidelity snapshot suite (BASELINE.md "output
fidelity" target; reference test_solution_payload.py:1 + fixture corpus
tests/fixtures/report_solution/).

Five reference-shaped session fixtures run through the REAL pipeline
(template gateway -> V3 pipeline -> markdown render -> solution payload
derivation). Each case asserts:
  1. section-level structural parity of the rendered report (heading
     sequence, mermaid blocks, refs annotations, appendix, scorecard);
  2. the full A.5 solution payload contract with non-trivial content in
     every derived key;
  3. an exact structural snapshot diff against committed fixtures —
     any derivation regression changes the snapshot and fails.
"""

import copy

import pytest

from tests.fidelity_utils import (
    A5_KEYS, check_snapshot, load_session, report_structure, run_pipeline,
    solution_structure,
)

CASES = [
    ("standard_crm", "balanced"),
    ("assessment", "balanced"),
    ("sparse_quick", "balanced"),
    ("doc_heavy", "quality"),
    ("weak_evidence", "balanced"),
]


@pytest.fixture(scope="module")
def results():
    out = {}
    for name, profile in CASES:
        session = load_session(name)
        out[name] = run_pipeline(session, profile=profile)
    return out


# ---------------------------------------------------------------------------
# structural snapshots (exact diff vs committed fixtures)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,profile", CASES)
def test_report_structure_snapshot(results, name, profile):
    res, markdown, _ = results[name]
    check_snapshot(f"report_{name}", report_structure(markdown, res))


@pytest.mark.parametrize("name,profile", CASES)
def test_solution_structure_snapshot(results, name, profile):
    _, _, payload = results[name]
    check_snapshot(f"solution_{name}", solution_structure(payload))


# ---------------------------------------------------------------------------
# report-side section parity
# ---------------------------------------------------------------------------

def test_standard_report_has_reference_section_sequence(results):
    _, md, _ = results["standard_crm"]
    # section order mirrors render_report_from_draft_v3 (reference
    # web/server.py:26152): overview -> needs -> analysis -> viz ->
    # solutions -> risks -> actions -> open questions -> appendix
    positions = [md.index(h) for h in (
        "## 一、总体概述", "## 二、需求清单", "## 三、详细分析",
        "## 五、方案建议", "## 六、风险提示", "## 七、下一步行动",
        "## 附录：证据索引")]
    assert positions == sorted(positions)


def test_standard_report_cites_evidence_inline(results):
    res, md, _ = results["standard_crm"]
    assert "_(证据: " in md
    assert res.draft["needs"][0]["refs"]


def test_standard_report_renders_valid_mermaid_blocks(results):
    _, md, _ = results["standard_crm"]
    assert md.count("```mermaid") >= 2
    # every opened block is closed
    assert md.count("```") % 2 == 0


def test_assessment_report_has_scorecard(results):
    _, md, _ = results["assessment"]
    assert "## 评估打分" in md
    assert "| 维度 | 答题数 | 平均得分 | 评级 |" in md
    assert "综合得分" in md
    # both dimensions scored
    assert "技术深度" in md and "协作沟通" in md


def test_doc_heavy_documents_flow_into_prompt_and_draft(results):
    res, md, _ = results["doc_heavy"]
    assert res.path == "v3"
    assert res.draft_attempts >= 1
    assert "## 一、总体概述" in md


def test_weak_evidence_session_exposes_gaps(results):
    res, md, _ = results["weak_evidence"]
    # unknown-heavy session: repair catalog must surface pending
    # open questions instead of silently concluding (reference
    # unknown-ratio backfill web/server.py:24962-25005)
    oq = res.draft.get("open_questions") or []
    pending = [q for q in oq if isinstance(q, dict)
               and q.get("evidence_binding") == "pending_follow_up"]
    assert pending, oq
    assert "## 八、待澄清问题" in md


def test_sparse_quick_still_produces_complete_report(results):
    res, md, _ = results["sparse_quick"]
    assert res.markdown
    assert "## 一、总体概述" in md
    # the quality decision for sparse sessions is pinned by the snapshot;
    # here we assert it never silently hard-fails without a path
    assert res.path in ("v3", "salvage", "simple_template")


# ---------------------------------------------------------------------------
# solution payload A.5 contract
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,profile", CASES)
def test_solution_payload_has_every_a5_key(results, name, profile):
    _, _, payload = results[name]
    missing = [k for k in A5_KEYS if k not in payload]
    assert not missing, missing


def test_solution_hero_is_substantive(results):
    _, _, p = results["standard_crm"]
    hero = p["hero"]
    assert hero["title"] and hero["summary"]
    assert len(hero["highlights"]) >= 1
    assert len(hero["metrics"]) >= 3
    assert hero["actions"][0]["href"].startswith("/api/reports/")


def test_solution_chapter_copy_nontrivial(results):
    _, _, p = results["standard_crm"]
    copy_ = p["chapter_copy"]
    for key in ("value_statement", "approach", "commitment"):
        assert len(copy_[key]) >= 10, key


def test_solution_narrative_outline_is_not_bare_titles(results):
    _, _, p = results["standard_crm"]
    outline = p["narrative_outline"]
    assert outline
    # narrative beats with stage/hook/summary, not bare section titles
    # (VERDICT r2 #8; reference narrative composition :39891-40509)
    assert all(isinstance(t, dict) for t in outline)
    assert any("概述" in t["title"] for t in outline)
    stages = [t["stage"] for t in outline]
    assert "开场" in stages and "行动" in stages
    assert all(t.get("summary") or t.get("hook") for t in outline)
    assert all(t.get("anchor") for t in outline)


def test_solution_decision_brief_scqa(results):
    _, _, p = results["standard_crm"]
    brief = p["decision_brief"]
    for key in ("headline", "situation", "complication", "resolution"):
        assert len(brief[key]) >= 8, key
    assert brief["asks"]


def test_solution_evidence_drawer_detail(results):
    _, _, p = results["standard_crm"]
    support = p["proposal_support"]
    assert support["q_ids"]
    detail = support["evidence_detail"]
    assert detail, "cited q_ids must carry drawer detail"
    some = detail[next(iter(detail))]
    assert some["question"] and some["answer"]


def test_solution_comparison_matrix_when_solutions_exist(results):
    res, _, p = results["standard_crm"]
    if res.draft.get("solutions"):
        matrix = p["comparison_matrix"]
        assert matrix and matrix["criteria"]
        assert len(matrix["options"]) >= 2
        for opt in matrix["options"]:
            assert opt["name"]
            assert set(matrix["criteria"]) <= set(opt["scores"])


def test_solution_value_board_entries(results):
    _, _, p = results["standard_crm"]
    board = p["value_board"]
    assert board and board.get("columns")
    for col in board["columns"]:
        assert col["title"] and col["items"]


def test_solution_priority_plan_buckets(results):
    _, _, p = results["standard_crm"]
    plan = p["content_priority_plan"]
    assert plan and any(plan.get(k) for k in plan)


def test_solution_decision_summary_mirrors_report(results):
    _, md, p = results["standard_crm"]
    ds = p["decision_summary"]
    assert ds["conclusion"]
    assert ds["top_needs"], "needs must flow from report to solution"
    # decision_brief is the SCQA one-screen pitch composed FROM the same
    # report sections (solution.py _derive_decision_brief) — distinct
    # shape from the raw decision_summary lists, but grounded in them
    brief = p["decision_brief"]
    for key in ("headline", "situation", "complication", "resolution",
                "asks"):
        assert brief.get(key), f"decision_brief missing {key}"
    assert isinstance(brief["asks"], list) and brief["asks"]


def test_solution_nav_matches_sections(results):
    _, _, p = results["standard_crm"]
    nav_ids = {n["id"] for n in p["nav_items"]}
    section_ids = {s["id"] for s in p["sections"]}
    assert nav_ids <= section_ids
    assert len(p["sections"]) == p["solution_schema_meta"]["section_count"]


def test_solution_quality_signals_propagate(results):
    res, _, p = results["standard_crm"]
    signals = p["quality_signals"]
    assert "quality_score" in signals and "healthy" in signals
    assert p["quality_review"].get("profile") == "balanced"


def test_degraded_solution_variant_for_weak_sessions(results):
    _, _, p = results["weak_evidence"]
    # weak sessions either stay healthy (post-repair) or degrade the
    # payload shape — both valid, but the shape contract must hold
    if not p["quality_signals"]["healthy"]:
        assert p["source_mode"] == "degraded"
        assert p["hero"]["eyebrow"].endswith("（简版）")
    else:
        assert p["source_mode"] == "report_snapshot"


# ---------------------------------------------------------------------------
# determinism: same session -> identical structure (greedy-replay
# equivalent for the derivation layer)
# ---------------------------------------------------------------------------

def test_pipeline_is_deterministic_for_fixture_sessions():
    session = load_session("standard_crm")
    res1, md1, p1 = run_pipeline(copy.deepcopy(session))
    res2, md2, p2 = run_pipeline(copy.deepcopy(session))
    strip = ("> 生成时间：", )

    def _norm(md):
        return "\n".join(ln for ln in md.split("\n")
                         if not any(ln.startswith(s) for s in strip))
    assert _norm(md1) == _norm(md2)
    assert solution_structure(p1) == solution_structure(p2)
