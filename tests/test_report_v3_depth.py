"""Report V3 depth: validation rules, deterministic repairs, quality-gate
components, repair-reprompt, and the salvage stage
(reference web/server.py:22980, 24675, 25086-25312, 23307, 32445)."""

import json

from deepvision_tpu.web.runtime.report_v3 import (
    apply_deterministic_repairs,
    build_evidence_pack,
    generate_report_v3,
    quality_gate,
    salvage_draft,
    validate_report_draft,
)

Q_IDS = ["Q1", "Q2", "Q3"]
FACTS = [
    {"q_id": "Q1", "dimension": "d1", "question": "现状？",
     "answer": "流程割裂，因为系统多，具体涉及三套系统",
     "rationale": "有数据", "evidence_class": "explicit",
     "quality_score": 0.8, "is_follow_up": False},
    {"q_id": "Q2", "dimension": "d1", "question": "目标？",
     "answer": "自动化", "rationale": "", "evidence_class": "rich_option",
     "quality_score": 0.5, "is_follow_up": False},
    {"q_id": "Q3", "dimension": "d2", "question": "预算？",
     "answer": "两百万", "rationale": "", "evidence_class": "weak_inferred",
     "quality_score": 0.3, "is_follow_up": False},
]


def good_draft():
    return {
        "overview": "本报告基于三轮访谈整理，核心痛点是流程割裂，目标是自动化与降本。",
        "needs": [
            {"title": "自动化改造", "description": "减少人工", "priority": "P0",
             "refs": ["Q1"]},
        ],
        "analysis": {
            "customer_needs": "痛点集中在流程割裂与手工操作效率低下方面。",
            "business_flow": "现有流程存在线下断点，需要线上化改造处理。",
            "tech_constraints": "三套系统并存，集成复杂度高，需要统一接口。",
            "project_constraints": "预算两百万以内，四个月窗口期完成一期。",
        },
        "visualizations": {
            "business_flow_mermaid": "flowchart LR\n  A[提出] --> B[评审]",
        },
        "solutions": [
            {"title": "分阶段实施",
             "description": "一期先做高价值流程线上化，二期扩展集成范围，"
                            "降低切换风险并尽早见效。",
             "refs": ["Q2"]},
            {"title": "接口统一方案",
             "description": "先定义统一接口规范并完成三套系统的适配层，"
                            "再逐步替换冗余链路。",
             "refs": ["Q3"]},
        ],
        "risks": [
            {"title": "集成排期风险",
             "description": "三套系统适配依赖多个供应商配合，"
                            "任一延期将压缩联调窗口。",
             "severity": "medium", "refs": ["Q3"]},
            {"title": "预算超支风险",
             "description": "迁移与并行运行成本可能超出两百万上限，"
                            "需预留缓冲并分期投入。",
             "severity": "medium", "refs": ["Q1"]},
        ],
        "actions": [
            {"title": "输出接口规范", "owner": "技术负责人",
             "description": "两周内完成统一接口规范初稿并组织评审。",
             "timeline": "两周内", "metric": "规范评审通过", "refs": ["Q2"]},
            {"title": "锁定一期范围", "owner": "需求方",
             "description": "确认一期覆盖的流程清单与验收口径。",
             "timeline": "本月", "metric": "范围清单签字确认", "refs": ["Q1"]},
        ],
        "open_questions": [
            {"question": "并行运行期间的数据双写口径是否已确认？",
             "refs": ["Q3"]},
        ],
        "evidence_index": ["Q1", "Q2"],
    }


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------

def test_validation_catches_shape_and_content_issues():
    draft = good_draft()
    draft["overview"] = "太短"
    draft["needs"].append({"title": "自动化改造", "description": "重复",
                           "priority": "urgent!!"})
    draft["needs"].append({"title": "", "description": ""})
    draft["visualizations"]["architecture_mermaid"] = "不是图"
    draft["solutions"][0]["refs"] = ["Q99"]
    issues = validate_report_draft(draft, Q_IDS, FACTS)
    types = {i["type"] for i in issues}
    assert {"overview_too_short", "duplicate_need", "invalid_priority",
            "empty_item", "bad_mermaid", "invalid_ref"} <= types


def test_validation_wrong_types_are_errors():
    issues = validate_report_draft(
        {"overview": 42, "needs": "not-a-list", "analysis": []}, Q_IDS)
    errors = [i for i in issues if i["severity"] == "error"]
    assert len(errors) >= 3


# ---------------------------------------------------------------------------
# repairs
# ---------------------------------------------------------------------------

def test_repairs_normalize_everything():
    draft = {
        "overview": 123,
        "needs": ["裸字符串需求",
                  {"title": "A", "priority": "高", "refs": ["Q1", "QX"]},
                  {"title": "A", "priority": "weird"}],
        "analysis": "broken",
        "visualizations": {"business_flow_mermaid": "不是 mermaid",
                           "demand_pie_mermaid": "pie\n  \"a\": 1"},
        "open_questions": ["还有什么要确认？"],
        "evidence_index": ["Q1", "Q1", {"q_id": "Q2"}],
    }
    out = apply_deterministic_repairs(draft, Q_IDS, FACTS)
    assert isinstance(out["overview"], str)
    assert out["needs"][0] == {"title": "裸字符串需求", "description": ""}
    assert out["needs"][1]["priority"] == "P0"          # 高 -> P0
    assert out["needs"][1]["refs"] == ["Q1"]            # QX dropped
    assert len([n for n in out["needs"] if n.get("title") == "A"]) == 1
    assert "business_flow_mermaid" not in out["visualizations"]
    assert "demand_pie_mermaid" in out["visualizations"]
    assert out["open_questions"][0]["question"].startswith("还有")
    ev = out["evidence_index"]
    assert [e["q_id"] for e in ev] == ["Q1", "Q2"]      # deduped
    assert ev[0]["summary"]                             # backfilled


# ---------------------------------------------------------------------------
# quality gate
# ---------------------------------------------------------------------------

def test_quality_gate_components_and_reasons():
    q = quality_gate(good_draft(), [], "balanced")
    assert q["passed"]
    assert set(q["components"]) == {"structure", "ref_coverage",
                                    "analysis_depth", "visualization",
                                    "issue_penalty"}
    bad = dict(good_draft())
    bad["analysis"] = {k: "短" for k in bad["analysis"]}
    q2 = quality_gate(bad, [], "balanced")
    assert q2["score"] < q["score"]
    assert any("分析" in r for r in q2["reasons"])


def test_release_conservative_requires_review():
    q = quality_gate(good_draft(), [], "release-conservative",
                     review_rounds_run=0)
    assert not q["passed"]
    assert any("评审" in r for r in q["reasons"])


# ---------------------------------------------------------------------------
# salvage
# ---------------------------------------------------------------------------

def test_salvage_rebuilds_from_facts():
    pack = {"topic": "补货系统", "q_ids": Q_IDS, "facts": FACTS}
    out = salvage_draft({"overview": "x"}, pack)
    assert len(out["overview"]) > 30
    assert out["needs"] and out["needs"][0]["refs"] == ["Q1"]
    assert all(out["analysis"][k] for k in out["analysis"])
    issues = validate_report_draft(out, Q_IDS, FACTS)
    assert not [i for i in issues if i["severity"] == "error"]


# ---------------------------------------------------------------------------
# pipeline: repair-reprompt path
# ---------------------------------------------------------------------------

class _ScriptedGateway:
    """report_draft -> broken draft; report_review -> issues w/o patch;
    second report_draft call (repair-reprompt) -> fixed draft."""

    mode = "engine"

    def __init__(self):
        self.calls = []

    def call_model(self, prompt, call_type="question", **kw):
        self.calls.append(call_type)
        if call_type == "report_draft" and self.calls.count(
                "report_draft") == 1:
            d = good_draft()
            d["analysis"]["customer_needs"] = "短"
            return json.dumps(d, ensure_ascii=False)
        if call_type == "report_review":
            return json.dumps({
                "pass": False, "quality_score": 0.4,
                "issues": [{"type": "analysis_thin", "severity": "warning",
                            "message": "分析太薄", "target": "customer_needs"}],
            }, ensure_ascii=False)
        if call_type == "report_draft":
            return json.dumps(good_draft(), ensure_ascii=False)
        return "{}"


def test_pipeline_repair_reprompt_fixes_draft():
    session = {
        "topic": "补货系统", "interview_log": [
            {"question": f["question"], "answer": f["answer"],
             "dimension": f["dimension"],
             "rationale_text": f["rationale"]} for f in FACTS
        ],
        "scenario_config": {"dimensions": [
            {"id": "d1", "name": "维度一"}, {"id": "d2", "name": "维度二"}]},
    }
    gw = _ScriptedGateway()
    res = generate_report_v3(gw, session, profile="balanced")
    assert res.path == "v3"
    assert gw.calls.count("report_draft") == 2  # draft + repair-reprompt
    assert res.draft["analysis"]["customer_needs"] != "短"
    assert res.quality["passed"] or res.quality["soft_pass"]
