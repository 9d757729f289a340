"""Solution payload depth — degraded variants, AI-copy merge validation,
payload cache fingerprinting, section extraction, derived structures.

Extends test_solution_derivation.py toward the reference's
test_solution_payload.py coverage (1,879 LoC; snapshot derivation
web/server.py:43078-43114, degraded variant :43018, schema-validated AI
merge :41210, payload cache :35523-35605)."""

import json
import tempfile

import pytest

from deepvision_tpu.web.runtime.solution import (
    SolutionService,
    _bullet_items,
    _extract_sections,
    _quality_signals,
    build_solution_payload,
    merge_ai_copy,
)

HEALTHY_MD = """# 物流园区调度中心方案

## 一、概述

本报告覆盖8轮访谈的结论，核心是调度人工化导致月台拥堵，期望动态排班与到车预约。整体方案分两期落地。
目前园区日均到车约420台，高峰集中在上午9-11点，月台平均等待时长47分钟；人工对讲机调度依赖两名老师傅的个人经验，
交接班时段改派错误率明显升高。访谈中仓配、安保与客服三方均确认预约制是第一优先级，其次是动态改派与实时看板。

## 二、需求清单

- **预约管理** P0：车辆到港预约与月台分配 (Q1)
- **动态调度** P0：高峰时段自动改派 (Q2)
- 数据看板 P1：园区实时运行大屏 (Q3)

## 三、方案建议

- 一期上线预约+月台分配引擎，二期接入自动改派
- 备选方案：采购成熟TMS并定制预约模块

## 四、风险

- 司机使用习惯迁移成本高 (Q4)
- 历史到车数据缺失影响排班模型

## 五、下一步行动

- 本月完成预约流程原型评审
- 启动数据补采专项
"""


# ---------------------------------------------------------------------------
# Section extraction + signals
# ---------------------------------------------------------------------------

def test_extract_sections_levels_and_ids():
    sections = _extract_sections(HEALTHY_MD)
    titles = [s["title"] for s in sections]
    assert titles[0] == "物流园区调度中心方案"
    assert "二、需求清单" in titles
    levels = {s["title"]: s["level"] for s in sections}
    assert levels["物流园区调度中心方案"] == 1
    assert levels["四、风险"] == 2
    ids = [s["id"] for s in sections]
    assert len(ids) == len(set(ids))  # unique anchor ids


def test_bullet_items_strip_markers_and_bold():
    body = "- **预约管理** P0：车辆预约 (Q1)\n* 次要项\n1. 编号项\n   不是列表行"
    items = _bullet_items(body)
    assert items == ["预约管理 P0：车辆预约 (Q1)", "次要项", "编号项"]


def test_quality_signals_healthy_and_not():
    good = _quality_signals(HEALTHY_MD, {"score": 0.8})
    assert good["healthy"] is True and good["quality_score"] == 0.8
    short = _quality_signals("# 短\n\n内容不足", None)
    assert short["length_ok"] is False and short["healthy"] is False
    degraded = _quality_signals(HEALTHY_MD, {"degraded": True})
    assert degraded["degraded_source"] is True
    assert degraded["healthy"] is False


# ---------------------------------------------------------------------------
# Payload structure
# ---------------------------------------------------------------------------

def _payload(md=HEALTHY_MD, **kw):
    session = kw.pop("session", {
        "topic": "园区调度", "description": "覆盖三个园区",
        "interview_log": [{}] * 8, "interview_mode": "standard"})
    return build_solution_payload("r.md", md, session=session, **kw)


def test_healthy_payload_structure():
    p = _payload(quality_meta={"score": 0.75})
    assert p["source_mode"] == "report_snapshot"
    assert p["title"] == "物流园区调度中心方案"
    assert p["subtitle"] == "覆盖三个园区"
    assert "月台拥堵" in p["overview"]
    # decision summary pulls typed lists from the right sections
    ds = p["decision_summary"]
    assert any("预约" in n for n in ds["top_needs"])
    assert any("司机" in r for r in ds["top_risks"])
    assert any("原型评审" in a for a in ds["next_actions"])
    # hero metrics reflect the session + extraction
    metrics = {m["label"]: m["value"] for m in p["hero"]["metrics"]}
    assert metrics["访谈轮次"] == 8
    assert metrics["需求条目"] == 3
    assert metrics["风险条目"] == 2
    assert metrics["质量分"] == 0.75
    # three headline cards: conclusion/risk/action
    tones = [c["tone"] for c in p["headline_cards"]]
    assert tones == ["primary", "warning", "success"]
    # nav has only level<=2 sections; render model has all
    assert all(
        s["level"] <= 2 for s in p["sections"]
        if s["id"] in {n["id"] for n in p["nav_items"]}
    )
    assert p["solution_schema_meta"]["section_count"] == len(p["sections"])
    # comparison matrix: baseline + recommended + alternative (2 options)
    cm = p["comparison_matrix"]
    assert cm["criteria"] == ["实施难度", "业务价值", "风险敞口"]
    names = [o["name"] for o in cm["options"]]
    assert names == ["维持现状", "推荐方案", "备选方案"]
    assert "一期上线预约" in cm["options"][1]["summary"]
    assert p["value_board"]["columns"]


def test_degraded_variant_when_unhealthy():
    p = _payload(md="# 短报告\n\n内容非常少")
    assert p["source_mode"] == "degraded"
    assert p["hero"]["eyebrow"].endswith("（简版）")
    assert len(p["headline_cards"]) == 1  # only the conclusion card


def test_degraded_variant_on_degraded_quality_meta():
    p = _payload(quality_meta={"degraded": True, "score": 0.2})
    assert p["source_mode"] == "degraded"


def test_fingerprint_tracks_content():
    a = _payload()
    b = _payload(md=HEALTHY_MD + "\n附加一行")
    assert a["fingerprint"] != b["fingerprint"]
    assert _payload()["fingerprint"] == a["fingerprint"]


def test_comparison_matrix_scales_with_solution_count():
    md = HEALTHY_MD.replace("- 备选方案：采购成熟TMS并定制预约模块\n", "")
    p = _payload(md=md)
    # one listed solution -> baseline + recommended only
    assert [o["name"] for o in p["comparison_matrix"]["options"]] == \
        ["维持现状", "推荐方案"]


def test_payload_without_session_still_complete():
    p = build_solution_payload("r.md", HEALTHY_MD)
    assert p["title"]
    assert p["hero"]["metrics"][0]["value"] == 0  # no interview log
    assert p["audience_profile"]


# ---------------------------------------------------------------------------
# AI copy merge validation matrix
# ---------------------------------------------------------------------------

GOOD_COPY = {
    "chapter_copy": {"value_statement": "以预约驱动月台周转",
                     "approach": "两期迭代，先流程后算法",
                     "commitment": "六周交付一期可用版本"},
    "quality_review": {"score": 0.82, "verdict": "结构完整",
                       "strengths": ["证据充分"], "concerns": ["数据质量"]},
}


def test_merge_ai_copy_applies_valid_payload():
    p = _payload()
    merged = merge_ai_copy(p, json.dumps(GOOD_COPY, ensure_ascii=False))
    assert merged["chapter_copy"]["value_statement"] == "以预约驱动月台周转"
    assert merged["quality_review"]["score"] == 0.82
    assert merged["quality_review"]["strengths"] == ["证据充分"]


def test_merge_ai_copy_extracts_from_prose():
    p = _payload()
    text = "这是我的评审结果：\n" + json.dumps(
        GOOD_COPY, ensure_ascii=False) + "\n以上。"
    assert merge_ai_copy(p, text)["quality_review"]["verdict"] == "结构完整"


@pytest.mark.parametrize("bad", [
    "不是JSON",
    "[1, 2, 3]",
    json.dumps({"chapter_copy": {"value_statement": "只有一个键"}}),
    json.dumps({"chapter_copy": {"value_statement": "",
                                 "approach": "x", "commitment": "y"}}),
    json.dumps({"quality_review": {"verdict": "缺少分数"}}),
    json.dumps({"quality_review": {"score": "不是数字", "verdict": "x"}}),
])
def test_merge_ai_copy_rejects_malformed(bad):
    p = _payload()
    before_copy = dict(p["chapter_copy"])
    before_review = dict(p["quality_review"])
    merged = merge_ai_copy(p, bad)
    assert merged["chapter_copy"] == before_copy
    assert merged["quality_review"] == before_review


def test_merge_ai_copy_clamps_score_and_lengths():
    over = {
        "chapter_copy": {"value_statement": "长" * 900, "approach": "a",
                         "commitment": "c"},
        "quality_review": {"score": 7.5, "verdict": "很" * 100,
                           "strengths": [f"s{i}" for i in range(9)]},
    }
    merged = merge_ai_copy(_payload(), json.dumps(over, ensure_ascii=False))
    assert len(merged["chapter_copy"]["value_statement"]) == 500
    assert merged["quality_review"]["score"] == 1.0
    assert len(merged["quality_review"]["verdict"]) == 40
    assert len(merged["quality_review"]["strengths"]) == 5


# ---------------------------------------------------------------------------
# SolutionService cache behavior (fingerprint invalidation, AI fallback)
# ---------------------------------------------------------------------------

class _Gateway:
    mode = "scripted"

    def __init__(self, text=None, error=None):
        self.text = text
        self.error = error
        self.calls = 0

    def call_model(self, *a, **kw):
        self.calls += 1
        if self.error:
            raise self.error
        return self.text


@pytest.fixture()
def stores():
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import ReportStore, SessionStore

    tmp = tempfile.TemporaryDirectory()
    meta = MetaIndex(f"{tmp.name}/meta.db")
    reports = ReportStore(tmp.name, meta)
    sessions = SessionStore(tmp.name, meta)
    yield meta, reports, sessions
    tmp.cleanup()


def _save_report(reports, content=HEALTHY_MD, name="园区-r.md"):
    reports.save(name, content, owner_user_id="1",
                 instance_scope="default", session_id=None, topic="园区")
    return name


def test_service_caches_by_fingerprint(stores):
    meta, reports, sessions = stores
    svc = SolutionService(meta, reports, sessions)
    name = _save_report(reports)
    p1 = svc.get_payload(name)
    p2 = svc.get_payload(name)
    assert p2 == p1  # served from the payload cache
    # content change invalidates via fingerprint
    _save_report(reports, HEALTHY_MD + "\n新增段落", name)
    p3 = svc.get_payload(name)
    assert p3["fingerprint"] != p1["fingerprint"]


def test_service_missing_report_returns_none(stores):
    meta, reports, sessions = stores
    assert SolutionService(meta, reports, sessions).get_payload(
        "不存在.md") is None


def test_service_merges_ai_copy_once_then_caches(stores):
    meta, reports, sessions = stores
    gw = _Gateway(text=json.dumps(GOOD_COPY, ensure_ascii=False))
    svc = SolutionService(meta, reports, sessions, gateway=gw)
    name = _save_report(reports)
    p1 = svc.get_payload(name)
    assert p1["chapter_copy"]["value_statement"] == "以预约驱动月台周转"
    svc.get_payload(name)
    assert gw.calls == 1  # second hit served from cache — no AI call


def test_service_survives_ai_failure(stores):
    meta, reports, sessions = stores
    svc = SolutionService(meta, reports, sessions,
                          gateway=_Gateway(error=RuntimeError("down")))
    name = _save_report(reports)
    p = svc.get_payload(name)
    assert p is not None
    assert p["chapter_copy"]["value_statement"]  # deterministic derivation


def test_service_prewarm_never_raises(stores):
    meta, reports, sessions = stores
    svc = SolutionService(meta, reports, sessions,
                          gateway=_Gateway(error=RuntimeError("down")))
    svc.prewarm("不存在.md")  # no exception
