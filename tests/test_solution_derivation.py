"""Solution derivation depth: every A.5 contract key must carry real
content for a realistic report snapshot — no placeholder {}/None keys
(VERDICT r1 weak #9; reference web/server.py:38825-40509, 42710-42945)."""

from deepvision_tpu.web.runtime.solution import build_solution_payload

REPORT_MD = """# 连锁零售补货系统

## 一、概述

本报告基于8轮访谈整理，核心痛点是人工补货滞后，期望自动化补货建议，降低库存成本。

## 二、需求清单

- **核心业务诉求** P0：自动补货建议，降低缺货率 (Q1)
- **效率诉求** P1：报表自动化，减少手工汇总 (Q2)
- 体验诉求：门店操作简化 (Q3)

## 三、方案建议

- 分阶段实施：一期补货建议引擎，二期全链路自动化
- 备选：外采成熟补货系统并做集成

## 四、风险

- 历史数据质量不足，影响预测精度 (Q4)

## 五、下一步行动

- 两周内完成方案评审
- 启动数据治理专项
"""

FILLED_KEYS = (
    "chapter_copy", "proposal_page", "page_copy", "proposal_content_model",
    "content_priority_plan", "comparison_matrix", "value_board",
    "proposal_support", "audience_profile", "decision_brief",
    "narrative_outline", "closing_block", "summary_card", "hero",
)


def _payload():
    return build_solution_payload(
        "r.md", REPORT_MD,
        session={"topic": "补货系统", "interview_log": [{}] * 8,
                 "interview_mode": "standard"},
    )


def test_no_placeholder_keys():
    p = _payload()
    for key in FILLED_KEYS:
        assert p[key], key


def test_chapter_copy_schema():
    cc = _payload()["chapter_copy"]
    for k in ("value_statement", "approach", "commitment"):
        assert isinstance(cc[k], str) and len(cc[k]) > 5, k


def test_priority_plan_ordering():
    items = _payload()["content_priority_plan"]["items"]
    priorities = [i["priority"] for i in items]
    assert priorities == sorted(
        priorities, key=lambda p: {"P0": 0, "P1": 1, "P2": 2}.get(p, 9))
    assert any(i["kind"] == "risk" for i in items)


def test_comparison_matrix_has_recommended_option():
    m = _payload()["comparison_matrix"]
    names = [o["name"] for o in m["options"]]
    assert "推荐方案" in names and "维持现状" in names
    assert all(set(o["scores"]) == set(m["criteria"]) for o in m["options"])


def test_value_board_buckets():
    vb = _payload()["value_board"]
    assert vb["columns"]
    assert all(c["items"] for c in vb["columns"])


def test_proposal_support_refs_resolve():
    sup = _payload()["proposal_support"]
    assert "Q1" in sup["q_ids"]
    assert any(e["refs"] for e in sup["evidence"])


def test_content_model_blocks():
    cm = _payload()["proposal_content_model"]
    chapters = {c["title"]: c for c in cm["chapters"]}
    needs = next(c for t, c in chapters.items() if "需求" in t)
    assert any(b["type"] == "bullets" for b in needs["blocks"])
