"""Depth V2 quality tiers (reference INTERVIEW_MODES_V2 web/server.py:18628):
per-tier follow-up budgets and quality-mix dimension exit."""

from deepvision_tpu.web.runtime.followup import (
    answer_quality_tier,
    dimension_saturation,
    should_follow_up,
)

DIM = {"id": "d1", "name": "维度", "min_questions": 2, "max_questions": 4,
       "key_aspects": ["a", "b"]}

RICH = ("具体来说我们有三套系统，因为数据分散，例如报表需要两天，"
        "数据显示缺货率达到8%，主要原因是补货滞后")
VAGUE = "差不多吧"


def session_v2(entries, mode="standard"):
    return {"interview_mode": mode, "depth_v2": {"enabled": True},
            "interview_log": entries,
            "scenario_config": {"dimensions": [DIM]}}


def entry(answer, score=None, **kw):
    e = {"question": "q?", "answer": answer, "dimension": "d1"}
    if score is not None:
        e["quality_score"] = score
    e.update(kw)
    return e


def test_tier_classification():
    assert answer_quality_tier(0.8, "standard") == "high"
    assert answer_quality_tier(0.5, "standard") == "medium"
    assert answer_quality_tier(0.1, "standard") == "low"
    # deep mode is stricter
    assert answer_quality_tier(0.62, "deep") == "medium"


def test_v2_budget_spent_per_tier():
    s = session_v2([entry(RICH, 0.8)])
    # high-tier answer earns ZERO follow-ups in standard V2
    d = should_follow_up(s, DIM, entry(RICH, 0.8), "standard")
    assert d["follow_up"] is False
    assert d["reason"] == "follow_up_budget_exhausted"
    # a low-tier answer still gets probed
    d = should_follow_up(s, DIM, entry(VAGUE, 0.1), "standard")
    assert d["follow_up"] is True


def test_v1_budget_unchanged_without_flag():
    s = session_v2([entry(RICH, 0.8)])
    s["depth_v2"] = {}
    d = should_follow_up(s, DIM, entry(RICH, 0.8), "standard")
    assert d["reason"] == "quality_ok"  # v1 path: quality passes


def test_v2_dimension_held_until_high_mix():
    # two medium answers: avg quality is decent, v1 would saturate early,
    # v2 holds the dimension until a high-tier answer lands
    entries = [entry(RICH, 0.5), entry(RICH, 0.55)]
    s = session_v2(entries)
    sat = dimension_saturation(s, DIM, "standard")
    assert sat.get("held_for_quality") is True
    assert sat["saturated"] is False
    # one high answer releases it
    entries.append(entry(RICH, 0.9))
    sat = dimension_saturation(session_v2(entries), DIM, "standard")
    assert sat["tiers"]["high"] >= 1
    assert sat["saturated"] is True


def test_v2_budget_cap_still_exits():
    # at the hard budget the dimension saturates regardless of mix
    entries = [entry(VAGUE, 0.2) for _ in range(4)]
    sat = dimension_saturation(session_v2(entries), DIM, "standard")
    assert sat["saturated"] is True
