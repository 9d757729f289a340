"""Assistant chat depth (reference interview_assistant_chat.py:236/414/588):
intent classification, process short-circuit, suggestion mapping,
rationale drafting, per-session memory."""

from deepvision_tpu.web.runtime.assistant import (
    AssistantChat,
    classify_intent,
    draft_rationale,
    extract_suggested_answer,
)

OPTIONS = ["效率优先", "质量优先", "成本优先", "其他（请说明）"]


def test_intent_classification():
    assert classify_intent("还要答多少题？") == "process"
    assert classify_intent("这几个选项什么意思？") == "option_help"
    assert classify_intent("这个问题没看懂") == "clarify"
    assert classify_intent("帮我想想") == "general"


def test_suggestion_mapping_variants():
    assert extract_suggested_answer("我建议效率优先更合适", OPTIONS)[
        "option"] == "效率优先"
    assert extract_suggested_answer("建议选质量", OPTIONS)[
        "option"] == "质量优先"
    multi = extract_suggested_answer(
        "效率优先和成本优先都值得勾选", OPTIONS, multi_select=True)
    assert set(multi["options"]) == {"效率优先", "成本优先"}
    assert extract_suggested_answer("看情况吧", OPTIONS) is None


def test_rationale_drafting():
    r = draft_rationale("建议选效率优先。因为目前人工流程每天占用三小时，自动化收益最直接。")
    assert r and "因为" in r
    assert draft_rationale("好的。") is None


class _Gw:
    mode = "engine"

    def call_model(self, prompt, **kw):
        return "建议选择效率优先，因为现状显示手工流程是主要瓶颈所在之处。"


def _session():
    return {"topic": "调研", "interview_mode": "quick",
            "interview_log": [],
            "scenario_config": {"dimensions": [
                {"id": "d1", "name": "维度", "min_questions": 2,
                 "max_questions": 3, "key_aspects": ["a"]}]}}


def test_chat_full_payload_and_memory():
    svc = AssistantChat(_Gw())
    sess = _session()
    out = svc.chat(sess, "怎么选比较好？", {
        "question": "优先级？", "options": OPTIONS,
        "answer_mode": "pick_with_reason"})
    assert out["intent"] == "option_help"
    assert out["suggested_answer"]["option"] == "效率优先"
    assert "因为" in out.get("suggested_rationale", "")
    assert len(sess["assistant_chat_log"]) == 1
    # process questions never hit the model
    out2 = svc.chat(sess, "还要答多少题？")
    assert out2["intent"] == "process"
    assert "已回答" in out2["reply"]
    assert len(sess["assistant_chat_log"]) == 2
