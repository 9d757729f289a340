"""Question-generation strategy depth tests — prompt builder, 5-strategy
parsing, normalization, tiered fast->full->fallback selection, adaptive
fast-path gate + percentile deadline, question cache, adaptive lane order.

Ports the behavior classes of the reference's
test_question_fast_strategy.py (2,351 LoC) onto this framework's
TieredQuestionGenerator (web/runtime/interview.py) and ModelGateway
(engine/client.py)."""

import json

import pytest

from deepvision_tpu.web.runtime.interview import (
    DEFAULT_OPTIONS,
    QuestionCache,
    TieredQuestionGenerator,
    build_doc_context,
    build_history_window,
    build_interview_prompt,
    is_question_acceptable,
    normalize_generated_question_result,
    parse_question_response,
)

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke

DIM = {"id": "customer_needs", "name": "客户需求",
       "key_aspects": ["目标用户", "核心痛点", "使用场景"]}


def make_session(n_log=0, docs=None, summary=""):
    return {
        "session_id": "dv-test-0001",
        "topic": "仓储管理系统选型",
        "description": "覆盖三个区域仓与一个中心仓的出入库流程",
        "interview_mode": "standard",
        "interview_log": [
            {"question": f"第{i}个问题？", "answer": f"第{i}个回答，包含具体内容",
             "dimension": "customer_needs"}
            for i in range(n_log)
        ],
        "reference_materials": docs or [],
        "summary": summary,
        "scenario_config": {"dimensions": [DIM]},
    }


# ---------------------------------------------------------------------------
# Prompt building
# ---------------------------------------------------------------------------

def test_history_window_keeps_last_five_and_flags_summary():
    log = [{"question": f"Q{i}", "answer": f"A{i}"} for i in range(9)]
    text, needs = build_history_window(log, window=5, summary_threshold=8)
    assert needs is True
    assert "Q4" in text and "Q8" in text
    assert "Q3" not in text  # outside the window
    text2, needs2 = build_history_window(log[:4], window=5)
    assert needs2 is False and "Q0" in text2


def test_history_window_prepends_summary():
    log = [{"question": "Q", "answer": "A"}]
    text, _ = build_history_window(log, summary="此前已确认预算为50万")
    assert text.startswith("【历史摘要】此前已确认预算为50万")


def test_doc_context_budgets():
    docs = [
        {"name": "需求书", "content": "长" * 4000},
        {"name": "流程图", "content": "图" * 4000},
        {"name": "空文档", "content": ""},
    ]
    ctx = build_doc_context(docs, max_doc_chars=1800, max_total_chars=5000)
    assert "【参考文档：需求书】" in ctx
    # per-doc clamp at 1800 chars of body
    assert "长" * 1801 not in ctx
    assert "长" * 1800 in ctx
    # total budget 5000 truncates the second doc
    assert len(ctx) <= 5000 + 100  # separators/headers margin
    assert "空文档" not in ctx


def test_doc_context_prefers_ai_summary():
    docs = [{"name": "d", "content": "原文" * 500, "summary": "要点摘要"}]
    ctx = build_doc_context(docs)
    assert "要点摘要" in ctx and "原文" not in ctx


def test_prompt_full_tier_includes_all_sections():
    session = make_session(
        n_log=2, docs=[{"name": "需求书", "content": "现状说明"}])
    p = build_interview_prompt(
        session, DIM,
        search_context="行业平均库存周转率为8次/年",
        capture_contract={"answer_mode": "pick_with_reason",
                          "evidence_intent": "high"},
        focus_aspect="核心痛点",
    )
    for needle in ("访谈主题：仓储管理系统选型", "主题说明：", "当前维度：客户需求",
                   "目标用户、核心痛点、使用场景", "历史问答：", "【参考文档：需求书】",
                   "【联网检索结果】", "本轮请优先覆盖尚未谈到的要点：核心痛点",
                   "answer_mode=pick_with_reason", "evidence_intent=high"):
        assert needle in p, needle
    # the JSON schema spec is the LAST section (strongest conditioning)
    assert p.rstrip().endswith('"ai_recommendation": "推荐选项或null"}')
    # stable-first section order (round 4): session-constant sections
    # [preamble, topic, desc, docs] precede the per-round ones
    # [dimension, search, history, ask] so consecutive prompts share a
    # long page-aligned head for the engine's radix prefix cache
    order = ["访谈主题：", "主题说明：", "【参考文档：需求书】", "当前维度：",
             "【联网检索结果】", "历史问答：", "请生成下一个访谈问题"]
    positions = [p.index(n) for n in order]
    assert positions == sorted(positions), list(zip(order, positions))


def test_prompt_fast_tier_drops_docs_and_desc_and_clamps():
    session = make_session(
        n_log=1, docs=[{"name": "需求书", "content": "现状说明" * 200}])
    p = build_interview_prompt(session, DIM, fast_tier=True,
                               prompt_budget=400)
    assert "参考文档" not in p
    assert "主题说明" not in p
    assert len(p) <= 400


def test_prompt_follow_up_context():
    session = make_session(n_log=1)
    p = build_interview_prompt(session, DIM, is_follow_up=True,
                               follow_up_context="上一答案缺少量化数据")
    assert "请针对上一个回答进行追问" in p
    assert "上一答案缺少量化数据" in p
    assert '"is_follow_up": true' in p


# ---------------------------------------------------------------------------
# Parsing: 5 escalating strategies
# ---------------------------------------------------------------------------

GOOD = {"question": "目前的库存准确率大约是多少？",
        "options": ["95%以上", "90-95%", "90%以下"]}


def test_parse_direct_json():
    assert parse_question_response(json.dumps(GOOD, ensure_ascii=False)) \
        == GOOD


def test_parse_fenced_block():
    text = "好的，这是问题：\n```json\n%s\n```\n请参考。" % json.dumps(
        GOOD, ensure_ascii=False)
    assert parse_question_response(text)["question"] == GOOD["question"]


def test_parse_embedded_braces():
    text = "前置说明 %s 后置说明" % json.dumps(GOOD, ensure_ascii=False)
    assert parse_question_response(text)["question"] == GOOD["question"]


def test_parse_repairs_trailing_comma_and_single_quotes():
    text = "{'question': '库存周转情况如何？', 'options': ['高', '低',],}"
    parsed = parse_question_response(text)
    assert parsed["question"] == "库存周转情况如何？"
    assert parsed["options"] == ["高", "低"]


def test_parse_plain_text_fallback():
    text = "抱歉无法输出JSON。\n1. 您的仓库目前有多少SKU？\n以上。"
    parsed = parse_question_response(text)
    assert parsed["question"].startswith("您的仓库目前有多少SKU")
    assert parsed["options"] == []


def test_parse_garbage_returns_none():
    assert parse_question_response("") is None
    assert parse_question_response("完全无关的文本，没有问题。") is None
    assert parse_question_response('{"no_question": 1}') is None


# ---------------------------------------------------------------------------
# Normalization (A.2 contract)
# ---------------------------------------------------------------------------

def test_normalize_clamps_and_defaults():
    out = normalize_generated_question_result({
        "question": "长" * 500,
        "options": [f"选项{i}" for i in range(10)],
        "answer_mode": "essay",          # invalid -> default
        "evidence_intent": "max",        # invalid -> default
        "ai_recommendation": "不在选项里",
    })
    assert len(out["question"]) == 240
    assert len(out["options"]) == 6
    assert out["answer_mode"] == "pick_with_reason"
    assert out["evidence_intent"] == "medium"
    assert out["ai_recommendation"] is None  # must be one of the options
    assert out["requires_rationale"] is True


def test_normalize_too_few_options_get_defaults():
    out = normalize_generated_question_result(
        {"question": "q?", "options": ["唯一"]})
    assert out["options"] == DEFAULT_OPTIONS


def test_normalize_keeps_valid_recommendation():
    out = normalize_generated_question_result({
        "question": "q?", "options": ["A方案", "B方案"],
        "ai_recommendation": "B方案", "multi_select": True,
    })
    assert out["ai_recommendation"] == "B方案"
    assert out["multi_select"] is True
    assert out["question_multi_select"] is True


def test_quality_gate():
    assert is_question_acceptable(
        {"question": "足够长的问题？", "options": ["a", "b"]})
    assert not is_question_acceptable({"question": "短", "options": ["a", "b"]})
    assert not is_question_acceptable(
        {"question": "足够长的问题？", "options": ["a"]})


# ---------------------------------------------------------------------------
# Tiered strategy with a scripted gateway
# ---------------------------------------------------------------------------

class ScriptedGateway:
    """Programmable gateway: responses keyed by call_type."""

    def __init__(self, script):
        self.script = script            # call_type -> text | Exception
        self.calls = []                 # (call_type, prompt, kwargs)
        self.mode = "scripted"

    def call_model(self, prompt, call_type="question", *, return_meta=False,
                   **kw):
        self.calls.append((call_type, prompt, kw))
        out = self.script.get(call_type)
        if isinstance(out, Exception):
            raise out
        if callable(out):
            out = out()
        text = out if out is not None else ""
        meta = {"lane": call_type + "_lane"}
        return (text, meta) if return_meta else text


GOOD_TEXT = json.dumps(GOOD, ensure_ascii=False)


def test_fast_tier_wins_when_parseable():
    gw = ScriptedGateway({"question_fast": GOOD_TEXT})
    gen = TieredQuestionGenerator(gw)
    result, meta = gen.generate(make_session(), DIM)
    assert meta["tier_used"] == "fast"
    assert meta["selected_lane"] == "question_fast_lane"
    assert meta["attempts"] == 1
    assert meta["hedge_triggered"] is False
    assert result["question"] == GOOD["question"]
    assert [c[0] for c in gw.calls] == ["question_fast"]
    # fast tier runs with its own clamps
    assert gw.calls[0][2]["max_tokens"] == 900
    assert gw.calls[0][2]["timeout"] == pytest.approx(8.0)


def test_fast_tier_garbage_falls_through_to_full():
    gw = ScriptedGateway({"question_fast": "无法解析的输出",
                          "question": GOOD_TEXT})
    gen = TieredQuestionGenerator(gw)
    result, meta = gen.generate(make_session(), DIM)
    assert meta["tier_used"] == "full"
    assert meta["attempts"] == 2
    assert [c[0] for c in gw.calls] == ["question_fast", "question"]
    # full tier rescued a burned fast attempt = the hedge analogue fired
    assert meta["hedge_triggered"] is True


def test_fast_tier_error_falls_through_to_full():
    gw = ScriptedGateway({"question_fast": RuntimeError("engine busy"),
                          "question": GOOD_TEXT})
    gen = TieredQuestionGenerator(gw)
    _, meta = gen.generate(make_session(), DIM)
    assert meta["tier_used"] == "full"


def test_both_tiers_fail_yields_rule_fallback():
    gw = ScriptedGateway({"question_fast": RuntimeError("x"),
                          "question": RuntimeError("y")})
    gen = TieredQuestionGenerator(gw)
    result, meta = gen.generate(make_session(), DIM)
    assert meta["tier_used"] == "fallback"
    assert meta["fallback_triggered"] is True
    assert result["question"]
    assert result["options"] == DEFAULT_OPTIONS
    assert is_question_acceptable(result)


def test_fallback_cycles_key_aspects_by_round():
    gw = ScriptedGateway({})
    gen = TieredQuestionGenerator(gw)
    seen = set()
    for n in range(3):
        result, _ = gen.generate(make_session(n_log=n), DIM)
        seen.add(result["question"])
    assert len(seen) == 3  # a different aspect each round


def test_follow_up_skips_fast_tier_and_uses_deep_lane():
    gw = ScriptedGateway({"question_deep": GOOD_TEXT})
    gen = TieredQuestionGenerator(gw)
    result, meta = gen.generate(
        make_session(n_log=1), DIM, is_follow_up=True,
        follow_up_context="需要量化数据")
    assert [c[0] for c in gw.calls] == ["question_deep"]
    assert meta["tier_used"] == "full"
    assert result["is_follow_up"] is True
    assert "需要量化数据" in gw.calls[0][1]


def test_adaptive_gate_disables_fast_path_on_low_hit_rate():
    flaky = {"question_fast": "垃圾输出", "question": GOOD_TEXT}
    gw = ScriptedGateway(flaky)
    gen = TieredQuestionGenerator(gw)
    for _ in range(8):  # 8 failed fast attempts -> hit rate 0
        gen.generate(make_session(), DIM)
    assert gen.fast_path_enabled() is False
    gw.calls.clear()
    _, meta = gen.generate(make_session(), DIM)
    assert [c[0] for c in gw.calls] == ["question"]  # fast tier skipped
    assert meta["tier_used"] == "full"


def test_adaptive_gate_stays_open_on_good_hit_rate():
    gw = ScriptedGateway({"question_fast": GOOD_TEXT})
    gen = TieredQuestionGenerator(gw)
    for _ in range(12):
        gen.generate(make_session(), DIM)
    assert gen.fast_path_enabled() is True


def test_effective_fast_timeout_tracks_p90():
    gen = TieredQuestionGenerator(ScriptedGateway({}), fast_timeout=8.0)
    assert gen.effective_fast_timeout() == 8.0  # <8 samples: configured
    for ms in (0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1):
        gen._record_fast_latency(ms)
    # p90 of 100ms latencies x1.5 clamps up to the 2s floor
    assert gen.effective_fast_timeout() == 2.0
    for _ in range(40):
        gen._record_fast_latency(3.0)
    # p90=3s x1.5=4.5s < configured 8s
    assert gen.effective_fast_timeout() == pytest.approx(4.5)
    for _ in range(60):
        gen._record_fast_latency(30.0)
    # clamped at the configured ceiling
    assert gen.effective_fast_timeout() == 8.0


def test_fast_latency_buffer_bounded():
    gen = TieredQuestionGenerator(ScriptedGateway({}))
    for i in range(500):
        gen._record_fast_latency(float(i))
    assert len(gen._fast_latencies) <= 200


# ---------------------------------------------------------------------------
# Question cache
# ---------------------------------------------------------------------------

def test_question_cache_hit_miss_and_eviction():
    cache = QuestionCache(max_entries=3)
    for i in range(3):
        cache.put(QuestionCache.key(f"s{i}", "d", "sig"), {"q": i})
    assert cache.get(QuestionCache.key("s0", "d", "sig")) == {"q": 0}
    cache.put(QuestionCache.key("s3", "d", "sig"), {"q": 3})  # evicts oldest
    assert len(cache._data) == 3
    assert cache.hits >= 1
    before = cache.misses
    assert cache.get(QuestionCache.key("nope", "d", "sig")) is None
    assert cache.misses == before + 1


def test_question_cache_signature_sensitivity():
    cache = QuestionCache()
    cache.put(QuestionCache.key("s", "d", "sig-A"), {"q": 1})
    assert cache.get(QuestionCache.key("s", "d", "sig-B")) is None


def test_question_cache_invalidate_session_only():
    cache = QuestionCache()
    cache.put(QuestionCache.key("s1", "d", "x"), {"q": 1})
    cache.put(QuestionCache.key("s2", "d", "x"), {"q": 2})
    cache.invalidate_session("s1")
    assert cache.get(QuestionCache.key("s1", "d", "x")) is None
    assert cache.get(QuestionCache.key("s2", "d", "x")) == {"q": 2}


# ---------------------------------------------------------------------------
# Adaptive lane order (engine/client.py _adaptive_order)
# ---------------------------------------------------------------------------

def _gateway_with_stats(stats):
    from deepvision_tpu.engine.client import ModelGateway

    gw = ModelGateway.__new__(ModelGateway)
    gw.adaptive_lane_order = True
    gw.ADAPTIVE_MIN_SAMPLES = 6
    gw._lane_stats = stats
    return gw


def test_adaptive_order_demotes_failing_primary():
    gw = _gateway_with_stats({
        "question": {"calls": 20, "failures": 15, "ewma_ms": 100.0},
        "question_deep": {"calls": 20, "failures": 0, "ewma_ms": 400.0},
    })
    assert gw._adaptive_order(["question", "question_deep"]) == \
        ["question_deep", "question"]


def test_adaptive_order_sticky_until_min_samples():
    gw = _gateway_with_stats({
        "question": {"calls": 2, "failures": 2, "ewma_ms": 9000.0},
        "question_deep": {"calls": 2, "failures": 0, "ewma_ms": 10.0},
    })
    # below ADAPTIVE_MIN_SAMPLES both score 0 -> configured order kept
    assert gw._adaptive_order(["question", "question_deep"]) == \
        ["question", "question_deep"]


def test_adaptive_order_prefers_faster_healthy_lane():
    gw = _gateway_with_stats({
        "a": {"calls": 30, "failures": 0, "ewma_ms": 5000.0},
        "b": {"calls": 30, "failures": 0, "ewma_ms": 200.0},
    })
    assert gw._adaptive_order(["a", "b"]) == ["b", "a"]


def test_adaptive_order_disabled_passthrough():
    gw = _gateway_with_stats({})
    gw.adaptive_lane_order = False
    assert gw._adaptive_order(["x", "y"]) == ["x", "y"]


# ---------------------------------------------------------------------------
# Serving-side similarity dedupe (reference question-similarity gate
# web/server.py:20059): a draw that near-duplicates a question already in
# the session history is resampled once before being served
# ---------------------------------------------------------------------------

def _q(text):
    return json.dumps(dict(GOOD, question=text), ensure_ascii=False)


def test_dedupe_resamples_similar_question():
    asked = "在核心痛点方面，您目前遇到的最大挑战是什么？"
    session = make_session()
    session["interview_log"] = [
        {"question": asked, "answer": "回答", "dimension": "customer_needs"}
    ]
    draws = iter([_q(asked),  # near-dup of history -> must resample
                  _q("围绕使用场景，您期望系统自动化到什么程度？")])
    gw = ScriptedGateway({"question_fast": lambda: next(draws)})
    gen = TieredQuestionGenerator(gw)
    result, meta = gen.generate(session, DIM)
    assert meta["tier_used"] == "fast"
    assert meta["dedupe_resampled"] is True
    assert "使用场景" in result["question"]
    assert [c[0] for c in gw.calls] == ["question_fast", "question_fast"]


def test_dedupe_accepts_second_similar_draw():
    # both draws similar: serve the second anyway (never fall to rules
    # just because the model repeats itself)
    asked = "在核心痛点方面，您目前遇到的最大挑战是什么？"
    session = make_session()
    session["interview_log"] = [
        {"question": asked, "answer": "回答", "dimension": "customer_needs"}
    ]
    gw = ScriptedGateway({"question_fast": _q(asked)})
    gen = TieredQuestionGenerator(gw)
    result, meta = gen.generate(session, DIM)
    assert meta["tier_used"] == "fast"
    assert meta["dedupe_resampled"] is True
    assert result["question"] == asked


def test_dedupe_skipped_for_follow_ups():
    # follow-ups legitimately overlap their parent question's wording
    asked = "在核心痛点方面，您目前遇到的最大挑战是什么？"
    session = make_session()
    session["interview_log"] = [
        {"question": asked, "answer": "回答", "dimension": "customer_needs"}
    ]
    gw = ScriptedGateway({"question_deep": _q("追问：" + asked)})
    gen = TieredQuestionGenerator(gw)
    result, meta = gen.generate(session, DIM, is_follow_up=True)
    assert meta["tier_used"] == "full"
    assert meta["dedupe_resampled"] is False
    assert [c[0] for c in gw.calls] == ["question_deep"]


def test_distinct_question_served_without_resample():
    session = make_session(n_log=2)
    gw = ScriptedGateway({"question_fast": _q(
        "围绕目标用户，判断好坏的标准是什么？")})
    gen = TieredQuestionGenerator(gw)
    _, meta = gen.generate(session, DIM)
    assert meta["dedupe_resampled"] is False
    assert [c[0] for c in gw.calls] == ["question_fast"]
