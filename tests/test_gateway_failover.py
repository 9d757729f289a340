"""Gateway failure-path tests (SURVEY §2.3 "call_claude core" + §5
degrade chain): prompt-shrink retry on timeout, lane failover on
error/empty, circuit-breaker cooldown skipping with forced-open
fallback, adaptive lane-order demotion, and the failure meta contract.
Reference: call_claude web/server.py:26860 (shrink retry :26791-26815),
lane cooldown skip :15076, adaptive order :4049-4249."""

import pytest

from deepvision_tpu.engine.client import (
    CircuitBreaker,
    GatewayError,
    ModelGateway,
)


class FakeEngine:
    """Scriptable engine: pops one behavior per call from `script`."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []  # (prompt, kwargs)

    def generate_text(self, prompt, **kw):
        self.calls.append((prompt, kw))
        step = self.script.pop(0) if self.script else "ok"
        if step == "timeout":
            raise TimeoutError("engine deadline")
        if step == "error":
            raise RuntimeError("engine exploded")
        if step == "empty":
            return "", {"completion_tokens": 0, "total_ms": 5.0}
        return f"回复：{prompt[:20]}", {
            "completion_tokens": 12, "total_ms": 5.0}


def _gw(script, **kw):
    eng = FakeEngine(script)
    gw = ModelGateway(mode="engine", engines={"default": eng}, **kw)
    return gw, eng


def test_timeout_triggers_shrink_retry_same_lane():
    gw, eng = _gw(["timeout", "ok"])
    prompt = "长" * 1000
    text, meta = gw.call_model(prompt, call_type="summary",
                               return_meta=True)
    assert text.startswith("回复")
    assert meta["prompt_shrunk"] is True
    assert meta["attempts"] == 2
    # retry used the SAME lane with a 70%-truncated prompt + note
    assert len(eng.calls) == 2
    shrunk = eng.calls[1][0]
    assert len(shrunk) < len(prompt)
    assert "截断" in shrunk
    assert shrunk.startswith("长" * 100)


def test_error_fails_over_to_fallback_lane():
    gw, eng = _gw(["error", "ok"])
    text, meta = gw.call_model("问题", call_type="question",
                               return_meta=True)
    assert meta["lane"] == "question_deep"  # fallback of question
    assert meta["attempts"] == 2
    assert meta["failure_reason"] is None


def test_empty_response_counts_as_lane_failure():
    gw, eng = _gw(["empty", "ok"])
    text, meta = gw.call_model("问题", call_type="question",
                               return_meta=True)
    assert meta["lane"] == "question_deep"
    assert text


def test_all_lanes_failing_raises_with_meta_hook():
    seen = []
    gw, eng = _gw(["error", "error", "error"],
                  metrics_hook=lambda ct, m: seen.append(m))
    with pytest.raises(GatewayError, match="all lanes failed"):
        gw.call_model("问题", call_type="question")
    assert seen and seen[-1]["failure_reason"]
    assert seen[-1]["attempts"] >= 2


def test_breaker_cooldown_skips_lane():
    br = CircuitBreaker(threshold=1, window_s=60, cooldown_s=60)
    br.record_failure("question")
    gw, eng = _gw(["ok"], breaker=br)
    _, meta = gw.call_model("问题", call_type="question",
                            return_meta=True)
    # primary is cooling: the call must go straight to the fallback
    assert meta["lane"] == "question_deep"
    assert meta["attempts"] == 1


def test_forced_open_when_all_lanes_cooling():
    br = CircuitBreaker(threshold=1, window_s=60, cooldown_s=60)
    br.record_failure("question")
    br.record_failure("question_deep")
    gw, eng = _gw(["ok"], breaker=br)
    _, meta = gw.call_model("问题", call_type="question",
                            return_meta=True)
    # rather than refusing, the gateway forces the first candidate open
    assert meta["lane"] == "question"


def test_adaptive_order_demotes_failing_primary():
    # seed enough observed samples (>= ADAPTIVE_MIN_SAMPLES) that the
    # primary's failure rate ranks it below its healthy fallback
    gw, eng = _gw(["ok"])
    for _ in range(gw.ADAPTIVE_MIN_SAMPLES):
        gw._record_lane_stat("question", False, None)
        gw._record_lane_stat("question_deep", True, 5.0)
    stats = gw.lane_stats_snapshot()
    assert stats["question"]["failures"] >= gw.ADAPTIVE_MIN_SAMPLES
    _, meta = gw.call_model("问题", call_type="question",
                            return_meta=True)
    assert meta["lane"] == "question_deep"
    assert meta["attempts"] == 1  # no failed attempt first


def test_adaptive_order_sticky_below_min_samples():
    """Too few samples: the configured primary keeps its slot."""
    gw, eng = _gw(["ok"])
    gw._record_lane_stat("question", False, None)  # one failure only
    _, meta = gw.call_model("问题", call_type="question",
                            return_meta=True)
    assert meta["lane"] == "question"


def test_engine_mode_passes_lane_profile_parameters():
    gw, eng = _gw(["ok"])
    gw.call_model("问题", call_type="question_fast",
                  context={"session_id": "dv-x-1"})
    _, kw = eng.calls[0]
    assert kw["max_tokens"] == 900       # fast-tier cap
    assert kw["timeout"] == 8.0          # fast-tier deadline
    assert kw["prefix_key"] == "dv-x-1"  # session-keyed prefix cache


def test_json_call_types_request_constrained_decoding():
    gw, eng = _gw(["ok", "ok"])
    gw.call_model("草稿", call_type="report_draft")
    assert eng.calls[0][1]["json_mode"] is True
    gw.call_model("总结", call_type="summary")
    assert eng.calls[1][1]["json_mode"] is False


def test_explicit_overrides_beat_profile_defaults():
    gw, eng = _gw(["ok"])
    gw.call_model("问题", call_type="question", timeout=3.0,
                  max_tokens=64, temperature=0.1)
    _, kw = eng.calls[0]
    assert kw["timeout"] == 3.0
    assert kw["max_tokens"] == 64
    assert kw["temperature"] == 0.1
