"""Metrics collector: percentiles, flush persistence, reset."""

import json
import os
import tempfile

from deepvision_tpu.web.meta_index import MetaIndex
from deepvision_tpu.web.metrics import MetricsCollector, StageTimer, percentiles


def test_percentiles():
    vals = list(range(1, 101))
    p = percentiles(vals)
    assert p["p50"] in (50, 51)
    assert p["p95"] in (95, 96)
    assert p["p99"] in (99, 100)
    assert percentiles([]) == {"p50": 0.0, "p95": 0.0, "p99": 0.0}


def test_collector_statistics_and_reset():
    mc = MetricsCollector()
    for i in range(10):
        mc.record_ai_call("question", {"lane": "question",
                                       "total_ms": 100 + i,
                                       "queue_wait_ms": i})
    mc.record_stage("question", "ai_call", 123.0)
    mc.record_endpoint("sessions", 9.0, 200)
    stats = mc.statistics()
    assert stats["ai_calls"]["count"] == 10
    assert stats["ai_calls"]["by_lane"]["question"] == 10
    assert stats["stage_latency"]["question.ai_call"]["count"] == 1
    assert stats["list_endpoints"]["sessions"]["count"] == 1
    mc.reset()
    assert mc.statistics()["ai_calls"]["count"] == 0


def test_flush_persists_snapshot():
    with tempfile.TemporaryDirectory() as tmp:
        meta = MetaIndex(os.path.join(tmp, "m.sqlite3"))
        mc = MetricsCollector(meta)
        mc.record_ai_call("summary", {"lane": "summary", "total_ms": 5})
        mc.flush()
        rows = meta.query(
            "SELECT payload FROM runtime_metrics_store WHERE kind='snapshot'"
        )
        assert rows
        snap = json.loads(rows[-1]["payload"])
        assert snap["ai_calls"]["count"] == 1


def test_stage_timer():
    t = StageTimer()
    t.mark("a")
    t.mark("b")
    assert set(t.stages) == {"a", "b"}
    assert all(v >= 0 for v in t.stages.values())


# ---------------------------------------------------------------------------
# Adaptive strategies (reference web/server.py:4049-4249 lane promotion;
# interview_runtime.py:1049-1283 percentile deadline)
# ---------------------------------------------------------------------------

def test_adaptive_lane_order_demotes_failing_lane():
    from deepvision_tpu.engine.client import ModelGateway

    gw = ModelGateway(mode="template")
    for _ in range(8):
        gw._record_lane_stat("question", False, None)
        gw._record_lane_stat("question_deep", True, 300.0)
    order = gw._adaptive_order(["question", "question_deep"])
    assert order == ["question_deep", "question"]


def test_adaptive_lane_order_sticky_below_min_samples():
    from deepvision_tpu.engine.client import ModelGateway

    gw = ModelGateway(mode="template")
    gw._record_lane_stat("question", False, None)  # 1 sample only
    assert gw._adaptive_order(["question", "question_deep"]) == [
        "question", "question_deep"]


def test_effective_fast_timeout_percentile():
    from deepvision_tpu.web.runtime.interview import TieredQuestionGenerator

    gen = TieredQuestionGenerator(gateway=None, fast_timeout=8.0)
    assert gen.effective_fast_timeout() == 8.0  # too few samples
    for _ in range(20):
        gen._record_fast_latency(0.5)
    # p90=0.5 -> 0.75s, clamped up to the 2s floor
    assert gen.effective_fast_timeout() == 2.0
    for _ in range(40):
        gen._record_fast_latency(4.0)
    t = gen.effective_fast_timeout()
    assert 5.9 <= t <= 8.0
