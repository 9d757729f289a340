"""Randomized concurrency fuzz of the continuous-batching scheduler.

The directed edge tests (tests/test_engine_edges.py) pin one failure
path at a time; this suite drives the REAL engine (tiny model, CPU
interpret) with hundreds of randomly-shaped concurrent requests —
mixed priorities, json/plain, tiny/large budgets, prefix keys, random
cancellations mid-flight, random deadlines, bursts beyond the slot and
pending caps — and then asserts the global invariants that no
interleaving may break:

  * every submitted request FINISHES with a legal reason;
  * cancelled requests report cancelled/stop, never hang;
  * after the storm drains: zero active slots, zero prefill jobs, all
    non-cached pages returned (allocator conservation vs the prefix
    cache's accounted pages), slot set complete;
  * json_mode survivors parse (grammar guarantee holds under chaos);
  * the engine still serves a clean request afterwards.

Seeded: failures reproduce.  This is the role the reference's race
-detector CI plays for its threaded server (SURVEY.md §5).
"""

import random
import threading
import time

import pytest

from deepvision_tpu.engine.engine import EngineConfig, LLMEngine
from deepvision_tpu.engine.scheduler import HIGH, LOW

N_REQUESTS = 120
LEGAL_REASONS = {"stop", "length", "cancelled", "timeout", "error"}


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(
        model="dv-tiny-test",
        tokenizer="byte",
        max_slots=4,
        num_pages=96,
        page_size=16,
        max_pages_per_seq=8,
        max_pending=256,          # the fuzz floods; shed tested elsewhere
        chunked_prefill=True,
        prefill_chunk_size=16,
        interpret=True,
    )
    eng = LLMEngine(cfg)
    eng.start()
    yield eng
    eng.shutdown()


def _drain(engine, timeout=120.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        d = engine.scheduler.queue_depths()
        if d["high"] == d["low"] == d["prefilling"] == d["active"] == 0:
            return d
        time.sleep(0.02)
    raise AssertionError(f"engine did not drain: {d}")


def test_request_storm_preserves_invariants(engine):
    rng = random.Random(20260821)
    results = {}
    lock = threading.Lock()
    cancels = []

    free_before = engine.allocator.available()
    cached_before = engine.scheduler.prefix_cache.stats()["pages"] \
        if engine.scheduler.prefix_cache else 0

    def worker(i):
        prompt = ("访谈主题" * rng.randint(1, 20))[: rng.randint(4, 100)]
        json_mode = rng.random() < 0.4
        toks = engine.tokenizer.encode(prompt)
        try:
            handle = engine.submit_tokens(
                toks,
                max_tokens=rng.choice([1, 2, 8, 24, 64]),
                temperature=rng.choice([0.0, 0.7, 1.0]),
                top_k=rng.choice([0, 5, 40]),
                priority=rng.choice([HIGH, LOW]),
                json_mode=json_mode and engine.json_dfa is not None,
                prefix_key=rng.choice([None, "fuzz-a", "fuzz-b", f"u{i%7}"]),
                deadline_s=rng.choice([None, None, None, 5.0]),
            )
        except Exception as e:  # noqa: BLE001 — overload shed is legal
            with lock:
                results[i] = ("shed", type(e).__name__, json_mode)
            return
        if rng.random() < 0.25:
            delay = rng.random() * 0.2
            cancels.append((handle, delay))
            threading.Timer(delay, handle.cancel).start()
        res = handle.wait(timeout=180)
        assert res is not None, f"request {i} never finished"
        text = engine.tokenizer.decode(res.token_ids)
        with lock:
            results[i] = (res.finish_reason, text, json_mode)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(N_REQUESTS)]
    for t in threads:
        t.start()
        if rng.random() < 0.3:
            time.sleep(rng.random() * 0.01)  # vary arrival shape
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "a request hung past the join deadline"

    # every request finished with a legal reason
    assert len(results) == N_REQUESTS
    for i, (reason, _text, _jm) in results.items():
        if reason == "shed":
            continue
        assert reason in LEGAL_REASONS, (i, reason)

    d = _drain(engine)
    assert d["active"] == 0 and d["prefilling"] == 0

    # page conservation: everything except prefix-cache growth came back
    cached_after = engine.scheduler.prefix_cache.stats()["pages"] \
        if engine.scheduler.prefix_cache else 0
    free_after = engine.allocator.available()
    assert free_before - free_after == cached_after - cached_before, (
        free_before, free_after, cached_before, cached_after)

    # all slots recovered
    assert len(engine.scheduler._free_slots) == engine.cfg.max_slots

    # grammar guarantee survived the storm: completed json_mode outputs
    # parse (tiny budgets may legally finish as length/cancelled)
    import json as _json

    checked = 0
    for reason, text, jm in results.values():
        if jm and reason == "stop" and text:
            _json.loads(text)
            checked += 1
    assert checked > 0, "fuzz produced no completed json_mode outputs"

    # the engine is still healthy
    text, meta = engine.generate_text("收尾问题：系统现状如何？",
                                      max_tokens=8, temperature=0.0,
                                      timeout=60)
    assert meta["finish_reason"] in ("stop", "length")


def test_storm_of_pure_cancellations(engine):
    """Cancel EVERY request, at random points including pre-admission;
    the pool and slots must come back whole."""
    rng = random.Random(7)
    free_before = engine.allocator.available()
    cached_before = engine.scheduler.prefix_cache.stats()["pages"] \
        if engine.scheduler.prefix_cache else 0
    handles = []
    for i in range(40):
        h = engine.submit_tokens(
            engine.tokenizer.encode("取消风暴" * rng.randint(1, 10)),
            max_tokens=32, temperature=0.5, prefix_key=None)
        handles.append(h)
        if rng.random() < 0.5:
            h.cancel()
        else:
            threading.Timer(rng.random() * 0.1, h.cancel).start()
    for h in handles:
        res = h.wait(timeout=120)
        assert res is not None and res.finish_reason in LEGAL_REASONS
    _drain(engine)
    cached_after = engine.scheduler.prefix_cache.stats()["pages"] \
        if engine.scheduler.prefix_cache else 0
    assert engine.allocator.available() == \
        free_before - (cached_after - cached_before)
    assert len(engine.scheduler._free_slots) == engine.cfg.max_slots
