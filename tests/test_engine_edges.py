"""Serving-stack edge behavior: cancellation, deadlines, overload,
page-pool exhaustion/recovery, allocator refcount invariants, priority
ordering, json-mode budget force-close, and the generate_text meta
contract.

These pin the failure-path semantics the reference enforces at the HTTP
layer (429 + Retry-After web/server.py:5400-5432, per-session locks
:2443-2500, report queue slots :4276-4280) — in this build they live in
the engine scheduler itself, so they are tested there.  CPU interpret
mode with the tiny model (SURVEY.md §4 fake-backend pattern)."""

import json
import threading
import time

import pytest

from deepvision_tpu.engine.engine import EngineConfig, LLMEngine
from deepvision_tpu.engine.kv_cache import PageAllocator
from deepvision_tpu.engine.scheduler import (
    HIGH,
    LOW,
    ContinuousBatchingScheduler,
    EngineOverloadedError,
    GenerationRequest,
)


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(
        model="dv-tiny-test",
        tokenizer="byte",
        max_slots=4,
        num_pages=64,
        page_size=16,
        max_pages_per_seq=8,
        max_pending=8,
        chunked_prefill=True,
        prefill_chunk_size=16,
        interpret=True,
    )
    eng = LLMEngine(cfg)
    eng.start()
    yield eng
    eng.shutdown()


def _drain(engine, timeout=60.0):
    """Wait until no request is pending/prefilling/active."""
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        d = engine.scheduler.queue_depths()
        if d["high"] == d["low"] == d["prefilling"] == d["active"] == 0:
            return d
        time.sleep(0.02)
    raise AssertionError(f"engine did not drain: {d}")


# ---------------------------------------------------------------------------
# resource recovery (the leak a paged KV cache makes possible)
# ---------------------------------------------------------------------------

def test_pages_and_slots_recover_after_completion(engine):
    base = _drain(engine)
    for _ in range(3):
        engine.generate_text("资源回收测试", max_tokens=6, temperature=0.0,
                             timeout=60)
    after = _drain(engine)
    assert after["free_pages"] == base["free_pages"], "KV page leak"
    assert after["free_slots"] == base["free_slots"], "slot leak"


def test_cancel_mid_decode_frees_resources(engine):
    base = _drain(engine)
    req = engine.submit_tokens([65] * 40, max_tokens=200, temperature=0.0)
    # let it get admitted and decode a few steps
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        if engine.scheduler.queue_depths()["active"] > 0:
            break
        time.sleep(0.01)
    req.cancel()
    res = req.wait(30)
    assert res is not None and res.finish_reason == "cancelled"
    after = _drain(engine)
    assert after["free_pages"] == base["free_pages"]
    assert after["free_slots"] == base["free_slots"]


def test_cancel_while_queued_finishes_immediately(engine):
    req = engine.submit_tokens([66] * 8, max_tokens=4)
    req.cancel()
    res = req.wait(30)
    assert res is not None
    assert res.finish_reason == "cancelled"
    _drain(engine)


def test_engine_deadline_returns_timeout_reason(engine):
    # deadline so tight the request cannot finish 500 tokens: the
    # scheduler must retire it with reason "timeout" (and generate_text
    # maps that to TimeoutError, reference timeout classification
    # web/server.py:26672)
    req = engine.submit_tokens([67] * 20, max_tokens=500, deadline_s=0.05)
    res = req.wait(60)
    assert res is not None
    assert res.finish_reason in ("timeout", "cancelled")
    _drain(engine)


def test_generate_text_timeout_raises_and_recovers(engine):
    base = _drain(engine)
    with pytest.raises(TimeoutError):
        engine.generate_text("超时测试" * 10, max_tokens=2000, timeout=0.05)
    after = _drain(engine)
    assert after["free_pages"] == base["free_pages"]


# ---------------------------------------------------------------------------
# overload (429-equivalent)
# ---------------------------------------------------------------------------

def test_pending_queue_overload_rejects():
    cfg = EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=1,
        num_pages=32, page_size=16, max_pages_per_seq=4, max_pending=2,
        interpret=True,
    )
    eng = LLMEngine(cfg)
    # NOT started: submissions pile up in the pending queue
    eng.scheduler.max_pending = 2
    subs = []
    with pytest.raises(EngineOverloadedError) as exc_info:
        for i in range(5):
            subs.append(eng.scheduler.submit(
                GenerationRequest([65] * 4, max_tokens=2)))
    assert eng.scheduler.rejected_overload >= 1
    assert exc_info.value.retry_after_s > 0
    assert eng.stats()["rejected_overload"] >= 1
    eng.shutdown()


def test_page_exhaustion_queues_then_recovers(engine):
    """More concurrent long-prompt requests than the page pool can hold
    at once: they must all complete eventually (queued admission), never
    crash or leak."""
    base = _drain(engine)
    results, errors = [], []
    lock = threading.Lock()

    def worker(i):
        try:
            text, meta = engine.generate_text(
                bytes([97 + i % 20] * 100).decode(), max_tokens=8,
                temperature=0.0, timeout=120)
            with lock:
                results.append(meta["completion_tokens"])
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert not errors, errors[:2]
    assert len(results) == 8
    after = _drain(engine)
    assert after["free_pages"] == base["free_pages"]


# ---------------------------------------------------------------------------
# allocator invariants
# ---------------------------------------------------------------------------

def test_allocator_refcounting_and_exhaustion():
    alloc = PageAllocator(8)  # 7 usable (page 0 is trash)
    a = alloc.alloc(4)
    assert len(a) == 4 and 0 not in a
    assert alloc.available() == 3
    with pytest.raises(MemoryError):
        alloc.alloc(4)
    assert alloc.try_alloc(4) is None
    alloc.share(a[:2])            # second ref on two pages
    alloc.free(a)                 # drops one ref on all four
    assert alloc.available() == 5  # two pages still shared
    alloc.free(a[:2])
    assert alloc.available() == 7


def test_allocator_trash_page_never_allocated():
    alloc = PageAllocator(4)
    pages = alloc.alloc(3)
    assert 0 not in pages
    alloc.free([0])               # freeing the trash page is a no-op
    assert alloc.available() == 0
    alloc.free(pages)
    assert alloc.available() == 3


# ---------------------------------------------------------------------------
# priority ordering
# ---------------------------------------------------------------------------

def _bare_scheduler():
    """Minimal state for exercising _pop_next in isolation."""
    from collections import deque

    sched = ContinuousBatchingScheduler.__new__(ContinuousBatchingScheduler)
    sched._lock = threading.Lock()
    sched._queues = {HIGH: deque(), LOW: deque()}
    sched.strict_priority = False
    sched._active = {}
    return sched


def test_high_pops_before_low_fifo_within_class(engine):
    sched = _bare_scheduler()
    l1 = GenerationRequest([1], priority=LOW, request_id="l1")
    l2 = GenerationRequest([1], priority=LOW, request_id="l2")
    h1 = GenerationRequest([1], priority=HIGH, request_id="h1")
    h2 = GenerationRequest([1], priority=HIGH, request_id="h2")
    sched._queues[LOW].extend([l1, l2])
    sched._queues[HIGH].extend([h1, h2])
    order = [sched._pop_next().request_id for _ in range(4)]
    assert order == ["h1", "h2", "l1", "l2"]


def test_pop_next_skips_cancelled_queued_requests():
    sched = _bare_scheduler()
    c = GenerationRequest([1], priority=HIGH, request_id="c")
    keep = GenerationRequest([1], priority=HIGH, request_id="keep")
    c.cancel()
    sched._queues[HIGH].extend([c, keep])
    got = sched._pop_next()
    assert got.request_id == "keep"
    # the cancelled one was finished with reason "cancelled"
    res = c.wait(1)
    assert res is not None and res.finish_reason == "cancelled"


# ---------------------------------------------------------------------------
# stop tokens / lengths / meta contract
# ---------------------------------------------------------------------------

def test_stop_token_trimmed_and_reason_stop(engine):
    # Greedily find the first token the model emits, then use it as the
    # stop token: generation must stop immediately and TRIM it.
    probe = engine.submit_tokens([70] * 10, max_tokens=3, temperature=0.0,
                                 stop_token_ids=[])
    first = probe.wait(60).token_ids[0]
    req = engine.submit_tokens([70] * 10, max_tokens=50, temperature=0.0,
                               stop_token_ids=[first])
    res = req.wait(60)
    assert res.finish_reason == "stop"
    assert first not in res.token_ids
    assert len(res.token_ids) == 0  # stopped on the very first token
    _drain(engine)


def test_max_tokens_exact_and_reason_length(engine):
    _, meta = engine.generate_text("长度测试", max_tokens=5,
                                   temperature=0.0, timeout=60)
    assert meta["completion_tokens"] <= 5
    assert meta["finish_reason"] in ("length", "stop")


def test_meta_contract_keys(engine):
    _, meta = engine.generate_text("契约", max_tokens=3, temperature=0.0,
                                   timeout=60)
    for key in ("model", "queue_wait_ms", "prefill_ms", "decode_ms",
                "total_ms", "completion_tokens", "prompt_tokens",
                "finish_reason", "json_constrained"):
        assert key in meta, key
    assert meta["model"] == "dv-tiny-test"
    assert meta["total_ms"] >= meta["decode_ms"] >= 0
    assert meta["prompt_tokens"] > 0


def test_request_ids_unique(engine):
    ids = {GenerationRequest([1]).request_id for _ in range(100)}
    assert len(ids) == 100


# ---------------------------------------------------------------------------
# json mode: grammar guarantee under budget pressure
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("budget", [8, 16, 48])
def test_json_mode_parses_even_at_tiny_budget(engine, budget):
    """Grammar-constrained decoding force-closes the JSON before the
    budget runs out — output parses BY CONSTRUCTION even with random
    weights (engine/constrained.py; reference parse-repair
    web/server.py:21685-21943 becomes unnecessary)."""
    text, meta = engine.generate_text(
        "生成JSON：", max_tokens=budget, temperature=0.7, top_k=20,
        timeout=120, json_mode=True)
    assert meta["json_constrained"] is True
    obj = json.loads(text)
    assert isinstance(obj, dict)


def test_json_mode_with_prefix_reuse_still_parses(engine):
    prompt = "共享前缀" * 30 + "JSON："
    t1, _ = engine.generate_text(prompt, max_tokens=24, temperature=0.0,
                                 timeout=120, json_mode=True,
                                 prefix_key="edge-json")
    t2, _ = engine.generate_text(prompt, max_tokens=24, temperature=0.0,
                                 timeout=120, json_mode=True,
                                 prefix_key="edge-json")
    assert json.loads(t1) == json.loads(t2), \
        "greedy json decode must be identical on the warm-prefix path"
    stats = engine.stats()["prefix_cache"]
    assert stats["hits"] >= 1
    assert stats["tokens_saved"] > 0
