"""Warmup program-set economy (VERDICT r4 #4): every compiled executable
is one more cold compile AND one more warm-boot load through the tunnel,
so the serving warmup must build exactly the canonical set — two batched
buckets x pow2 admission sizes, one shape-independent chunked program,
one decode window — and nothing else."""

import numpy as np
import pytest

from deepvision_tpu.engine.engine import EngineConfig, LLMEngine
from deepvision_tpu.engine.runner import ModelRunner

pytestmark = pytest.mark.smoke


def _engine(**kw):
    cfg = EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=2,
        num_pages=96, page_size=16, max_pages_per_seq=16,
        chunked_prefill=True, prefill_chunk_size=16,
        interpret=True, seed=0, warmup=True, **kw,
    )
    eng = LLMEngine(cfg)
    eng.start()
    return eng


def test_warmup_compiles_canonical_set_only():
    eng = _engine()
    try:
        r = eng.runner
        max_bucket = 16 * 16
        # canonical batched buckets: {min(256, max_ctx), max_ctx} = {256}
        assert r.batch_buckets == (max_bucket,)
        limit = max(eng.cfg.prefill_batch_max, eng.cfg.prefills_per_step)
        bs = set()
        b = 1
        while True:
            bs.add(b)
            if b >= limit:
                break
            b *= 2
        assert set(r._prefill_fns) == {(max_bucket, b) for b in bs}
        assert r._prefill_chunk_fn is not None
        # K=1 interleave window NOT warmed for contexts that can never
        # interleave (max ctx <= 4096)
        assert set(r._decode_fns) == {eng.cfg.decode_steps_per_call}
    finally:
        eng.shutdown()


def test_batched_prefill_pads_to_canonical_bucket():
    eng = _engine()
    try:
        r = eng.runner
        before = set(r._prefill_fns)
        # an 80-token two-prompt batch must reuse the canonical (256, 2)
        # program, not compile an (128, 2) variant
        out = eng.generate_text("短提示" * 12, max_tokens=2,
                                temperature=0.0, timeout=300)
        assert out[1]["completion_tokens"] >= 1
        assert set(r._prefill_fns) == before, (
            "admission compiled a non-canonical program")
    finally:
        eng.shutdown()


def test_mixed_lengths_share_one_batched_program():
    alloc_cfg = EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=4,
        num_pages=96, page_size=16, max_pages_per_seq=16,
        chunked_prefill=True, prefill_chunk_size=16,
        interpret=True, seed=0,
    )
    eng = LLMEngine(alloc_cfg)
    eng.start()
    try:
        r = eng.runner
        pages_a = eng.allocator.try_alloc(4)
        pages_b = eng.allocator.try_alloc(4)
        r.prefill_batch([[1] * 30, [2] * 60], [pages_a, pages_b])
        keys1 = set(r._prefill_fns)
        r.prefill_batch([[3] * 90, [4] * 120], [pages_a, pages_b])
        assert set(r._prefill_fns) == keys1 == {(256, 2)}
        eng.allocator.free(pages_a)
        eng.allocator.free(pages_b)
    finally:
        eng.shutdown()


def test_long_context_engine_warms_interleave_window():
    # a >4096-token context CAN trigger the K=1 interleave decode window;
    # it must stay in the warm set there
    r = ModelRunner.__new__(ModelRunner)  # only checking bucket policy
    from deepvision_tpu.engine.kv_cache import CacheConfig

    cache_cfg = CacheConfig(num_pages=8, page_size=64, max_pages_per_seq=128)
    max_bucket = 64 * 128
    assert max_bucket > 4096  # warmup adds K=1 for this class
