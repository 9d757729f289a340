"""Pipelined decode: chained fused calls must be token-identical to the
unpipelined path (greedy), across EOS/early-finish boundaries."""

import numpy as np
import pytest

from deepvision_tpu.engine.engine import EngineConfig, LLMEngine


def _engine(pipeline: bool):
    return LLMEngine(EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=4,
        num_pages=128, page_size=16, max_pages_per_seq=8,
        decode_steps_per_call=4,
        pipeline_decode=pipeline, max_chained_decodes=3,
        interpret=True, seed=0,
    ))


PROMPTS = [
    "访谈主题：库存系统。请生成下一个问题：",
    "report draft about constraints",
    "短提示",
]


@pytest.mark.parametrize("max_tokens", [5, 23])
def test_pipelined_matches_unpipelined_greedy(max_tokens):
    outs = {}
    for pipeline in (False, True):
        eng = _engine(pipeline)
        try:
            texts = []
            for p in PROMPTS:
                text, meta = eng.generate_text(
                    p, max_tokens=max_tokens, temperature=0.0, timeout=300)
                texts.append((text, meta["completion_tokens"]))
            outs[pipeline] = texts
        finally:
            eng.shutdown()
    assert outs[False] == outs[True]


def test_pipelined_concurrent_batch():
    """Concurrent requests with different lengths finish correctly under
    chaining (early finishers' in-flight garbage tokens are discarded)."""
    import threading

    eng = _engine(True)
    results = {}
    lock = threading.Lock()

    def run(i, n):
        text, meta = eng.generate_text(
            PROMPTS[i % len(PROMPTS)], max_tokens=n, temperature=0.0,
            timeout=300)
        with lock:
            results[i] = (meta["completion_tokens"], meta["finish_reason"])

    try:
        threads = [threading.Thread(target=run, args=(i, 4 + 7 * i))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        eng.shutdown()
    assert len(results) == 4
    for i, (n_tok, reason) in results.items():
        assert n_tok >= 1
        assert reason in ("stop", "length", "eos")


def test_pipelined_respects_max_tokens():
    eng = _engine(True)
    try:
        _, meta = eng.generate_text(
            PROMPTS[0], max_tokens=9, temperature=0.0, timeout=300)
        assert meta["completion_tokens"] <= 9
    finally:
        eng.shutdown()
