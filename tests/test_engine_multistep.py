"""Multi-token fused decode through the full engine (scheduler handles
[K, B] outputs, EOS mid-window, page pre-provisioning)."""

import pytest

from deepvision_tpu.engine.engine import EngineConfig, LLMEngine


@pytest.fixture(scope="module")
def engine_k2():
    eng = LLMEngine(EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=2,
        num_pages=64, page_size=16, max_pages_per_seq=8,
        decode_steps_per_call=2, interpret=True,
    ))
    eng.start()
    yield eng
    eng.shutdown()


def test_multistep_generation_matches_single_step(engine_k2):
    t1, m1 = engine_k2.generate_text("abcdef", max_tokens=7,
                                     temperature=0.0, timeout=120)
    assert m1["completion_tokens"] <= 7
    # Deterministic across repeated calls with fused steps.
    t2, _ = engine_k2.generate_text("abcdef", max_tokens=7,
                                    temperature=0.0, timeout=120)
    assert t1 == t2


def test_multistep_respects_max_tokens_exactly(engine_k2):
    # Odd max_tokens with K=2: the scheduler must truncate the fused window.
    _, meta = engine_k2.generate_text("xyz", max_tokens=3,
                                      temperature=0.0, timeout=120)
    assert meta["completion_tokens"] <= 3
