"""Fused serving projections (engine/fuse.py): w_qkv / w_gate_up.

Greedy serving output must match the unfused weights exactly at tiny
scale (the fused matmul computes the same dot products), and fusion must
compose with int8 quantization (fuse first, then quantize)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepvision_tpu.engine import model as model_lib
from deepvision_tpu.engine.config import TINY_TEST
from deepvision_tpu.engine.engine import EngineConfig, LLMEngine
from deepvision_tpu.engine.fuse import fuse_params, is_fused
from deepvision_tpu.engine.quant import is_quantized, quantize_params
from deepvision_tpu.engine.weights import count_params, init_params

CFG = TINY_TEST
PROMPT = "访谈主题：仓储布局。请生成下一个问题："


def test_fuse_structure_and_param_count():
    params = init_params(CFG, seed=0)
    fused = fuse_params(params, CFG)
    assert is_fused(fused) and not is_fused(params)
    for gone in ("wq", "wk", "wv", "w_gate", "w_up"):
        assert gone not in fused["blocks"]
    assert count_params(fused) == count_params(params)
    D = CFG.d_model
    assert fused["blocks"]["w_qkv"].shape == (
        CFG.n_layers, D,
        (CFG.n_heads + 2 * CFG.n_kv_heads) * CFG.head_dim)
    assert fused["blocks"]["w_gate_up"].shape == (
        CFG.n_layers, D, 2 * CFG.d_ff)


def test_fused_forward_matches_unfused():
    params = init_params(CFG, seed=1)
    fused = fuse_params(params, CFG)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(1, CFG.vocab_size, (2, 16)),
        jnp.int32)
    a = model_lib.forward_train(params, toks, cfg=CFG)
    b = model_lib.forward_train(fused, toks, cfg=CFG)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_fuse_then_quantize_composes():
    params = init_params(CFG, seed=2)
    fq = quantize_params(fuse_params(params, CFG))
    assert is_fused(fq) and is_quantized(fq)
    assert fq["blocks"]["w_qkv"]["q8"].dtype == jnp.int8
    toks = jnp.asarray(
        np.random.RandomState(1).randint(1, CFG.vocab_size, (1, 12)),
        jnp.int32)
    ref = model_lib.forward_train(params, toks, cfg=CFG)
    out = model_lib.forward_train(fq, toks, cfg=CFG)
    agree = (np.argmax(np.asarray(ref), -1)
             == np.argmax(np.asarray(out), -1)).mean()
    assert agree >= 0.9


def test_quantize_then_fuse_rejected():
    params = quantize_params(init_params(CFG, seed=3))
    with pytest.raises(ValueError):
        fuse_params(params, CFG)


def _engine(fuse: bool, quantize: str = ""):
    eng = LLMEngine(EngineConfig(
        model=CFG.name, tokenizer="byte",
        max_slots=2, num_pages=64, page_size=16, max_pages_per_seq=8,
        fuse_projections=fuse, quantize=quantize, interpret=True, seed=0,
    ), model_cfg=CFG)
    eng.start()
    return eng


def test_engine_greedy_parity_fused():
    ref = _engine(fuse=False)
    try:
        base, _ = ref.generate_text(
            PROMPT, max_tokens=24, temperature=0.0, timeout=300)
    finally:
        ref.shutdown()
    eng = _engine(fuse=True)
    try:
        assert is_fused(eng.runner.params)
        out, meta = eng.generate_text(
            PROMPT, max_tokens=24, temperature=0.0, timeout=300)
    finally:
        eng.shutdown()
    assert out == base
    assert meta["completion_tokens"] >= 1


def test_engine_fused_quantized_serves():
    eng = _engine(fuse=True, quantize="int8")
    try:
        assert is_fused(eng.runner.params)
        assert is_quantized(eng.runner.params)
        out, meta = eng.generate_text(
            PROMPT, max_tokens=16, temperature=0.0, timeout=300)
    finally:
        eng.shutdown()
    assert meta["completion_tokens"] >= 1
