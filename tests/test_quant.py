"""Int8 weight-only quantization (engine/quant.py).

Pins: (1) the quantizer's per-out-channel error bound, (2) the fused
qdot path computes exactly what the dequantized weights would, (3) the
full paged prefill→decode serving path runs quantized and stays
consistent with the dense forward on the SAME quantized weights, (4) the
engine-level flag serves real text whose greedy stream tracks the bf16
engine, (5) TP4 shard_map parity — quantized shards + replicated scales
reproduce the single-device stream token for token.

The reference has no quantization (inference was remote HTTP, reference
web/server.py:26860); this is TPU-serving surface the reference
outsourced to model vendors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvision_tpu.engine import model as model_lib
from deepvision_tpu.engine.config import TINY_TEST, ModelConfig
from deepvision_tpu.engine.kv_cache import (
    CacheConfig,
    PageAllocator,
    init_cache,
)
from deepvision_tpu.engine.quant import (
    QUANT_LEAVES,
    dequantize_params,
    dequantize_weight,
    is_quantized,
    quantize_params,
    quantize_weight,
)
from deepvision_tpu.engine.weights import init_params

CFG = TINY_TEST
CACHE = CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8)


# ---------------------------------------------------------------------------
# Quantizer numerics
# ---------------------------------------------------------------------------

def test_quantize_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 64, 32)) * 0.1
    qw = quantize_weight(w)
    assert qw["q8"].dtype == jnp.int8
    assert qw["q8"].shape == w.shape
    assert qw["scale"].shape == (3, 32)
    back = dequantize_weight(qw, jnp.float32)
    # symmetric rounding error <= scale/2 per element, per out-channel
    err = np.abs(np.asarray(back) - np.asarray(w, np.float32))
    bound = np.asarray(qw["scale"])[:, None, :] * 0.5 + 1e-7
    assert (err <= bound).all()


def test_quantize_zero_column_safe():
    w = np.zeros((8, 4), np.float32)
    w[:, 1] = 3.0
    qw = quantize_weight(jnp.asarray(w))
    back = np.asarray(dequantize_weight(qw, jnp.float32))
    np.testing.assert_allclose(back, w, atol=1e-6)


def test_quantize_params_structure():
    params = init_params(CFG, seed=0)
    qp = quantize_params(params)
    assert is_quantized(qp) and not is_quantized(params)
    for name in QUANT_LEAVES:
        if name in qp["blocks"]:
            assert qp["blocks"][name]["q8"].dtype == jnp.int8
    # norms / embeddings untouched
    assert qp["embed"].dtype == params["embed"].dtype
    assert qp["blocks"]["ln1"].dtype == params["blocks"]["ln1"].dtype
    # int8 + f32 scale is ~half the bf16 block bytes
    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))
    assert nbytes(qp["blocks"]) < 0.65 * nbytes(params["blocks"])


def test_qdot_matches_dequantized_dot():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 48)) * 0.2
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 64)).astype(jnp.bfloat16)
    qw = quantize_weight(w)
    fused = model_lib.qdot(x, qw, preferred_element_type=jnp.float32)
    explicit = jnp.dot(
        x, dequantize_weight(qw, jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(explicit), rtol=2e-2, atol=2e-2
    )


# ---------------------------------------------------------------------------
# Model-level parity
# ---------------------------------------------------------------------------

def test_forward_train_quantized_tracks_bf16():
    """Greedy next-token from int8 weights agrees with bf16 on most
    positions of a random model (weight-only int8 is a small perturbation,
    not a different function)."""
    params = init_params(CFG, seed=3)
    qp = quantize_params(params)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(1, CFG.vocab_size, (2, 24)),
        jnp.int32,
    )
    ref = model_lib.forward_train(params, toks, cfg=CFG)
    out = model_lib.forward_train(qp, toks, cfg=CFG)
    assert out.shape == ref.shape
    agree = (
        np.argmax(np.asarray(ref), -1) == np.argmax(np.asarray(out), -1)
    ).mean()
    assert agree >= 0.9, f"top-1 agreement {agree}"


def test_paged_decode_quantized_matches_dense():
    """Prefill+decode through the paged cache with int8 weights must
    reproduce the dense full-sequence forward on the SAME int8 weights —
    the serving-path invariant (mirrors test_engine_model.py) holds
    under quantization."""
    params = quantize_params(init_params(CFG, seed=0))
    cache = init_cache(CFG, CACHE)
    alloc = PageAllocator(CACHE.num_pages)
    prompt = np.random.RandomState(0).randint(
        1, CFG.vocab_size, size=11).tolist()
    n_decode = 4

    S_pad = 32
    pages = alloc.alloc(S_pad // CACHE.page_size + 2)
    toks = np.zeros((1, S_pad), np.int32)
    toks[0, : len(prompt)] = prompt
    prefill_pages = np.zeros((1, S_pad // CACHE.page_size), np.int32)
    prefill_pages[0] = pages[: S_pad // CACHE.page_size]
    logits, cache = model_lib.forward_prefill(
        params, cache, jnp.asarray(toks),
        jnp.asarray([len(prompt)], jnp.int32),
        jnp.asarray(prefill_pages), cfg=CFG, interpret=True,
    )
    seq = list(prompt)
    paged_tokens = [int(jnp.argmax(logits[0]))]
    seq.append(paged_tokens[-1])
    bt = np.zeros((1, CACHE.max_pages_per_seq), np.int32)
    bt[0, : len(pages)] = pages
    for _ in range(n_decode - 1):
        logits, cache = model_lib.forward_decode(
            params, cache, jnp.asarray([seq[-1]], jnp.int32),
            jnp.asarray([len(seq)], jnp.int32), jnp.asarray(bt),
            cfg=CFG, interpret=True,
        )
        paged_tokens.append(int(jnp.argmax(logits[0])))
        seq.append(paged_tokens[-1])

    seq2 = list(prompt)
    dense_tokens = []
    for _ in range(n_decode):
        logits_all = model_lib.forward_train(
            params, jnp.asarray([seq2], jnp.int32), cfg=CFG
        )
        dense_tokens.append(int(jnp.argmax(logits_all[0, -1])))
        seq2.append(dense_tokens[-1])
    assert paged_tokens == dense_tokens


def test_dequantize_roundtrip_params():
    params = init_params(CFG, seed=5)
    back = dequantize_params(quantize_params(params))
    assert not is_quantized(back)
    for name in (n for n in QUANT_LEAVES if n in params["blocks"]):
        a = np.asarray(params["blocks"][name], np.float32)
        b = np.asarray(back["blocks"][name], np.float32)
        denom = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / denom < 0.02


# ---------------------------------------------------------------------------
# Engine + TP integration
# ---------------------------------------------------------------------------

from deepvision_tpu.engine.engine import EngineConfig, LLMEngine  # noqa: E402

TP_CFG = ModelConfig(
    name="dv-quant-tp-test", vocab_size=512, d_model=128, n_layers=2,
    n_heads=8, n_kv_heads=4, d_ff=256, head_dim=64, max_seq_len=256,
)

PROMPT = "访谈主题：供应链盘点。请生成下一个问题："


def _engine(tp=1, quantize="int8", vocab_sharded=None):
    eng = LLMEngine(EngineConfig(
        model=TP_CFG.name, tokenizer="byte",
        max_slots=2, num_pages=64, page_size=16, max_pages_per_seq=8,
        tp=tp, vocab_sharded=vocab_sharded, quantize=quantize,
        interpret=True, seed=0,
    ), model_cfg=TP_CFG)
    eng.start()
    return eng


def test_engine_serves_quantized():
    eng = _engine()
    try:
        assert is_quantized(eng.runner.params)
        out, meta = eng.generate_text(
            PROMPT, max_tokens=16, temperature=0.0, timeout=300)
    finally:
        eng.shutdown()
    assert meta["completion_tokens"] >= 1
    assert isinstance(out, str) and out


def test_engine_rejects_unknown_quantize_mode():
    with pytest.raises(ValueError):
        LLMEngine(EngineConfig(
            model=TP_CFG.name, tokenizer="byte", quantize="fp4",
            interpret=True,
        ), model_cfg=TP_CFG)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_engine_greedy_parity_tp4_quantized():
    """int8 shards + replicated per-out-channel scales under shard_map
    must reproduce the single-device quantized greedy stream."""
    ref = _engine(tp=1)
    try:
        base, _ = ref.generate_text(
            PROMPT, max_tokens=24, temperature=0.0, timeout=300)
    finally:
        ref.shutdown()
    tp = _engine(tp=4)
    try:
        out, meta = tp.generate_text(
            PROMPT, max_tokens=24, temperature=0.0, timeout=300)
    finally:
        tp.shutdown()
    assert out == base
    assert meta["completion_tokens"] >= 1


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_quantized_param_specs_match_tree():
    """The quantized spec tree must mirror the quantized param tree —
    shard_map would reject any mismatch at trace time; assert it directly
    so failures localize here."""
    from deepvision_tpu.engine.parallel import ShardPlan

    params = quantize_params(init_params(TP_CFG, seed=0))
    plan = ShardPlan.for_model(TP_CFG, 4)
    specs = plan.param_specs(TP_CFG, quantized=True)
    ps, ss = jax.tree.structure(params), jax.tree.structure(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    assert ps == ss
