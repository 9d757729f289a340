"""Kernel correctness: Pallas flash/paged attention vs jnp references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvision_tpu.engine.kernels.flash_attention import (
    flash_attention,
    flash_attention_reference,
)
from deepvision_tpu.engine.kernels.paged_attention import (
    paged_attention,
    paged_attention_reference,
)


@pytest.mark.parametrize("seq_lens", [[256, 100], [1, 256], [37, 200]])
def test_flash_attention_matches_reference(seq_lens):
    B, H, KV, S, HD = 2, 4, 2, 256, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, HD), jnp.float32)
    k = jax.random.normal(kk, (B, KV, S, HD), jnp.float32)
    v = jax.random.normal(kv_, (B, KV, S, HD), jnp.float32)
    lens = jnp.asarray(seq_lens, jnp.int32)

    out = flash_attention(q, k, v, lens, blk_q=64, blk_k=64, interpret=True)
    ref = flash_attention_reference(q, k, v, lens)
    for b in range(B):
        n = seq_lens[b]
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :n], np.asarray(ref)[b, :, :n],
            rtol=2e-3, atol=2e-3,
        )


def test_flash_attention_bf16():
    B, H, KV, S, HD = 1, 4, 4, 128, 64
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, S, HD), jnp.bfloat16)
    k = jax.random.normal(key, (B, KV, S, HD), jnp.bfloat16)
    v = jax.random.normal(key, (B, KV, S, HD), jnp.bfloat16)
    lens = jnp.asarray([128], jnp.int32)
    out = flash_attention(q, k, v, lens, interpret=True)
    ref = flash_attention_reference(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


@pytest.mark.parametrize("seq_lens", [[5, 64], [1, 1], [63, 130]])
def test_paged_attention_matches_reference(seq_lens):
    B, H, KV, HD = 2, 8, 2, 64
    PAGE, N_PAGES, MAX_PAGES = 16, 64, 16
    key = jax.random.PRNGKey(2)
    kq, kk, kv_, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, H, HD), jnp.float32)
    k_pages = jax.random.normal(kk, (KV, N_PAGES, PAGE, HD), jnp.float32)
    v_pages = jax.random.normal(kv_, (KV, N_PAGES, PAGE, HD), jnp.float32)
    # Distinct non-zero pages per sequence.
    bt = np.zeros((B, MAX_PAGES), np.int32)
    rng = np.random.RandomState(0)
    perm = rng.permutation(np.arange(1, N_PAGES))
    i = 0
    for b in range(B):
        npages = -(-seq_lens[b] // PAGE)
        bt[b, :npages] = perm[i : i + npages]
        i += npages
    lens = jnp.asarray(seq_lens, jnp.int32)
    bt = jnp.asarray(bt)

    out = paged_attention(q, k_pages, v_pages, bt, lens, interpret=True)
    ref = paged_attention_reference(q, k_pages, v_pages, bt, lens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_paged_attention_mqa_single_kv_head():
    """MQA layout (Gemma-style n_kv_heads=1) exercises the q-head padding."""
    B, H, KV, HD = 1, 4, 1, 32
    PAGE, N_PAGES, MAX_PAGES = 8, 16, 8
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, H, HD), jnp.float32)
    k_pages = jax.random.normal(key, (KV, N_PAGES, PAGE, HD), jnp.float32)
    v_pages = jax.random.normal(key, (KV, N_PAGES, PAGE, HD), jnp.float32)
    bt = jnp.asarray([[3, 7, 1, 0, 0, 0, 0, 0]], jnp.int32)
    lens = jnp.asarray([20], jnp.int32)
    out = paged_attention(q, k_pages, v_pages, bt, lens, interpret=True)
    ref = paged_attention_reference(q, k_pages, v_pages, bt, lens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("blk,S", [(256, 512), (512, 512), (512, 1024)])
def test_flash_attention_large_blocks_match_reference(blk, S):
    """The r5 serving default picks 512/256 blocks for big buckets
    (model.forward_prefill); parity must hold with ragged seq_lens
    shorter than one block."""
    B, H, KV, HD = 2, 4, 2, 64
    key = jax.random.PRNGKey(3)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, HD), jnp.float32)
    k = jax.random.normal(kk, (B, KV, S, HD), jnp.float32)
    v = jax.random.normal(kv_, (B, KV, S, HD), jnp.float32)
    seq_lens = [S - 7, 33]  # one near-full, one far below blk
    lens = jnp.asarray(seq_lens, jnp.int32)
    out = flash_attention(q, k, v, lens, blk_q=blk, blk_k=blk,
                          interpret=True)
    ref = flash_attention_reference(q, k, v, lens)
    for b in range(B):
        n = seq_lens[b]
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :n], np.asarray(ref)[b, :, :n],
            rtol=2e-3, atol=2e-3,
        )
