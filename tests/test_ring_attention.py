"""Ring attention (sequence parallelism) vs the dense reference.

Runs on the 8 virtual CPU devices set up by conftest.py — the same way the
driver's multichip dryrun validates shardings without real chips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvision_tpu.engine.kernels.flash_attention import (
    flash_attention_reference,
)
from deepvision_tpu.engine.ring_attention import (
    SEQ_AXIS,
    make_seq_mesh,
    ring_attention,
)


def _rand(B, H, KV, S, HD, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, HD), jnp.float32)
    k = jax.random.normal(kk, (B, KV, S, HD), jnp.float32)
    v = jax.random.normal(kv_, (B, KV, S, HD), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("n_dev", [4, 8])
def test_ring_matches_dense(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    B, H, KV, S, HD = 2, 4, 4, 64, 16
    q, k, v = _rand(B, H, KV, S, HD)
    lens = jnp.asarray([S, S], jnp.int32)
    mesh = make_seq_mesh(n_dev)
    out = ring_attention(q, k, v, lens, mesh)
    ref = flash_attention_reference(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_gqa_and_padding():
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual device mesh")
    B, H, KV, S, HD = 2, 4, 2, 128, 32
    q, k, v = _rand(B, H, KV, S, HD, seed=3)
    lens = jnp.asarray([S, 70], jnp.int32)  # second sequence padded
    mesh = make_seq_mesh(8)
    out = np.asarray(ring_attention(q, k, v, lens, mesh))
    ref = np.asarray(flash_attention_reference(q, k, v, lens))
    # rows past seq_lens are junk by contract; compare valid rows only
    for b, n in enumerate([S, 70]):
        np.testing.assert_allclose(out[b, :, :n], ref[b, :, :n],
                                   rtol=2e-5, atol=2e-5)


def test_ring_under_jit_compiles_collectives():
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    B, H, KV, S, HD = 1, 2, 2, 32, 8
    q, k, v = _rand(B, H, KV, S, HD, seed=5)
    lens = jnp.asarray([S], jnp.int32)
    mesh = make_seq_mesh(4)

    @jax.jit
    def run(q, k, v, lens):
        return ring_attention(q, k, v, lens, mesh, axis=SEQ_AXIS)

    out = run(q, k, v, lens)
    ref = flash_attention_reference(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
