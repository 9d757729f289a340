"""Query-block paged attention kernel vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvision_tpu.engine.kernels.paged_chunk import (
    paged_chunk_attention,
    paged_chunk_attention_reference,
)


@pytest.mark.parametrize("start,total", [(0, 8), (16, 24), (30, 46)])
def test_chunk_attention_matches_reference(start, total):
    B, C, H, KV, HD = 1, 16, 4, 2, 32
    PAGE, NPAGES, MP = 8, 32, 8
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, C, H, HD), jnp.float32)
    k_pages = jax.random.normal(kk, (KV, NPAGES, PAGE, HD), jnp.float32)
    v_pages = jax.random.normal(kv_, (KV, NPAGES, PAGE, HD), jnp.float32)
    bt = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    starts = jnp.asarray([start], jnp.int32)
    lens = jnp.asarray([total], jnp.int32)

    out = paged_chunk_attention(
        q, k_pages, v_pages, bt, starts, lens, interpret=True
    )
    ref = paged_chunk_attention_reference(
        q, k_pages, v_pages, bt, starts, lens
    )
    # only rows whose position < total are meaningful
    valid = min(C, total - start)
    np.testing.assert_allclose(
        np.asarray(out)[:, :valid], np.asarray(ref)[:, :valid],
        rtol=2e-3, atol=2e-3,
    )


def test_chunk_equals_decode_for_single_query():
    """C=1 chunk must agree with the decode paged kernel."""
    from deepvision_tpu.engine.kernels.paged_attention import (
        paged_attention,
    )

    B, H, KV, HD = 2, 4, 2, 32
    PAGE, NPAGES, MP = 8, 32, 8
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, HD), jnp.float32)
    k_pages = jax.random.normal(key, (KV, NPAGES, PAGE, HD), jnp.float32)
    v_pages = jax.random.normal(key, (KV, NPAGES, PAGE, HD), jnp.float32)
    bt = jnp.asarray([[1, 2, 3, 0, 0, 0, 0, 0],
                      [4, 5, 6, 7, 0, 0, 0, 0]], jnp.int32)
    lens = jnp.asarray([20, 30], jnp.int32)

    dec = paged_attention(q, k_pages, v_pages, bt, lens, interpret=True)
    chunk = paged_chunk_attention(
        q[:, None], k_pages, v_pages, bt, lens - 1, lens, interpret=True
    )[:, 0]
    np.testing.assert_allclose(
        np.asarray(chunk), np.asarray(dec), rtol=2e-3, atol=2e-3
    )
