"""Blockwise causal flash attention (prefill path) as a Pallas TPU kernel.

Design notes (TPU-first, not a port — the reference has no attention code at
all; its "long context" handling is prompt shrinking, reference
web/config.py:71-83):

* Grid is ``(batch, q_heads, q_blocks)``; each program holds one q block in
  VMEM and streams K/V blocks for its kv-head with an online-softmax
  accumulator, so memory is O(S) not O(S^2) and the q@k / p@v contractions
  stay on the MXU in fp32 accumulation.
* GQA is expressed in the BlockSpec index map (q head -> kv head), so no
  K/V duplication ever materializes.
* ``seq_lens`` arrives via scalar prefetch (SMEM) and masks both the causal
  boundary and right-padding, which lets callers pad S to a static bucket.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _flash_kernel(
    lens_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    blk_q: int,
    blk_k: int,
    scale: float,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)

    kv_len = lens_ref[b]
    q_start = qi * blk_q

    q = q_ref[0, 0].astype(jnp.float32) * scale  # [blk_q, hd]
    hd = q.shape[-1]

    row_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    # Number of k blocks this q block can see (causal + valid length).
    limit = jnp.minimum(q_start + blk_q, kv_len)
    num_k_blocks = pl.cdiv(limit, blk_k)

    def body(j, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[0, 0, pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [blk_q, blk_k]

        col_ids = j * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1
        )
        mask = (col_ids <= row_ids) & (col_ids < kv_len)
        s = jnp.where(mask, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jax.lax.dot_general(
            p,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((blk_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((blk_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((blk_q, hd), dtype=jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))

    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padded) rows stay finite
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seq_lens: jax.Array,
    *,
    blk_q: int = 128,
    blk_k: int = 128,
    interpret: bool | None = None,
):
    """Causal self-attention for prefill.

    Differentiable: forward runs the Pallas kernel; the backward pass
    recomputes via the dense reference (an O(S^2)-memory VJP — fine for
    fine-tuning sequence lengths; a flash backward kernel is future work).

    Args:
      q: ``[B, H, S, HD]`` queries (S padded to a multiple of ``blk_q``).
      k, v: ``[B, KV, S, HD]`` keys/values (same padded S).
      seq_lens: ``[B]`` int32 valid lengths (<= S).

    Returns:
      ``[B, H, S, HD]`` attention outputs; rows past ``seq_lens`` are junk.
    """
    if interpret is None:
        interpret = _default_interpret()
    return _flash_attention_vjp(q, k, v, seq_lens, blk_q, blk_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention_vjp(q, k, v, seq_lens, blk_q, blk_k, interpret):
    return _flash_forward(q, k, v, seq_lens, blk_q, blk_k, interpret)


def _flash_vjp_fwd(q, k, v, seq_lens, blk_q, blk_k, interpret):
    out = _flash_forward(q, k, v, seq_lens, blk_q, blk_k, interpret)
    return out, (q, k, v, seq_lens)


def _flash_vjp_bwd(blk_q, blk_k, interpret, residuals, g):
    q, k, v, seq_lens = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: flash_attention_reference(q_, k_, v_, seq_lens),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    import numpy as np

    d_lens = np.zeros(seq_lens.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, d_lens


_flash_attention_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(
    jax.jit, static_argnames=("blk_q", "blk_k", "interpret")
)
def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seq_lens: jax.Array,
    blk_q: int = 128,
    blk_k: int = 128,
    interpret: bool = False,
):
    B, H, S, HD = q.shape
    KV = k.shape[1]
    assert H % KV == 0
    q_per_kv = H // KV
    blk_q = min(blk_q, S)
    blk_k = min(blk_k, S)
    assert S % blk_q == 0 and S % blk_k == 0

    scale = HD ** -0.5

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, S // blk_q),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, HD), lambda b, h, i, lens: (b, h, i, 0)),
            pl.BlockSpec(
                (1, 1, S, HD), lambda b, h, i, lens: (b, h // q_per_kv, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, S, HD), lambda b, h, i, lens: (b, h // q_per_kv, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, blk_q, HD), lambda b, h, i, lens: (b, h, i, 0)
        ),
    )

    kernel = functools.partial(
        _flash_kernel, blk_q=blk_q, blk_k=blk_k, scale=scale
    )
    flops = 4 * B * H * S * S * HD // 2  # causal halves the work
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * S * S // 2,
        ),
    )(seq_lens.astype(jnp.int32), q, k, v)


def flash_attention_reference(q, k, v, seq_lens):
    """Readable jnp reference used by tests to validate the kernel."""
    B, H, S, HD = q.shape
    KV = k.shape[1]
    k = jnp.repeat(k, H // KV, axis=1)
    v = jnp.repeat(v, H // KV, axis=1)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (HD ** -0.5)
    row = jnp.arange(S)[:, None]
    col = jnp.arange(S)[None, :]
    causal = col <= row
    valid = col[None, :, :] < seq_lens[:, None, None]
    mask = causal[None] & valid
    s = jnp.where(mask[:, None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(
        q.dtype
    )
