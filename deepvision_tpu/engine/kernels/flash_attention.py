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

    Differentiable: forward runs the Pallas kernel; the backward pass runs
    blockwise Pallas kernels too (``_flash_bwd_dq`` recomputes row logsumexp
    and produces dQ; ``_flash_bwd_dkv`` consumes it for dK/dV), so VJP
    residuals are O(S) per layer — this is what lets dv-base train at the
    full 2048-token serving window.  Falls back to the dense-recompute VJP
    when the per-program q-group footprint would not fit VMEM (large
    ``q_per_kv * S``).

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
    return out, (q, k, v, seq_lens, out)


# The dK/dV kernel holds one kv-head's full query group [G, S, HD] (q and
# dO, bf16) in VMEM; above this budget fall back to the dense VJP.
_DKV_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _flash_vjp_bwd(blk_q, blk_k, interpret, residuals, g):
    q, k, v, seq_lens, out = residuals
    B, H, S, HD = q.shape
    KV = k.shape[1]
    group_bytes = 2 * (H // KV) * S * HD * q.dtype.itemsize
    if group_bytes > _DKV_VMEM_BUDGET_BYTES:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: flash_attention_reference(q_, k_, v_, seq_lens),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _flash_backward(
            q, k, v, seq_lens, out, g,
            blk_q=blk_q, blk_k=blk_k, interpret=interpret,
        )
    import numpy as np

    d_lens = np.zeros(seq_lens.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, d_lens


_flash_attention_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# Flash backward kernels.
#
# Standard two-kernel decomposition (FlashAttention-2 style):
#   dQ kernel  — grid (B, H, q_blocks); streams K/V blocks accumulating dQ.
#   dKV kernel — grid (B, KV, k_blocks); holds one K/V block, streams the
#                kv-head's query group (GQA folded via reshape, no K/V
#                duplication) accumulating dK and dV.
# The row softmax statistics (lse) and D = rowsum(dO * O) are O(S)-memory
# jnp precomputes shared by both kernels; they enter the kernels as
# full-tile [n_qb, blk_q] blocks (Mosaic requires the last two block dims
# to be (8k, 128k)-aligned OR equal to the array dims — a (1, blk_q) row
# block is not lowerable, learned on real hardware).
# ---------------------------------------------------------------------------


def _row_logsumexp(q, k, seq_lens, *, blk_k: int, scale: float):
    """Per-row causal logsumexp, blockwise over k: O(S) memory, pure XLA.

    One extra QK^T pass (~1/7 of total backward matmul FLOPs) buys kernel
    simplicity: both backward kernels consume lse as a plain input.
    """
    B, H, S, HD = q.shape
    KV = k.shape[1]
    if KV != H:
        k = jnp.repeat(k, H // KV, axis=1)
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    rows = jnp.arange(S)[:, None]

    def body(carry, jb):
        m_prev, l_prev = carry
        k_blk = jax.lax.dynamic_slice_in_dim(kf, jb * blk_k, blk_k, axis=2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk)
        cols = jb * blk_k + jnp.arange(blk_k)[None, :]
        mask = (cols <= rows) & (
            cols[None] < seq_lens[:, None, None])  # [B, S, blk_k]
        s = jnp.where(mask[:, None], s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        l_new = (l_prev * jnp.exp(m_prev - m_new)
                 + jnp.sum(jnp.exp(s - m_new[..., None]), axis=-1))
        return (m_new, l_new), None

    m0 = jnp.full((B, H, S), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, S), jnp.float32)
    (m, l), _ = jax.lax.scan(body, (m0, l0), jnp.arange(S // blk_k))
    l = jnp.where(l == 0.0, 1.0, l)
    return m + jnp.log(l)  # [B, H, S]


def _flash_bwd_dq_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
    dq_ref,
    *, blk_q: int, blk_k: int, scale: float,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)

    kv_len = lens_ref[b]
    q_start = qi * blk_q

    q = q_ref[0, 0].astype(jnp.float32) * scale      # [blk_q, hd]
    do = do_ref[0, 0].astype(jnp.float32)            # [blk_q, hd]
    # lse/d arrive as full [n_qb, blk_q] tiles; take this program's row
    lse = lse_ref[0, 0, pl.ds(qi, 1), :]             # [1, blk_q]
    d_row = d_ref[0, 0, pl.ds(qi, 1), :]             # [1, blk_q]
    hd = q.shape[-1]

    row_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
    limit = jnp.minimum(q_start + blk_q, kv_len)
    num_k_blocks = pl.cdiv(limit, blk_k)

    def grad_body(j, acc):
        k = k_ref[0, 0, pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        col_ids = j * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1
        )
        mask = (col_ids <= row_ids) & (col_ids < kv_len)
        p = jnp.where(mask, jnp.exp(s - lse[0][:, None]), 0.0)
        v = v_ref[0, 0, pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [blk_q, blk_k]
        ds = p * (dp - d_row[0][:, None])
        return acc + jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc0 = jnp.zeros((blk_q, hd), dtype=jnp.float32)
    dq = jax.lax.fori_loop(0, num_k_blocks, grad_body, acc0)
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
    dk_ref, dv_ref,
    *, blk_q: int, blk_k: int, scale: float, q_per_kv: int,
):
    b = pl.program_id(0)
    ki = pl.program_id(2)

    kv_len = lens_ref[b]
    k_start = ki * blk_k

    k = k_ref[0, 0].astype(jnp.float32)               # [blk_k, hd]
    v = v_ref[0, 0].astype(jnp.float32)               # [blk_k, hd]
    hd = k.shape[-1]
    S = q_ref.shape[3]

    col_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
    qb_start = k_start // blk_q
    num_qb = pl.cdiv(kv_len, blk_q)

    dk_acc = jnp.zeros((blk_k, hd), dtype=jnp.float32)
    dv_acc = jnp.zeros((blk_k, hd), dtype=jnp.float32)
    for g in range(q_per_kv):  # static unroll over the GQA group
        def body(qb, carry):
            dk_a, dv_a = carry
            q_start = qb * blk_q
            qg = q_ref[0, 0, g, pl.ds(q_start, blk_q), :].astype(
                jnp.float32) * scale                  # [blk_q, hd]
            dog = do_ref[0, 0, g, pl.ds(q_start, blk_q), :].astype(
                jnp.float32)
            lse = lse_ref[0, 0, g, pl.ds(qb, 1), :]    # [1, blk_q]
            d_row = d_ref[0, 0, g, pl.ds(qb, 1), :]    # [1, blk_q]

            s = jax.lax.dot_general(
                qg, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # [blk_q, blk_k]
            row_ids = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 0
            )
            mask = ((col_ids <= row_ids) & (col_ids < kv_len)
                    & (row_ids < kv_len))
            p = jnp.where(mask, jnp.exp(s - lse[0][:, None]), 0.0)
            dv_a = dv_a + jax.lax.dot_general(
                p, dog, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # [blk_k, hd]
            dp = jax.lax.dot_general(
                dog, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - d_row[0][:, None])
            dk_a = dk_a + jax.lax.dot_general(
                ds, qg, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # [blk_k, hd]
            return dk_a, dv_a

        dk_acc, dv_acc = jax.lax.fori_loop(
            qb_start, num_qb, body, (dk_acc, dv_acc)
        )

    dk_ref[0, 0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("blk_q", "blk_k", "interpret")
)
def _flash_backward(
    q, k, v, seq_lens, out, g,
    *, blk_q: int = 128, blk_k: int = 128, interpret: bool = False,
):
    B, H, S, HD = q.shape
    KV = k.shape[1]
    assert H % KV == 0
    q_per_kv = H // KV
    blk_q = min(blk_q, S)
    blk_k = min(blk_k, S)
    assert S % blk_q == 0 and S % blk_k == 0
    scale = HD ** -0.5
    n_qb = S // blk_q
    lens32 = seq_lens.astype(jnp.int32)

    # O(S)-memory jnp precomputes shared by both kernels, blocked to
    # [B, H, n_qb, blk_q] so they enter as full-tile (Mosaic-legal) blocks.
    d = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    d_blocked = d.reshape(B, H, n_qb, blk_q)
    lse = _row_logsumexp(q, k, lens32, blk_k=blk_k, scale=scale)
    lse_blocked = lse.reshape(B, H, n_qb, blk_q)

    # -- dQ ----------------------------------------------------------------
    full_rows = pl.BlockSpec(
        (1, 1, n_qb, blk_q), lambda b, h, i, lens: (b, h, 0, 0)
    )
    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, n_qb),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, HD), lambda b, h, i, lens: (b, h, i, 0)),
            pl.BlockSpec(
                (1, 1, S, HD), lambda b, h, i, lens: (b, h // q_per_kv, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, S, HD), lambda b, h, i, lens: (b, h // q_per_kv, 0, 0)
            ),
            pl.BlockSpec((1, 1, blk_q, HD), lambda b, h, i, lens: (b, h, i, 0)),
            full_rows,
            full_rows,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, blk_q, HD), lambda b, h, i, lens: (b, h, i, 0)
        ),
    )
    flops_dq = 3 * 4 * B * H * S * S * HD // 2
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, blk_q=blk_q, blk_k=blk_k, scale=scale
        ),
        grid_spec=dq_grid,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_dq,
            bytes_accessed=(2 * q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * S * S // 2,
        ),
    )(lens32, q, k, v, g, lse_blocked, d_blocked)

    # -- dK/dV (GQA group folded via reshape; no K/V duplication) ----------
    q5 = q.reshape(B, KV, q_per_kv, S, HD)
    do5 = g.reshape(B, KV, q_per_kv, S, HD)
    lse5 = lse_blocked.reshape(B, KV, q_per_kv, n_qb, blk_q)
    d5 = d_blocked.reshape(B, KV, q_per_kv, n_qb, blk_q)
    n_kb = S // blk_k
    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KV, n_kb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, q_per_kv, S, HD), lambda b, h, i, lens: (b, h, 0, 0, 0)
            ),
            pl.BlockSpec((1, 1, blk_k, HD), lambda b, h, i, lens: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk_k, HD), lambda b, h, i, lens: (b, h, i, 0)),
            pl.BlockSpec(
                (1, 1, q_per_kv, S, HD), lambda b, h, i, lens: (b, h, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, q_per_kv, n_qb, blk_q),
                lambda b, h, i, lens: (b, h, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, q_per_kv, n_qb, blk_q),
                lambda b, h, i, lens: (b, h, 0, 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk_k, HD), lambda b, h, i, lens: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk_k, HD), lambda b, h, i, lens: (b, h, i, 0)),
        ],
    )
    flops_dkv = 4 * 4 * B * H * S * S * HD // 2
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, blk_q=blk_q, blk_k=blk_k, scale=scale,
            q_per_kv=q_per_kv,
        ),
        grid_spec=dkv_grid,
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_dkv,
            bytes_accessed=(2 * q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * S * S // 2,
        ),
    )(lens32, q5, k, v, do5, lse5, d5)
    return dq, dk, dv


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
