"""Query-block paged attention: a chunk of C queries over the page pool.

This is the chunked-prefill kernel (SURVEY.md §7 "hard parts" — prefill must
not stall decode): a prompt is processed C tokens at a time; each chunk's
K/V pages are written first (XLA scatter — one pool copy per *chunk*, which
amortizes to noise, unlike per-token decode), then every query row attends
over all pages up to its own position.

Grid ``(B, KV)``; q block ``[C * G, HD]`` where row ``r`` is query position
``chunk_start + r // G`` of head-group member ``r % G``.  Causality is the
per-row position mask; pages stream through double-buffered VMEM like the
decode kernel.
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


def _chunk_kernel(
    bt_ref,       # [B, MP] block tables
    starts_ref,   # [B] chunk start position
    lens_ref,     # [B] total length incl. this chunk
    ks_ref,       # [KV] f32 K dequant scales (all 1.0 for bf16 pools)
    vs_ref,       # [KV] f32 V dequant scales
    q_ref,        # [1, 1, C*G, HD]
    kp_ref,       # [KV, N, P, HD] HBM
    vp_ref,       # [KV, N, P, HD] HBM
    o_ref,        # [1, 1, C*G, HD]
    k_buf, v_buf, sems,
    *,
    page_size: int,
    group: int,
    scale: float,
):
    b = pl.program_id(0)
    kv = pl.program_id(1)
    n = lens_ref[b]
    start = starts_ref[b]
    num_pages = pl.cdiv(n, page_size)

    def k_copy(slot, p):
        return pltpu.make_async_copy(
            kp_ref.at[kv, bt_ref[b, p]], k_buf.at[slot], sems.at[0, slot]
        )

    def v_copy(slot, p):
        return pltpu.make_async_copy(
            vp_ref.at[kv, bt_ref[b, p]], v_buf.at[slot], sems.at[1, slot]
        )

    k_copy(0, 0).start()
    v_copy(0, 0).start()

    # int8 pools: K scale folds into the q-scale, V scale into the final
    # normalize (see paged_attention.py) — dequant costs no extra FLOPs.
    q = q_ref[0, 0].astype(jnp.float32) * (scale * ks_ref[kv])  # [C*G, HD]
    rows, hd = q.shape
    # query position per row: start + row // group
    q_pos = start + jax.lax.broadcasted_iota(
        jnp.int32, (rows, page_size), 0
    ) // group
    col_base = jax.lax.broadcasted_iota(jnp.int32, (rows, page_size), 1)

    def body(p, carry):
        m_prev, l_prev, acc_prev = carry
        slot = jax.lax.rem(p, 2)
        next_slot = jax.lax.rem(p + 1, 2)

        @pl.when(p + 1 < num_pages)
        def _():
            k_copy(next_slot, p + 1).start()
            v_copy(next_slot, p + 1).start()

        k_copy(slot, p).wait()
        v_copy(slot, p).wait()
        k = k_buf[slot].astype(jnp.float32)
        v = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, P]
        col = p * page_size + col_base
        mask = (col <= q_pos) & (col < n)
        s = jnp.where(mask, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        pij = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(pij, axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jax.lax.dot_general(
            pij, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((rows, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((rows, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((rows, hd), dtype=jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_pages, body, (m0, l0, acc0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l * vs_ref[kv]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_chunk_attention(
    q: jax.Array,            # [B, C, H, HD] — chunk queries (RoPE'd)
    k_pages: jax.Array,      # [KV, N, P, HD] (chunk K/V already written)
    v_pages: jax.Array,
    block_tables: jax.Array,  # [B, MP]
    chunk_starts: jax.Array,  # [B] position of the chunk's first query
    seq_lens: jax.Array,      # [B] total length incl. this chunk
    *,
    k_scale: jax.Array | None = None,   # [KV] — int8 pools only
    v_scale: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Returns ``[B, C, H, HD]`` attention outputs for the chunk."""
    if interpret is None:
        interpret = _default_interpret()
    B, C, H, HD = q.shape
    KV, N, P, _ = k_pages.shape
    if k_scale is None:
        k_scale = jnp.ones(KV, jnp.float32)
    if v_scale is None:
        v_scale = jnp.ones(KV, jnp.float32)
    g = H // KV

    # [B, C, H, HD] -> [B, KV, C*G, HD]; row r = query (r // g), member r%g
    qg = (
        q.reshape(B, C, KV, g, HD)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, KV, C * g, HD)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, KV),
        in_specs=[
            pl.BlockSpec(
                (1, 1, C * g, HD), lambda b, kv, *_: (b, kv, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, C * g, HD), lambda b, kv, *_: (b, kv, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, P, HD), k_pages.dtype),
            pltpu.VMEM((2, P, HD), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _chunk_kernel, page_size=P, group=g, scale=HD ** -0.5
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, C * g, HD), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        block_tables.astype(jnp.int32),
        chunk_starts.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        k_scale.astype(jnp.float32),
        v_scale.astype(jnp.float32),
        qg, k_pages, v_pages,
    )
    return (
        out.reshape(B, KV, C, g, HD)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, C, H, HD)
    )


def paged_chunk_attention_reference(
    q, k_pages, v_pages, block_tables, chunk_starts, seq_lens,
    k_scale=None, v_scale=None,
):
    """Dense jnp reference for tests."""
    B, C, H, HD = q.shape
    KV, N, P, _ = k_pages.shape
    MP = block_tables.shape[1]
    if k_pages.dtype == jnp.int8:
        ks = (k_scale if k_scale is not None
              else jnp.ones(KV, jnp.float32))[:, None, None, None]
        vs = (v_scale if v_scale is not None
              else jnp.ones(KV, jnp.float32))[:, None, None, None]
        k_pages = k_pages.astype(jnp.float32) * ks
        v_pages = v_pages.astype(jnp.float32) * vs
    k = k_pages[:, block_tables].transpose(1, 2, 3, 0, 4).reshape(
        B, MP * P, KV, HD
    )
    v = v_pages[:, block_tables].transpose(1, 2, 3, 0, 4).reshape(
        B, MP * P, KV, HD
    )
    k = jnp.repeat(k, H // KV, axis=2)
    v = jnp.repeat(v, H // KV, axis=2)
    s = jnp.einsum(
        "bchd,bkhd->bchk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (HD ** -0.5)
    col = jnp.arange(MP * P)
    q_pos = chunk_starts[:, None] + jnp.arange(C)[None, :]  # [B, C]
    mask = (col[None, None, :] <= q_pos[:, :, None]) & (
        col[None, None, :] < seq_lens[:, None, None]
    )
    s = jnp.where(mask[:, :, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bchk,bkhd->bchd", p, v.astype(jnp.float32)).astype(
        q.dtype
    )
