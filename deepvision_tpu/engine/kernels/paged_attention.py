"""Paged decode attention as a Pallas TPU kernel.

One decode step reads each sequence's KV history from a shared HBM page pool
through its block table — the memory layout that makes 64+ concurrent
interview sessions fit on a v5e-8 (BASELINE.md build targets) without
per-slot max-length cache reservations.

Kernel shape:

* Grid ``(batch, kv_heads)``.  Block tables + sequence lengths arrive via
  scalar prefetch (SMEM) so the kernel can compute page addresses before the
  body runs.
* K/V pages stay in HBM (``memory_space=ANY``); the kernel streams them
  page-by-page into a double-buffered VMEM scratch with ``make_async_copy``,
  overlapping the next page's DMA with the current page's math — decode is
  HBM-bandwidth-bound, so the kernel's job is to keep the copy engine busy.
* GQA: the ``q_per_kv`` query heads of one kv head are processed together as
  the sublane dimension of a skinny matmul (padded to >=8 for f32 tiling).
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


def _paged_kernel(
    bt_ref,      # [B, MP] int32 scalar-prefetch: block tables
    lens_ref,    # [B] int32 scalar-prefetch: lengths incl. current token
    ks_ref,      # [KV] f32 scalar-prefetch: K dequant scales (1.0 = bf16)
    vs_ref,      # [KV] f32 scalar-prefetch: V dequant scales
    q_ref,       # [1, 1, Gp, HD] VMEM
    kp_ref,      # [KV, N, P, HD] HBM (ANY)
    vp_ref,      # [KV, N, P, HD] HBM (ANY)
    o_ref,       # [1, 1, Gp, HD] VMEM
    k_buf,       # [2, P, HD] VMEM scratch
    v_buf,       # [2, P, HD] VMEM scratch
    sems,        # [2, 2] DMA semaphores
    *,
    page_size: int,
    scale: float,
):
    b = pl.program_id(0)
    kv = pl.program_id(1)

    n = lens_ref[b]
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

    # int8 pools: K's dequant scale folds into the softmax q-scale and V's
    # into the final normalize — the per-page cost of quantized KV is just
    # the int8->f32 astype the bf16 path already pays.
    q = q_ref[0, 0].astype(jnp.float32) * (scale * ks_ref[kv])  # [Gp, HD]
    gp, hd = q.shape
    pos_in_page = jax.lax.broadcasted_iota(
        jnp.int32, (gp, page_size), dimension=1
    )

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

        k = k_buf[slot].astype(jnp.float32)  # [P, HD]
        v = v_buf[slot].astype(jnp.float32)

        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Gp, P]
        valid = (p * page_size + pos_in_page) < n
        s = jnp.where(valid, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        pij = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(pij, axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jax.lax.dot_general(
            pij,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((gp, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((gp, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((gp, hd), dtype=jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_pages, body, (m0, l0, acc0))

    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l * vs_ref[kv]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    *,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Decode-step attention over a paged KV cache.

    Args:
      q: ``[B, H, HD]`` — this step's queries (one token per sequence).
      k_pages, v_pages: ``[KV, N_PAGES, PAGE, HD]`` shared page pools
        (bf16, or int8 with ``k_scale``/``v_scale``).
      block_tables: ``[B, MAX_PAGES]`` int32 page ids per sequence
        (page id 0 is the reserved trash page; unused entries may be 0).
      seq_lens: ``[B]`` int32 lengths *including* the current token.
      k_scale / v_scale: ``[KV]`` static dequant scales for int8 pools.

    Returns:
      ``[B, H, HD]`` attention outputs.
    """
    if interpret is None:
        interpret = _default_interpret()
    B, H, HD = q.shape
    KV, N, P, _ = k_pages.shape
    if k_scale is None:
        k_scale = jnp.ones(KV, jnp.float32)
    if v_scale is None:
        v_scale = jnp.ones(KV, jnp.float32)
    if HD % 128 != 0 and not interpret:
        # Mosaic can only DMA-slice page pools whose trailing dim fills whole
        # 128-lane tiles; sub-128 head dims (small/test models) take the XLA
        # gather path instead.  All production presets use head_dim >= 128.
        return paged_attention_reference(
            q, k_pages, v_pages, block_tables, seq_lens,
            k_scale=k_scale, v_scale=v_scale,
        )
    assert H % KV == 0
    g = H // KV
    gp = max(g, 8)

    # [B, H, HD] -> [B, KV, Gp, HD] with sublane padding for the skinny matmul.
    qg = q.reshape(B, KV, g, HD)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))

    scale = HD ** -0.5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, KV),
        in_specs=[
            pl.BlockSpec((1, 1, gp, HD), lambda b, kv, *_: (b, kv, 0, 0)),
            # Page pools must stay in HBM: ANY lets Mosaic promote small
            # pools to VMEM, where dynamic leading-dim slices for the DMA
            # hit tiled-layout alignment limits.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, gp, HD), lambda b, kv, *_: (b, kv, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, P, HD), k_pages.dtype),
            pltpu.VMEM((2, P, HD), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_paged_kernel, page_size=P, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, gp, HD), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        block_tables.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        k_scale.astype(jnp.float32),
        v_scale.astype(jnp.float32),
        qg,
        k_pages,
        v_pages,
    )
    return out[:, :, :g, :].reshape(B, H, HD)


# ---------------------------------------------------------------------------
# Fused write + attention (the decode hot path)
# ---------------------------------------------------------------------------

def _fused_kernel_b(
    bt_ref,      # [B, MP] scalar-prefetch block tables
    lens_ref,    # [B] lengths incl. current token
    pages_ref,   # [B] page id holding the current token
    offs_ref,    # [B] row offset within that page
    ks_ref,      # [KV] f32 K dequant scales (all 1.0 for bf16 pools)
    vs_ref,      # [KV] f32 V dequant scales
    q_ref,       # [1, KV, Gp, HD] VMEM — ALL kv heads' queries for this b
    nk_ref,      # [1, KV, 1, HD] VMEM — this step's k rows (pool dtype)
    nv_ref,      # [1, KV, 1, HD] VMEM
    kp_ref,      # [KV, N, P, HD] HBM (aliased to kp_out)
    vp_ref,      # [KV, N, P, HD] HBM (aliased to vp_out)
    o_ref,       # [1, KV, Gp, HD] VMEM
    kp_out,      # HBM alias of kp_ref
    vp_out,      # HBM alias of vp_ref
    k_buf, v_buf, sems, wbuf_k, wbuf_v, wsems,
    *,
    page_size: int,
    scale: float,
    n_kv: int,
):
    """Grid-over-batch variant of the fused decode kernel.

    The original grid=(B, KV) launches B*KV programs per layer — 1,024
    per token-step for dv-1b at B=8 — and TPU grid programs execute
    SEQUENTIALLY, so per-program setup and un-overlapped 16 KB DMA
    chains cost ~5 ms/step while the kernel's actual HBM traffic floors
    at ~0.5 ms (PERF_NOTES round-3 decode-anatomy ablation).  This
    variant keeps ONE program per sequence and runs a flattened
    ``kv x page`` loop inside it, double-buffering page DMAs across kv
    boundaries — 8x fewer program boundaries and a continuously busy
    copy engine.
    """
    b = pl.program_id(0)
    n = lens_ref[b]
    my_page = pages_ref[b]
    my_off = offs_ref[b]
    num_pages = pl.cdiv(n, page_size)

    # --- 1) RMW the current token's page for every kv head -------------
    # All loads issued before any wait, ONE vectorized [KV, P, HD] patch,
    # all stores issued before any wait: the phase pays ~2 DMA latencies
    # instead of 4*KV serial ones (each 16 KB copy's latency dwarfs its
    # 20 ns of streaming time — the round-3 decode anatomy in PERF_NOTES).

    def rmw_load(kv, carry):
        pltpu.make_async_copy(
            kp_ref.at[kv, my_page], wbuf_k.at[kv], wsems.at[0, kv]
        ).start()
        pltpu.make_async_copy(
            vp_ref.at[kv, my_page], wbuf_v.at[kv], wsems.at[1, kv]
        ).start()
        return carry

    jax.lax.fori_loop(0, n_kv, rmw_load, 0)

    def rmw_wait_load(kv, carry):
        pltpu.make_async_copy(
            kp_ref.at[kv, my_page], wbuf_k.at[kv], wsems.at[0, kv]
        ).wait()
        pltpu.make_async_copy(
            vp_ref.at[kv, my_page], wbuf_v.at[kv], wsems.at[1, kv]
        ).wait()
        return carry

    jax.lax.fori_loop(0, n_kv, rmw_wait_load, 0)

    hd_ = nk_ref.shape[-1]
    rows3 = jax.lax.broadcasted_iota(
        jnp.int32, (n_kv, page_size, hd_), dimension=1
    )
    wbuf_k[:, :, :] = jnp.where(
        rows3 == my_off, nk_ref[0, :, 0][:, None, :], wbuf_k[:, :, :]
    )
    wbuf_v[:, :, :] = jnp.where(
        rows3 == my_off, nv_ref[0, :, 0][:, None, :], wbuf_v[:, :, :]
    )

    def rmw_store(kv, carry):
        pltpu.make_async_copy(
            wbuf_k.at[kv], kp_out.at[kv, my_page], wsems.at[0, kv]
        ).start()
        pltpu.make_async_copy(
            wbuf_v.at[kv], vp_out.at[kv, my_page], wsems.at[1, kv]
        ).start()
        return carry

    jax.lax.fori_loop(0, n_kv, rmw_store, 0)

    def rmw_wait_store(kv, carry):
        pltpu.make_async_copy(
            wbuf_k.at[kv], kp_out.at[kv, my_page], wsems.at[0, kv]
        ).wait()
        pltpu.make_async_copy(
            wbuf_v.at[kv], vp_out.at[kv, my_page], wsems.at[1, kv]
        ).wait()
        return carry

    jax.lax.fori_loop(0, n_kv, rmw_wait_store, 0)

    # --- 2) attention: flattened kv x page loop, DEPTH-deep pipelined ---
    # Per-page compute (~1-2 us) is shorter than a 16 KB DMA's latency,
    # so 2-deep buffering still stalls every iteration; DEPTH slots keep
    # DEPTH-1 copies in flight and amortize the latency away.
    total = n_kv * num_pages
    depth = k_buf.shape[0]

    def k_copy(slot, t):
        kv = t // num_pages
        p = jax.lax.rem(t, num_pages)
        return pltpu.make_async_copy(
            kp_out.at[kv, bt_ref[b, p]], k_buf.at[slot], sems.at[0, slot]
        )

    def v_copy(slot, t):
        kv = t // num_pages
        p = jax.lax.rem(t, num_pages)
        return pltpu.make_async_copy(
            vp_out.at[kv, bt_ref[b, p]], v_buf.at[slot], sems.at[1, slot]
        )

    def warmup(t, carry):
        @pl.when(t < total)
        def _():
            k_copy(jax.lax.rem(t, depth), t).start()
            v_copy(jax.lax.rem(t, depth), t).start()
        return carry

    jax.lax.fori_loop(0, depth, warmup, 0)

    gp = q_ref.shape[2]
    hd = q_ref.shape[3]
    pos_in_page = jax.lax.broadcasted_iota(
        jnp.int32, (gp, page_size), dimension=1
    )
    m0 = jnp.full((gp, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((gp, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((gp, hd), dtype=jnp.float32)

    def body(t, carry):
        m_prev, l_prev, acc_prev = carry
        kv = t // num_pages
        p = jax.lax.rem(t, num_pages)
        slot = jax.lax.rem(t, depth)

        # fresh accumulators at each kv head's first page
        m_prev = jnp.where(p == 0, m0, m_prev)
        l_prev = jnp.where(p == 0, l0, l_prev)
        acc_prev = jnp.where(p == 0, acc0, acc_prev)

        k_copy(slot, t).wait()
        v_copy(slot, t).wait()
        k = k_buf[slot].astype(jnp.float32)
        v = v_buf[slot].astype(jnp.float32)

        # int8 dequant rides the existing scalars: ks folds into the
        # q-scale, vs into the final normalize — no per-page multiply.
        q = q_ref[0, kv].astype(jnp.float32) * (scale * ks_ref[kv])
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(p * page_size + pos_in_page < n, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        pij = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(pij, axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jax.lax.dot_general(
            pij, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # refill this slot (its last read was the dots above)
        @pl.when(t + depth < total)
        def _():
            k_copy(slot, t + depth).start()
            v_copy(slot, t + depth).start()

        @pl.when(p == num_pages - 1)
        def _():
            l_safe = jnp.where(l_new == 0.0, 1.0, l_new)
            o_ref[0, kv] = (acc_new / l_safe * vs_ref[kv]).astype(
                o_ref.dtype)

        return m_new, l_new, acc_new

    jax.lax.fori_loop(0, total, body, (m0, l0, acc0))


def _fused_kernel(
    bt_ref,      # [B, MP] scalar-prefetch block tables
    lens_ref,    # [B] lengths incl. current token
    pages_ref,   # [B] page id holding the current token
    offs_ref,    # [B] row offset within that page
    ks_ref,      # [KV] f32 K dequant scales (all 1.0 for bf16 pools)
    vs_ref,      # [KV] f32 V dequant scales
    q_ref,       # [1, 1, Gp, HD] VMEM
    nk_ref,      # [1, 1, 1, HD] VMEM — this step's k row for (b, kv)
    nv_ref,      # [1, 1, 1, HD] VMEM
    kp_ref,      # [KV, N, P, HD] HBM (aliased to kp_out)
    vp_ref,      # [KV, N, P, HD] HBM (aliased to vp_out)
    o_ref,       # [1, 1, Gp, HD] VMEM
    kp_out,      # HBM alias of kp_ref
    vp_out,      # HBM alias of vp_ref
    k_buf, v_buf, sems, wbuf_k, wbuf_v, wsems,
    *,
    page_size: int,
    scale: float,
):
    """Read-modify-write the current token's page in place, then attend.

    The KV write cannot DMA a single row (rows inside a ``(P, HD)`` tile are
    not DMA-sliceable), so the target page round-trips through VMEM: load
    page -> patch row -> store page.  That is 4 x 16KB per (b, kv) program —
    noise next to the full-pool copy the XLA scatter route costs.
    """
    b = pl.program_id(0)
    kv = pl.program_id(1)
    n = lens_ref[b]
    my_page = pages_ref[b]
    my_off = offs_ref[b]

    load_k = pltpu.make_async_copy(
        kp_ref.at[kv, my_page], wbuf_k, wsems.at[0]
    )
    load_v = pltpu.make_async_copy(
        vp_ref.at[kv, my_page], wbuf_v, wsems.at[1]
    )
    load_k.start()
    load_v.start()
    load_k.wait()
    load_v.wait()
    # Patch the row via masked select: dynamic single-row vector stores are
    # not lowerable for bf16 tiles, a full-tile select is.
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (page_size, nk_ref.shape[-1]), dimension=0
    )
    wbuf_k[:, :] = jnp.where(row_ids == my_off, nk_ref[0, 0], wbuf_k[:, :])
    wbuf_v[:, :] = jnp.where(row_ids == my_off, nv_ref[0, 0], wbuf_v[:, :])
    store_k = pltpu.make_async_copy(
        wbuf_k, kp_out.at[kv, my_page], wsems.at[0]
    )
    store_v = pltpu.make_async_copy(
        wbuf_v, vp_out.at[kv, my_page], wsems.at[1]
    )
    store_k.start()
    store_v.start()
    store_k.wait()
    store_v.wait()

    num_pages = pl.cdiv(n, page_size)

    def k_copy(slot, p):
        return pltpu.make_async_copy(
            kp_out.at[kv, bt_ref[b, p]], k_buf.at[slot], sems.at[0, slot]
        )

    def v_copy(slot, p):
        return pltpu.make_async_copy(
            vp_out.at[kv, bt_ref[b, p]], v_buf.at[slot], sems.at[1, slot]
        )

    k_copy(0, 0).start()
    v_copy(0, 0).start()

    q = q_ref[0, 0].astype(jnp.float32) * (scale * ks_ref[kv])
    gp, hd = q.shape
    pos_in_page = jax.lax.broadcasted_iota(
        jnp.int32, (gp, page_size), dimension=1
    )

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
        )
        s = jnp.where(p * page_size + pos_in_page < n, s, _NEG_INF)
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

    m0 = jnp.full((gp, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((gp, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((gp, hd), dtype=jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_pages, body, (m0, l0, acc0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l * vs_ref[kv]).astype(o_ref.dtype)


def paged_attention_update(
    q: jax.Array,          # [B, H, HD]
    new_k: jax.Array,      # [B, KV, HD] — this step's k (RoPE'd)
    new_v: jax.Array,      # [B, KV, HD]
    k_pages: jax.Array,    # [KV, N, P, HD] — DONATE at the jit boundary
    v_pages: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,   # incl. current token
    *,
    k_scale: jax.Array | None = None,   # [KV] — int8 pools only
    v_scale: jax.Array | None = None,
    interpret: bool | None = None,
    grid_mode: str = "b",
):
    """Fused in-place KV write + paged attention for one layer.

    Returns ``(out [B, H, HD], k_pages, v_pages)`` where the page pools are
    the SAME buffers (``input_output_aliases``) — zero cache copies per
    step, vs. one full-pool copy for the XLA-scatter + separate-kernel
    route.

    int8 pools: the new rows are quantized HERE (XLA side, where the
    static scales live), so the kernel's RMW patches int8 rows as-is; the
    read side folds dequant into existing scalars.  This halves the
    kernel's dominant HBM stream (KV page DMAs) with no in-kernel scale
    bookkeeping.

    ``grid_mode="b"`` (default, measured 1.6x faster per decode step —
    PERF_NOTES round-3 decode anatomy): one program per sequence with a
    flattened kv x page DMA loop.  ``"bkv"`` keeps the original
    one-program-per-(sequence, kv-head) grid for comparison.
    """
    if interpret is None:
        interpret = _default_interpret()
    B, H, HD = q.shape
    KV, N, P, _ = k_pages.shape
    positions = seq_lens - 1
    pages_idx = jnp.take_along_axis(
        block_tables, (positions // P)[:, None], axis=1
    )[:, 0].astype(jnp.int32)
    offs = (positions % P).astype(jnp.int32)

    quantized = k_pages.dtype == jnp.int8
    if k_scale is None:
        k_scale = jnp.ones(KV, jnp.float32)
    if v_scale is None:
        v_scale = jnp.ones(KV, jnp.float32)
    if quantized:
        from deepvision_tpu.engine.kv_cache import quantize_rows

        new_k = quantize_rows(new_k, k_scale, new_k.ndim - 2)
        new_v = quantize_rows(new_v, v_scale, new_v.ndim - 2)

    if HD % 128 != 0 and not interpret:
        # Fallback path for sub-lane head dims (test models).
        from deepvision_tpu.engine.kv_cache import write_decode_token

        k_pages, v_pages = write_decode_token(
            k_pages, v_pages, new_k, new_v, block_tables, positions
        )
        out = paged_attention_reference(
            q, k_pages, v_pages, block_tables, seq_lens,
            k_scale=k_scale, v_scale=v_scale,
        )
        return out, k_pages, v_pages

    g = H // KV
    gp = max(g, 8)
    qg = q.reshape(B, KV, g, HD)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    nk4 = new_k.reshape(B, KV, 1, HD)
    nv4 = new_v.reshape(B, KV, 1, HD)

    if grid_mode == "b":
        # DMA pipeline depth; VMEM cost 2*depth*P*HD*itemsize.  8 measured
        # best for bf16 pages (depth 16 regressed — queue contention past
        # the latency product, PERF_NOTES r3); int8 pages halve each
        # buffer, so the depth sweep is re-runnable via env for A/Bs.
        import os

        depth = int(os.environ.get("DV_PAGED_DMA_DEPTH", "8"))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, KV, gp, HD), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, KV, 1, HD), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, KV, 1, HD), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=(
                pl.BlockSpec((1, KV, gp, HD), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ),
            scratch_shapes=[
                pltpu.VMEM((depth, P, HD), k_pages.dtype),
                pltpu.VMEM((depth, P, HD), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, depth)),
                pltpu.VMEM((KV, P, HD), k_pages.dtype),
                pltpu.VMEM((KV, P, HD), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, KV)),
            ],
        )
        kernel = functools.partial(
            _fused_kernel_b, page_size=P, scale=HD ** -0.5, n_kv=KV
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(B, KV),
            in_specs=[
                pl.BlockSpec((1, 1, gp, HD), lambda b, kv, *_: (b, kv, 0, 0)),
                pl.BlockSpec((1, 1, 1, HD), lambda b, kv, *_: (b, kv, 0, 0)),
                pl.BlockSpec((1, 1, 1, HD), lambda b, kv, *_: (b, kv, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, gp, HD), lambda b, kv, *_: (b, kv, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, P, HD), k_pages.dtype),
                pltpu.VMEM((2, P, HD), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((P, HD), k_pages.dtype),
                pltpu.VMEM((P, HD), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _fused_kernel, page_size=P, scale=HD ** -0.5
        )
    out, kp2, vp2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, KV, gp, HD), q.dtype),
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ),
        # flattened input order: 6 scalar-prefetch args, then
        # q(6), nk(7), nv(8), k_pages(9), v_pages(10)
        input_output_aliases={9: 1, 10: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32),
        pages_idx, offs,
        k_scale.astype(jnp.float32), v_scale.astype(jnp.float32),
        qg, nk4, nv4, k_pages, v_pages,
    )
    return out[:, :, :g, :].reshape(B, H, HD), kp2, vp2


def paged_attention_reference(q, k_pages, v_pages, block_tables, seq_lens,
                              k_scale=None, v_scale=None):
    """jnp reference (gathers pages densely) used to validate the kernel."""
    B, H, HD = q.shape
    KV, N, P, _ = k_pages.shape
    MP = block_tables.shape[1]
    if k_pages.dtype == jnp.int8:
        ks = (k_scale if k_scale is not None
              else jnp.ones(KV, jnp.float32))[:, None, None, None]
        vs = (v_scale if v_scale is not None
              else jnp.ones(KV, jnp.float32))[:, None, None, None]
        k_pages = k_pages.astype(jnp.float32) * ks
        v_pages = v_pages.astype(jnp.float32) * vs
    # [KV, B, MP, P, HD] -> [B, S_max, KV, HD]
    k = k_pages[:, block_tables].transpose(1, 2, 3, 0, 4).reshape(
        B, MP * P, KV, HD
    )
    v = v_pages[:, block_tables].transpose(1, 2, 3, 0, 4).reshape(
        B, MP * P, KV, HD
    )
    k = jnp.repeat(k, H // KV, axis=2)
    v = jnp.repeat(v, H // KV, axis=2)
    s = jnp.einsum(
        "bhd,bkhd->bhk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (HD ** -0.5)
    valid = jnp.arange(MP * P)[None, :] < seq_lens[:, None]
    s = jnp.where(valid[:, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhk,bkhd->bhd", p, v.astype(jnp.float32)).astype(q.dtype)
