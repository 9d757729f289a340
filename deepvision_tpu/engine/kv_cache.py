"""Paged KV cache: shared HBM page pools + a host-side page allocator.

TPU-first replacement for what the reference never had (all its inference was
remote; see SURVEY.md §0).  Layout:

* ``k_pages`` / ``v_pages``: per layer, ``[KV_HEADS, N_PAGES, PAGE,
  HEAD_DIM]`` bfloat16 — one separate array per layer (tuple pytree) so
  every layer's pools can be donated whole into the fused
  write+attend kernel and updated strictly in place.  The kv-head axis is
  the tensor-parallel shard axis.  KV/page axes sit *left* of the
  ``(PAGE, HEAD_DIM)`` pair so page DMAs slice whole ``(sublane, lane)``
  tiles — slicing an interior tiled axis is rejected by Mosaic.
* Page id 0 is a reserved trash page: block-table padding and inactive decode
  slots point at it, so vectorized scatters never need data-dependent guards
  (static shapes, no ``lax.cond`` on the hot path).
"""

from __future__ import annotations

import dataclasses
import threading
from typing import List

import jax
import jax.numpy as jnp

from deepvision_tpu.engine.config import ModelConfig


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    num_pages: int = 2048
    page_size: int = 64
    max_pages_per_seq: int = 64  # => max context = page_size * this
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def max_context(self) -> int:
        return self.page_size * self.max_pages_per_seq

    @property
    def quantized(self) -> bool:
        return jnp.dtype(self.dtype) == jnp.dtype(jnp.int8)


def init_cache(model: ModelConfig, cache: CacheConfig,
               kv_scales=None) -> dict:
    """Per-layer page pools as SEPARATE arrays (tuple leaves).

    Separate leaves let each layer's pools be donated whole to the fused
    write+attend kernel (``input_output_aliases``) — true in-place decode.
    A single stacked ``[L, ...]`` array cannot alias per-layer slices.

    int8 mode (``cache.dtype == int8``): pools store int8 rows quantized
    with STATIC per-(layer, kv-head) symmetric scales — halves decode's
    dominant HBM stream (the KV pages) and doubles sessions-per-chip.
    ``kv_scales`` is ``(k_scales [L, KV], v_scales [L, KV])`` from
    :func:`calibrate_kv_scales` (falls back to 1/16 — a sane range for
    RMS-normed, RoPE-rotated heads — when no calibration is available).
    Static scales keep the decode RMW trivial (no in-kernel scale
    updates, no clip-tracking): calibration picks the scale with margin,
    and the quality cost is measured, not assumed
    (scripts/eval_quant_quality.py).
    """
    shape = (
        model.n_kv_heads,
        cache.num_pages,
        cache.page_size,
        model.head_dim,
    )
    out = {
        "k": tuple(
            jnp.zeros(shape, dtype=cache.dtype)
            for _ in range(model.n_layers)
        ),
        "v": tuple(
            jnp.zeros(shape, dtype=cache.dtype)
            for _ in range(model.n_layers)
        ),
    }
    if cache.quantized:
        if kv_scales is None:
            ks = vs = jnp.full(
                (model.n_layers, model.n_kv_heads), 1.0 / 16.0, jnp.float32
            )
        else:
            ks = jnp.asarray(kv_scales[0], jnp.float32)
            vs = jnp.asarray(kv_scales[1], jnp.float32)
        out["ks"] = tuple(ks[i] for i in range(model.n_layers))
        out["vs"] = tuple(vs[i] for i in range(model.n_layers))
    return out


def quantize_rows(x: jax.Array, scale: jax.Array, kv_axis: int) -> jax.Array:
    """Symmetric int8 quantization of K/V rows with a per-kv-head scale.

    ``x``: float rows with the kv-head axis at ``kv_axis``;
    ``scale``: [KV] float32.  Returns int8 of the same shape.
    Already-int8 rows pass through untouched (a caller may have
    quantized upstream — e.g. paged_attention_update's sub-128-head-dim
    fallback hands pre-quantized rows to write_decode_token)."""
    if x.dtype == jnp.int8:
        return x
    shape = [1] * x.ndim
    shape[kv_axis] = -1
    s = scale.reshape(shape)
    q = jnp.round(x.astype(jnp.float32) / s)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def cache_hbm_bytes(model: ModelConfig, cache: CacheConfig) -> int:
    per = (
        model.n_layers
        * cache.num_pages
        * cache.page_size
        * model.n_kv_heads
        * model.head_dim
    )
    return 2 * per * jnp.dtype(cache.dtype).itemsize


def stack_cache(cache: dict):
    """Stacked ``[L, ...]`` view for checkpointing/inspection."""
    out = {
        "k": jnp.stack(cache["k"]),
        "v": jnp.stack(cache["v"]),
    }
    if "ks" in cache:
        out["ks"] = jnp.stack(cache["ks"])
        out["vs"] = jnp.stack(cache["vs"])
    return out


class PageAllocator:
    """Thread-safe refcounting allocator over the shared page pool.

    Page 0 is never handed out (trash page).  Pages are refcounted so the
    prefix cache can share fully-written pages across sequences (a shared
    page is only returned to the free list when its last reference drops) —
    the continuous-batching scheduler allocates at admission/decode-growth
    time and releases on retirement (role of the reference's per-session
    locks + bounded semaphores, web/server.py:2400,4276).
    """

    def __init__(self, num_pages: int):
        self._lock = threading.Lock()
        self._free: List[int] = list(range(num_pages - 1, 0, -1))
        self._refs: dict = {}
        self.num_pages = num_pages

    def available(self) -> int:
        with self._lock:
            return len(self._free)

    def alloc(self, n: int) -> List[int]:
        with self._lock:
            if n > len(self._free):
                raise MemoryError(
                    f"KV page pool exhausted: want {n}, have {len(self._free)}"
                )
            pages = [self._free.pop() for _ in range(n)]
            for p in pages:
                self._refs[p] = 1
        return pages

    def try_alloc(self, n: int):
        try:
            return self.alloc(n)
        except MemoryError:
            return None

    def share(self, pages: List[int]) -> None:
        """Add a reference to already-allocated pages (prefix reuse)."""
        with self._lock:
            for p in pages:
                if p > 0:
                    self._refs[p] = self._refs.get(p, 0) + 1

    def free(self, pages: List[int]) -> None:
        with self._lock:
            for p in pages:
                if p <= 0:
                    continue
                refs = self._refs.get(p, 1) - 1
                if refs <= 0:
                    self._refs.pop(p, None)
                    self._free.append(p)
                else:
                    self._refs[p] = refs


def pages_needed(seq_len: int, page_size: int) -> int:
    return -(-seq_len // page_size)


def write_prefill_pages(
    k_pages_l: jax.Array,
    v_pages_l: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    block_table: jax.Array,
    k_scale=None,
    v_scale=None,
):
    """Scatter a freshly prefilled prompt's K/V into the page pool.

    Args:
      k_pages_l / v_pages_l: ``[KV, N, P, HD]`` one layer's pools.
      k_new / v_new: ``[B, S, KV, HD]`` with S a multiple of P.
      block_table: ``[B, S // P]`` destination page ids (0-padded tails write
        into the trash page).
      k_scale / v_scale: [KV] static scales (int8 pools only).
    """
    if k_pages_l.dtype == jnp.int8:
        k_new = quantize_rows(k_new, k_scale, k_new.ndim - 2)
        v_new = quantize_rows(v_new, v_scale, v_new.ndim - 2)
    KV, N, P, HD = k_pages_l.shape
    B, S = k_new.shape[0], k_new.shape[1]
    n_chunks = S // P

    def chunked(x):
        # [B, S, KV, HD] -> [KV, B * n_chunks, P, HD]
        return (
            x.reshape(B, n_chunks, P, KV, HD)
            .transpose(3, 0, 1, 2, 4)
            .reshape(KV, B * n_chunks, P, HD)
        )

    flat_pages = block_table.reshape(-1)
    k_pages_l = k_pages_l.at[:, flat_pages].set(chunked(k_new))
    v_pages_l = v_pages_l.at[:, flat_pages].set(chunked(v_new))
    return k_pages_l, v_pages_l


def write_chunk_tokens(
    k_pages_l: jax.Array,
    v_pages_l: jax.Array,
    k_new: jax.Array,      # [B, C, KV, HD]
    v_new: jax.Array,
    block_tables: jax.Array,  # [B, MAX_PAGES]
    positions: jax.Array,     # [B, C] absolute token positions
    seq_lens: jax.Array,      # [B] — rows at positions >= len hit page 0
    k_scale=None,
    v_scale=None,
):
    """Scatter a prefill chunk's K/V rows (chunked prefill path)."""
    if k_pages_l.dtype == jnp.int8:
        k_new = quantize_rows(k_new, k_scale, k_new.ndim - 2)
        v_new = quantize_rows(v_new, v_scale, v_new.ndim - 2)
    P = k_pages_l.shape[2]
    valid = positions < seq_lens[:, None]
    page_slot = jnp.clip(
        positions // P, 0, block_tables.shape[1] - 1
    )
    pages = jnp.take_along_axis(block_tables, page_slot, axis=1)
    pages = jnp.where(valid, pages, 0)        # padded rows -> trash page
    offs = jnp.where(valid, positions % P, 0)
    kt = k_new.transpose(2, 0, 1, 3)  # [KV, B, C, HD]
    vt = v_new.transpose(2, 0, 1, 3)
    k_pages_l = k_pages_l.at[:, pages, offs].set(kt)
    v_pages_l = v_pages_l.at[:, pages, offs].set(vt)
    return k_pages_l, v_pages_l


def write_decode_token(
    k_pages_l: jax.Array,
    v_pages_l: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    block_tables: jax.Array,
    positions: jax.Array,
    k_scale=None,
    v_scale=None,
):
    """Scatter one decode step's K/V (one token per sequence).

    Args:
      k_new / v_new: ``[B, KV, HD]``.
      block_tables: ``[B, MAX_PAGES]``.
      positions: ``[B]`` zero-based position of the new token.
    """
    if k_pages_l.dtype == jnp.int8:
        k_new = quantize_rows(k_new, k_scale, k_new.ndim - 2)
        v_new = quantize_rows(v_new, v_scale, v_new.ndim - 2)
    P = k_pages_l.shape[2]
    page_idx = jnp.take_along_axis(
        block_tables, (positions // P)[:, None], axis=1
    )[:, 0]
    offset = positions % P
    k_pages_l = k_pages_l.at[:, page_idx, offset].set(k_new.transpose(1, 0, 2))
    v_pages_l = v_pages_l.at[:, page_idx, offset].set(v_new.transpose(1, 0, 2))
    return k_pages_l, v_pages_l
