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


def init_cache(model: ModelConfig, cache: CacheConfig) -> dict:
    """Per-layer page pools as SEPARATE arrays (tuple leaves).

    Separate leaves let each layer's pools be donated whole to the fused
    write+attend kernel (``input_output_aliases``) — true in-place decode.
    A single stacked ``[L, ...]`` array cannot alias per-layer slices.
    """
    shape = (
        model.n_kv_heads,
        cache.num_pages,
        cache.page_size,
        model.head_dim,
    )
    return {
        "k": tuple(
            jnp.zeros(shape, dtype=cache.dtype)
            for _ in range(model.n_layers)
        ),
        "v": tuple(
            jnp.zeros(shape, dtype=cache.dtype)
            for _ in range(model.n_layers)
        ),
    }


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
    return {
        "k": jnp.stack(cache["k"]),
        "v": jnp.stack(cache["v"]),
    }


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
):
    """Scatter a freshly prefilled prompt's K/V into the page pool.

    Args:
      k_pages_l / v_pages_l: ``[KV, N, P, HD]`` one layer's pools.
      k_new / v_new: ``[B, S, KV, HD]`` with S a multiple of P.
      block_table: ``[B, S // P]`` destination page ids (0-padded tails write
        into the trash page).
    """
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
):
    """Scatter a prefill chunk's K/V rows (chunked prefill path)."""
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
):
    """Scatter one decode step's K/V (one token per sequence).

    Args:
      k_new / v_new: ``[B, KV, HD]``.
      block_tables: ``[B, MAX_PAGES]``.
      positions: ``[B]`` zero-based position of the new token.
    """
    P = k_pages_l.shape[2]
    page_idx = jnp.take_along_axis(
        block_tables, (positions // P)[:, None], axis=1
    )[:, 0]
    offset = positions % P
    k_pages_l = k_pages_l.at[:, page_idx, offset].set(k_new.transpose(1, 0, 2))
    v_pages_l = v_pages_l.at[:, page_idx, offset].set(v_new.transpose(1, 0, 2))
    return k_pages_l, v_pages_l
