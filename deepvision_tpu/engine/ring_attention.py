"""Ring attention: sequence-parallel causal attention over a device mesh.

The reference *shrinks* long context instead of scaling it (doc budgets +
sliding windows + summaries, reference web/config.py:71-83 — SURVEY.md
§5.7).  This module is the TPU-native long-context path those heuristics
only approximate: when one chip cannot hold a sequence's activations/KV,
the sequence axis shards over the mesh and K/V blocks rotate around the
ring via ``ppermute`` while each device keeps an online-softmax accumulator
for its local queries — O(S/N) memory per chip, compute overlapped with
ICI transfers by XLA.

Design (blockwise ring, causal):
* device ``i`` holds query chunk ``i`` and starts with K/V chunk ``i``;
* at ring step ``s`` it attends its queries against K/V chunk
  ``(i - s) mod N`` with a global-position causal + padding mask, then
  passes the K/V block to device ``i + 1``;
* online softmax (m, l, acc) exactly as in the flash kernel, so the result
  is bit-comparable to single-device attention up to fp accumulation order.

GQA is handled by head repetition inside the local block computation (the
per-chip block is small by construction; no global K/V duplication).

Used for long-context prefill / full-sequence scoring; the serving decode
path keeps paged attention (a decode step touches one token per sequence —
sequence sharding buys nothing there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

SEQ_AXIS = "seq"

_NEG_INF = -1e30


def make_seq_mesh(n: int, devices=None) -> Mesh:
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices[:n]).reshape(n), (SEQ_AXIS,))


def _local_block(q, k, v, q_off, k_off, seq_lens, scale, carry):
    """One (q_chunk x kv_chunk) block with online-softmax accumulation.

    q: [B, H, Sq, HD]; k, v: [B, KV, Sk, HD]; offsets are global token
    positions of the chunks; carry = (m, l, acc).
    """
    B, H, Sq, HD = q.shape
    KV = k.shape[1]
    if KV != H:
        rep = H // KV
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    m_prev, l_prev, acc_prev = carry

    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    rows = q_off + jnp.arange(Sq)[:, None]            # global q positions
    cols = k_off + jnp.arange(k.shape[2])[None, :]    # global k positions
    causal = cols <= rows                             # [Sq, Sk]
    valid = cols[None] < seq_lens[:, None, None]      # [B, Sq, Sk]
    mask = causal[None] & valid
    s = jnp.where(mask[:, None], s, _NEG_INF)

    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    # fully-masked rows: m_new stays -inf -> exp(s - m_new) would be
    # exp(0)=1; zero those explicitly
    p = jnp.where(mask[:, None], p, 0.0)
    alpha = jnp.exp(jnp.minimum(m_prev - m_new, 0.0))
    alpha = jnp.where(jnp.isfinite(m_prev), alpha, 0.0)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc_prev * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
    )
    return m_new, l_new, acc_new


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seq_lens: jax.Array,
    mesh: Mesh,
    *,
    axis: str = SEQ_AXIS,
):
    """Causal attention with the sequence axis sharded over ``axis``.

    Args:
      q: ``[B, H, S, HD]`` with S sharded over ``axis`` (S % mesh size == 0).
      k, v: ``[B, KV, S, HD]`` sharded the same way.
      seq_lens: ``[B]`` int32 valid lengths (replicated).
      mesh: mesh containing ``axis``.

    Returns:
      ``[B, H, S, HD]`` attention outputs, S sharded over ``axis``; rows
      past ``seq_lens`` are junk (same contract as the flash kernel).
    """
    n = mesh.shape[axis]
    scale = q.shape[-1] ** -0.5

    def inner(q_loc, k_loc, v_loc, lens):
        idx = jax.lax.axis_index(axis)
        B, H, Sq, HD = q_loc.shape
        q_off = idx * Sq

        # derive the initial accumulators from the (device-varying) local
        # input so their shard_map VMA type matches the loop outputs
        zrow = q_loc[..., :1].astype(jnp.float32) * 0.0
        m0 = zrow + _NEG_INF
        l0 = zrow
        acc0 = q_loc.astype(jnp.float32) * 0.0

        def step(s, carry):
            k_c, v_c, m, l, acc = carry
            src = (idx - s) % n                 # global chunk k_c holds now
            k_off = src * Sq
            m, l, acc = _local_block(
                q_loc, k_c, v_c, q_off, k_off, lens, scale, (m, l, acc)
            )
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            return k_c, v_c, m, l, acc

        _, _, m, l, acc = jax.lax.fori_loop(
            0, n, step, (k_loc, v_loc, m0, l0, acc0)
        )
        l = jnp.where(l == 0.0, 1.0, l)
        return (acc / l).astype(q_loc.dtype)

    sharded = shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None),
        ),
        out_specs=P(None, None, axis, None),
    )
    return sharded(q, k, v, seq_lens.astype(jnp.int32))
