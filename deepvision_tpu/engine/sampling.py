"""Token sampling: temperature / top-k / top-p, vectorized over the batch.

Everything is shape-static and branch-free (``jnp.where`` masks instead of
Python control flow) so one jitted decode step serves every request's
per-slot sampling parameters.

Vocab-sharded mode (``axis`` set): each chip holds ``[B, V/n]`` local
logits (Megatron-style sharded lm_head, see engine/parallel.py).  Sampling
never materializes the full ``[B, V]`` tensor — each shard takes its local
top-``MAX_K``, the ``n * MAX_K`` candidates are all-gathered over ICI
(a few KB, vs MBs for full logits at 128k-class vocabs), and the global
top-k is selected from the union.  Exact for any effective k ≤ MAX_K, which
is already the replicated path's candidate truncation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


# All candidate selection happens inside the top-MAX_K logits: a full-vocab
# sort of [B, 256k] costs tens of ms on TPU; lax.top_k over a fixed small K
# is the serving-friendly form, and top_k/top_p requests beyond MAX_K
# candidates are statistically indistinguishable for LM logits.
MAX_K = 64


def _global_candidates(logits: jax.Array, axis: str):
    """Local [B, V_local] logits -> globally-merged ``(vals, idx)`` top
    candidates [B, K] with GLOBAL token ids, replicated on every shard."""
    B, v_local = logits.shape
    k_local = min(MAX_K, v_local)
    vals, idx = jax.lax.top_k(logits, k_local)           # [B, K_l] local
    offset = jax.lax.axis_index(axis) * v_local
    idx = idx.astype(jnp.int32) + offset                 # global token ids
    # [B, n*K_l] candidate union over ICI (tiny: K_l<=64 per shard)
    vals = jax.lax.all_gather(vals, axis, axis=-1, tiled=True)
    idx = jax.lax.all_gather(idx, axis, axis=-1, tiled=True)
    k = min(MAX_K, vals.shape[-1])
    merged_vals, pos = jax.lax.top_k(vals, k)            # [B, K] global
    merged_idx = jnp.take_along_axis(idx, pos, axis=-1)
    return merged_vals, merged_idx


def sample_tokens(
    logits: jax.Array,        # [B, V] fp32 (local [B, V/n] when axis set)
    rng: jax.Array,           # PRNGKey
    temperature: jax.Array,   # [B] (0 => greedy)
    top_k: jax.Array,         # [B] int32 (0 => disabled)
    top_p: jax.Array,         # [B] (1.0 => disabled)
    *,
    axis: Optional[str] = None,
) -> jax.Array:
    """Returns ``[B]`` int32 sampled token ids (global ids under sharding)."""
    if axis is not None:
        top_vals, top_idx = _global_candidates(logits, axis)
    else:
        k_cand = min(MAX_K, logits.shape[-1])
        if logits.shape[-1] >= 8192:
            # approx_max_k is the TPU-native top-k (bin-wise partial
            # reduce): the r5 decode anatomy measured exact
            # lax.top_k(64) over [8, 32k] at 2.3 ms/step — 37% of the
            # whole dv-1b decode step.  Approximation only affects
            # which TAIL candidates enter the 64-slot pool (candidates
            # are already truncated to MAX_K, so far-tail loss is the
            # sampler's existing contract); greedy stays EXACT via the
            # argmax below, so T=0 parity/golden replay is unchanged.
            top_vals, top_idx = jax.lax.approx_max_k(
                logits, k_cand, recall_target=0.95)
        else:
            top_vals, top_idx = jax.lax.top_k(logits, k_cand)
        top_idx = top_idx.astype(jnp.int32)
    k_cand = top_vals.shape[-1]

    # exact single-pass argmax (bandwidth-trivial) rather than
    # top_idx[:, 0], which would inherit approx_max_k's recall
    greedy = (jnp.argmax(logits, axis=-1).astype(jnp.int32)
              if axis is None else top_idx[:, 0])

    temp = jnp.maximum(temperature, 1e-4)[:, None]
    scaled = top_vals / temp  # [B, K]

    # top-k mask within candidates (position < requested k).
    pos = jnp.arange(k_cand)[None, :]
    k = jnp.where(top_k > 0, jnp.minimum(top_k, k_cand), k_cand)[:, None]
    keep_k = pos < k

    # top-p (nucleus): keep entries whose exclusive prefix mass < top_p.
    probs = jax.nn.softmax(scaled, axis=-1)
    prefix = jnp.cumsum(probs, axis=-1) - probs
    keep_p = prefix < top_p[:, None]

    masked = jnp.where(keep_k & keep_p, scaled, _NEG_INF)
    choice = jax.random.categorical(rng, masked, axis=-1)  # [B] in [0, K)
    sampled = jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0]
    return jnp.where(
        temperature <= 0.0, greedy, sampled.astype(jnp.int32)
    )


def sample_tokens_constrained(
    logits: jax.Array,        # [B, V] fp32 (local [B, V/n] when axis set)
    rng: jax.Array,
    temperature: jax.Array,   # [B]
    top_k: jax.Array,         # [B]
    top_p: jax.Array,         # [B]
    dfa_states: jax.Array,    # [B] int32 — row into dfa_table (0 = FREE)
    dfa_table: jax.Array,     # [S, V] — next state or -1 (forbidden);
                              # local [S, V/n] shard when axis set
    *,
    budgets: Optional[jax.Array] = None,   # [B] int32 — tokens remaining,
                                           # INCLUDING the one sampled now
    dfa_dist: Optional[jax.Array] = None,  # [S] int32 — min tokens from
                                           # each state to ACCEPT
    axis: Optional[str] = None,
    packed: bool = False,                  # dfa_table is the packed form
):
    """Grammar-constrained sampling: logits of forbidden tokens are masked
    before top-k/top-p, and the DFA state advances on-device so fused
    multi-step decode (``lax.scan``) keeps masks exact per step.  Row 0 of
    the table is the all-allowed FREE state, so unconstrained requests
    share the same compiled program.  Returns ``(tokens [B], states [B])``.

    When ``budgets``/``dfa_dist`` are given, transitions that cannot reach
    ACCEPT within the remaining budget are additionally masked — the output
    force-closes open strings/containers instead of dying unparseable at
    ``max_tokens`` (the reference repairs truncated JSON after the fact,
    web/server.py:21685-21943; masking in the kernel makes repair moot).
    ``dist[FREE] == 0`` keeps unconstrained slots unaffected.  If the
    budget is ALREADY too small to close (tiny max_tokens), the plain
    grammar mask applies — same prefix-valid behavior as before.

    Under vocab sharding both the logits and the DFA table arrive as local
    vocab shards; the mask applies shard-locally and the next state is
    resolved by the shard that owns the sampled token (a one-int psum).

    ``packed=True`` (the serving runner's form, see
    ModelRunner._pack_dfa): ``dfa_table`` carries
    ``(min(dist[next], 32767) << 16) | (next_state + 1)`` so ONE row
    gather yields both the transition and its force-close distance.
    The unpacked path needs a second ELEMENTWISE gather
    (``dfa_dist[rows]``, 262k random indices at [8, 32k]) which the r5
    decode anatomy measured as the dominant sampling cost; the packed
    form turns it into two shifts.  dist clipping at 32767 is exact for
    every real budget (max_tokens ≤ 4096): the INF sentinel (1<<20)
    clips to 32767 which still exceeds ``budget - 1``, and for budgets
    > 32768 — only the "unlimited" 1<<20 sentinel — ``can_close``
    degenerates to ``allowed`` for reachable and unreachable alike,
    which is exactly the no-force-close behavior unlimited budgets had.
    """
    if packed:
        g = dfa_table[dfa_states]                      # [B, V(_local)]
        rows = (g & 0xFFFF) - 1                        # next state or -1
        allowed = rows >= 0
        nxt_dist = g >> 16
    else:
        rows = dfa_table[dfa_states]                   # [B, V(_local)]
        allowed = rows >= 0
        nxt_dist = None
    if budgets is not None and (packed or dfa_dist is not None):
        if packed:
            # 32767 is the clipped INF sentinel — it must stay
            # unreachable at ANY budget (the unpacked form bans
            # dead-state transitions even for "unlimited" slots), so
            # the BUDGET is clamped below it rather than the dist
            # remapped; exact for every real close-distance < 32767
            # (asserted at pack time).
            bud = jnp.minimum(budgets - 1, 32766)[:, None]
        else:
            nxt_dist = dfa_dist[jnp.maximum(rows, 0)]  # [B, V(_local)]
            bud = (budgets - 1)[:, None]
        can_close = allowed & (nxt_dist <= bud)
        some = can_close.any(axis=-1, keepdims=True)   # [B, 1]
        if axis is not None:
            some = jax.lax.psum(some.astype(jnp.int32), axis) > 0
        allowed = jnp.where(some, can_close, allowed)
    masked = jnp.where(allowed, logits, _NEG_INF)
    tok = sample_tokens(masked, rng, temperature, top_k, top_p, axis=axis)
    if axis is not None:
        v_local = rows.shape[-1]
        offset = jax.lax.axis_index(axis) * v_local
        local = tok - offset                           # [B]
        owns = (local >= 0) & (local < v_local)
        safe = jnp.clip(local, 0, v_local - 1)
        ns_local = jnp.take_along_axis(
            rows, safe[:, None].astype(jnp.int32), axis=-1
        )[:, 0]
        # sampled tokens are always allowed => owner's next state >= 0;
        # non-owners contribute 0, so one psum reconstructs it exactly
        # (FREE self-loops are state 0, which psum preserves).
        new_states = jax.lax.psum(
            jnp.where(owns, ns_local, 0), axis
        ).astype(jnp.int32)
    else:
        new_states = jnp.take_along_axis(
            rows, tok[:, None].astype(jnp.int32), axis=-1
        )[:, 0].astype(jnp.int32)
    return tok, new_states
