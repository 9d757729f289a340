"""Token sampling: temperature / top-k / top-p, vectorized over the batch.

Everything is shape-static and branch-free (``jnp.where`` masks instead of
Python control flow) so one jitted decode step serves every request's
per-slot sampling parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


# All candidate selection happens inside the top-MAX_K logits: a full-vocab
# sort of [B, 256k] costs tens of ms on TPU; lax.top_k over a fixed small K
# is the serving-friendly form, and top_k/top_p requests beyond MAX_K
# candidates are statistically indistinguishable for LM logits.
MAX_K = 64


def sample_tokens(
    logits: jax.Array,        # [B, V] fp32
    rng: jax.Array,           # PRNGKey
    temperature: jax.Array,   # [B] (0 => greedy)
    top_k: jax.Array,         # [B] int32 (0 => disabled)
    top_p: jax.Array,         # [B] (1.0 => disabled)
) -> jax.Array:
    """Returns ``[B]`` int32 sampled token ids."""
    B, V = logits.shape
    k_cand = min(MAX_K, V)
    top_vals, top_idx = jax.lax.top_k(logits, k_cand)  # [B, K] descending

    greedy = top_idx[:, 0].astype(jnp.int32)

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
    logits: jax.Array,        # [B, V] fp32
    rng: jax.Array,
    temperature: jax.Array,   # [B]
    top_k: jax.Array,         # [B]
    top_p: jax.Array,         # [B]
    dfa_states: jax.Array,    # [B] int32 — row into dfa_table (0 = FREE)
    dfa_table: jax.Array,     # [S, V] — next state or -1 (forbidden)
):
    """Grammar-constrained sampling: logits of forbidden tokens are masked
    before top-k/top-p, and the DFA state advances on-device so fused
    multi-step decode (``lax.scan``) keeps masks exact per step.  Row 0 of
    the table is the all-allowed FREE state, so unconstrained requests
    share the same compiled program.  Returns ``(tokens [B], states [B])``.
    """
    rows = dfa_table[dfa_states]                       # [B, V]
    allowed = rows >= 0
    masked = jnp.where(allowed, logits, _NEG_INF)
    tok = sample_tokens(masked, rng, temperature, top_k, top_p)
    new_states = jnp.take_along_axis(
        rows, tok[:, None].astype(jnp.int32), axis=-1
    )[:, 0].astype(jnp.int32)
    return tok, new_states
