"""Token sampling: temperature / top-k / top-p, vectorized over the batch.

Everything is shape-static and branch-free (``jnp.where`` masks instead of
Python control flow) so one jitted decode step serves every request's
per-slot sampling parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def sample_tokens(
    logits: jax.Array,        # [B, V] fp32
    rng: jax.Array,           # PRNGKey
    temperature: jax.Array,   # [B] (0 => greedy)
    top_k: jax.Array,         # [B] int32 (0 => disabled)
    top_p: jax.Array,         # [B] (1.0 => disabled)
) -> jax.Array:
    """Returns ``[B]`` int32 sampled token ids."""
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature, 1e-4)[:, None]
    scaled = logits / temp

    # top-k mask: keep the k highest-scoring entries per row.
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]  # [B, V]
    k = jnp.clip(top_k, 0, V)
    kth_idx = jnp.where(k > 0, k - 1, V - 1)
    kth_val = jnp.take_along_axis(sorted_desc, kth_idx[:, None], axis=-1)
    keep_k = jnp.where((top_k > 0)[:, None], scaled >= kth_val, True)

    # top-p (nucleus) mask over the sorted distribution.
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # Keep entries whose prefix (exclusive) mass is < top_p.
    prefix = cum - probs_sorted
    cutoff_val = jnp.where(
        prefix < top_p[:, None], sorted_desc, jnp.full_like(sorted_desc, _NEG_INF)
    ).min(axis=-1, keepdims=True, initial=jnp.inf, where=prefix < top_p[:, None])
    keep_p = scaled >= cutoff_val

    masked = jnp.where(keep_k & keep_p, scaled, _NEG_INF)
    sampled = jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)
