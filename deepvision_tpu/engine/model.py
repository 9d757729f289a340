"""Pure-JAX decoder-only transformer (Llama/Gemma family) for serving.

Written TPU-first rather than ported (the reference has no model code; its
inference is remote HTTP — reference web/server.py:26860 ``call_claude``):

* Parameters are a pytree whose block leaves carry a leading layer axis, so
  the forward pass is a single ``lax.scan`` over layers — one compile, MXU
  stays hot, and the paged KV cache rides the scan as per-layer xs/ys.
* The same code runs single-device or as the per-shard body of a
  ``shard_map`` tensor-parallel mesh: pass ``axis="model"`` and the two
  Megatron-style ``psum``s per layer (attention out-proj, MLP down-proj) plus
  a vocab ``all_gather`` for logits become real ICI collectives; with
  ``axis=None`` they are identity.
* Attention uses the Pallas kernels (flash for prefill, paged for decode).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from deepvision_tpu.engine.config import ModelConfig
from deepvision_tpu.engine.kernels.flash_attention import flash_attention
from deepvision_tpu.engine.kv_cache import write_prefill_pages


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * (1.0 + scale.astype(jnp.float32))).astype(x.dtype)


def _rope_angles(positions: jax.Array, head_dim: int, theta: float):
    """positions: [...]; returns cos/sin of shape [..., head_dim//2]."""
    half = head_dim // 2
    freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    ang = positions.astype(jnp.float32)[..., None] * freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding, rotate-half convention.

    x: ``[..., n_heads, head_dim]``; positions broadcastable to ``x.shape[:-2]``.
    """
    half = x.shape[-1] // 2
    cos, sin = _rope_angles(positions, x.shape[-1], theta)
    cos = cos[..., None, :]  # add head axis
    sin = sin[..., None, :]
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)


def _psum(x: jax.Array, axis: Optional[str]) -> jax.Array:
    return jax.lax.psum(x, axis) if axis else x


def qdot(x, w, preferred_element_type=jnp.bfloat16):
    """Matmul accepting a plain array OR an int8 quantized weight dict.

    For ``{"q8", "scale"}`` weights (engine/quant.py) the int8 tensor is
    what streams from HBM — XLA fuses the int8->bf16 convert into the MXU
    tile loads — and the per-output-channel scale multiplies the result.
    """
    if isinstance(w, dict):
        y = jnp.dot(
            x.astype(jnp.bfloat16), w["q8"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return (y * w["scale"]).astype(preferred_element_type)
    return jnp.dot(x, w, preferred_element_type=preferred_element_type)


def _qkv_proj(h, blk, cfg, dtype=jnp.bfloat16):
    """q/k/v projections; one fused matmul when the params carry the
    serving-fused ``w_qkv`` leaf (engine/fuse.py — single-device only,
    so the full-model widths below are the local widths)."""
    if "w_qkv" in blk:
        qkv = qdot(h, blk["w_qkv"], preferred_element_type=dtype)
        q_w = cfg.n_heads * cfg.head_dim
        kv_w = cfg.n_kv_heads * cfg.head_dim
        return (qkv[..., :q_w], qkv[..., q_w:q_w + kv_w],
                qkv[..., q_w + kv_w:])
    return (qdot(h, blk["wq"], preferred_element_type=dtype),
            qdot(h, blk["wk"], preferred_element_type=dtype),
            qdot(h, blk["wv"], preferred_element_type=dtype))


def _mlp(x, blk, axis, compute_dtype=jnp.bfloat16):
    if "w_gate_up" in blk:
        gu = qdot(x, blk["w_gate_up"], preferred_element_type=compute_dtype)
        F = gu.shape[-1] // 2
        gate, up = gu[..., :F], gu[..., F:]
    else:
        gate = qdot(x, blk["w_gate"], preferred_element_type=compute_dtype)
        up = qdot(x, blk["w_up"], preferred_element_type=compute_dtype)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    down = qdot(h, blk["w_down"], preferred_element_type=jnp.float32)
    return _psum(down, axis).astype(x.dtype)


def _embed(params, tokens, axis: Optional[str], vocab_sharded: bool,
           dtype=jnp.bfloat16):
    """Embedding lookup; under vocab sharding each chip holds V/n rows
    (see engine/parallel.py), so the owner shard contributes the row and a
    psum over ICI reconstructs it (Megatron parallel embedding)."""
    embed = params["embed"]
    if not (axis and vocab_sharded):
        return jnp.take(embed, tokens, axis=0).astype(dtype)
    v_local = embed.shape[0]
    local = tokens - jax.lax.axis_index(axis) * v_local
    owns = (local >= 0) & (local < v_local)
    rows = jnp.take(embed, jnp.clip(local, 0, v_local - 1), axis=0)
    rows = jnp.where(owns[..., None], rows, 0)
    return jax.lax.psum(rows, axis).astype(dtype)


def _logits(x, params, cfg: ModelConfig, axis: Optional[str],
            vocab_sharded: bool = False):
    """x: [..., D] final hidden -> fp32 logits.

    Replicated lm_head (default): full [..., V] on every chip, no
    collective.  Vocab-sharded: the matmul runs against the LOCAL [D, V/n]
    shard and returns local logits — sampling merges per-shard top-k
    (engine/sampling.py) so the full-vocab tensor never materializes.
    """
    if cfg.tie_embeddings:
        w = params["embed"].T  # [D, V] (or local [D, V/n])
    else:
        w = params["lm_head"]
    if isinstance(w, dict):
        logits = qdot(x, w, preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(
            x.astype(jnp.float32), w.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    if cfg.logit_softcap:
        logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
    return logits


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------

def _kv_scales(cache, layer_idx):
    """Per-layer static int8 KV scales ([KV] each), or (None, None) for
    bf16 pools (kv_cache.init_cache only adds ks/vs in int8 mode)."""
    if "ks" in cache:
        return cache["ks"][layer_idx], cache["vs"][layer_idx]
    return None, None


def forward_prefill(
    params,
    cache,
    tokens: jax.Array,        # [B, S] int32, right-padded to bucket S
    seq_lens: jax.Array,      # [B] int32 true lengths
    prefill_pages: jax.Array,  # [B, S // page] destination page ids
    *,
    cfg: ModelConfig,
    axis: Optional[str] = None,
    vocab_sharded: bool = False,
    interpret: Optional[bool] = None,
):
    """Run the prompt through the model, writing K/V pages.

    Layers are python-unrolled over per-layer cache leaves so page writes
    land on donated buffers in place (no consumer reads the pools during
    prefill — the flash kernel attends over the prompt's dense K/V).

    Returns ``(last_logits [B, V], new_cache)``.
    """
    B, S = tokens.shape
    x = _embed(params, tokens, axis, vocab_sharded)
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.d_model ** 0.5, dtype=x.dtype)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))

    k_list = list(cache["k"])
    v_list = list(cache["v"])
    for layer_idx in range(cfg.n_layers):
        blk = jax.tree.map(lambda a: a[layer_idx], params["blocks"])
        h = rms_norm(x, blk["ln1"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg)
        n_heads_local = q.shape[-1] // cfg.head_dim
        n_kv_local = k.shape[-1] // cfg.head_dim
        q = q.reshape(B, S, n_heads_local, cfg.head_dim)
        k = k.reshape(B, S, n_kv_local, cfg.head_dim)
        v = v.reshape(B, S, n_kv_local, cfg.head_dim)
        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)

        ksc, vsc = _kv_scales(cache, layer_idx)
        k_list[layer_idx], v_list[layer_idx] = write_prefill_pages(
            k_list[layer_idx], v_list[layer_idx], k, v, prefill_pages,
            k_scale=ksc, v_scale=vsc,
        )

        # Serving flash blocks: the r5 on-chip sweep measured 512x512
        # 31% faster than 128x128 at the batch4@2048 admission shape
        # (193.5 -> 133.2 ms; 256x256 within 6% of best) — bigger
        # blocks mean fewer grid programs and fuller MXU contractions.
        # Default: the largest of 512/256/128 that divides the padded
        # bucket (Mosaic needs whole blocks); env-overridable for A/B
        # (scripts/exp_round5_perf.py).
        fblk = 512 if S % 512 == 0 else (256 if S % 256 == 0 else 128)
        attn = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            seq_lens,
            blk_q=int(os.environ.get("DV_FLASH_BLK_Q", str(fblk))),
            blk_k=int(os.environ.get("DV_FLASH_BLK_K", str(fblk))),
            interpret=interpret,
        )  # [B, Hl, S, HD]
        attn = attn.transpose(0, 2, 1, 3).reshape(
            B, S, n_heads_local * cfg.head_dim
        )
        out = qdot(attn, blk["wo"], preferred_element_type=jnp.float32)
        x = x + _psum(out, axis).astype(x.dtype)
        h2 = rms_norm(x, blk["ln2"], cfg.rms_eps)
        x = x + _mlp(h2, blk, axis)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    # Gather each sequence's last valid hidden state.
    last = jnp.take_along_axis(
        x, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = _logits(last, params, cfg, axis, vocab_sharded)
    return logits, dict(cache, k=tuple(k_list), v=tuple(v_list))


def forward_prefill_chunk(
    params,
    cache,
    tokens: jax.Array,        # [B, C] this chunk's tokens (0-padded tail)
    chunk_starts: jax.Array,  # [B] absolute position of tokens[:, 0]
    seq_lens: jax.Array,      # [B] total prompt length
    block_tables: jax.Array,  # [B, MAX_PAGES]
    *,
    cfg: ModelConfig,
    axis: Optional[str] = None,
    vocab_sharded: bool = False,
    interpret: Optional[bool] = None,
):
    """One chunk of chunked prefill: write this chunk's K/V pages, attend
    over all pages up to each query's position.  ONE compiled program
    serves every prompt length (no per-bucket compiles), and chunks can
    interleave with decode steps so long prompts never stall the batch.

    Returns ``(last_logits [B, V], new_cache)`` — logits of the row at
    ``seq_lens - 1`` (meaningful on the final chunk).
    """
    from deepvision_tpu.engine.kernels.paged_chunk import (
        paged_chunk_attention,
    )
    from deepvision_tpu.engine.kv_cache import write_chunk_tokens

    B, C = tokens.shape
    x = _embed(params, tokens, axis, vocab_sharded)
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.d_model ** 0.5, dtype=x.dtype)
    positions = chunk_starts[:, None] + jnp.arange(C, dtype=jnp.int32)

    k_list = list(cache["k"])
    v_list = list(cache["v"])
    for layer_idx in range(cfg.n_layers):
        blk = jax.tree.map(lambda a: a[layer_idx], params["blocks"])
        h = rms_norm(x, blk["ln1"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg)
        n_heads_local = q.shape[-1] // cfg.head_dim
        n_kv_local = k.shape[-1] // cfg.head_dim
        q = q.reshape(B, C, n_heads_local, cfg.head_dim)
        k = k.reshape(B, C, n_kv_local, cfg.head_dim)
        v = v.reshape(B, C, n_kv_local, cfg.head_dim)
        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)

        ksc, vsc = _kv_scales(cache, layer_idx)
        k_list[layer_idx], v_list[layer_idx] = write_chunk_tokens(
            k_list[layer_idx], v_list[layer_idx], k, v,
            block_tables, positions, seq_lens,
            k_scale=ksc, v_scale=vsc,
        )
        chunk_end = jnp.minimum(chunk_starts + C, seq_lens)
        attn = paged_chunk_attention(
            q, k_list[layer_idx], v_list[layer_idx], block_tables,
            chunk_starts, chunk_end, k_scale=ksc, v_scale=vsc,
            interpret=interpret,
        )
        attn = attn.reshape(B, C, n_heads_local * cfg.head_dim)
        out = qdot(attn, blk["wo"], preferred_element_type=jnp.float32)
        x = x + _psum(out, axis).astype(x.dtype)
        h2 = rms_norm(x, blk["ln2"], cfg.rms_eps)
        x = x + _mlp(h2, blk, axis)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    last_row = jnp.clip(seq_lens - 1 - chunk_starts, 0, C - 1)
    last = jnp.take_along_axis(
        x, last_row[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = _logits(last, params, cfg, axis, vocab_sharded)
    return logits, dict(cache, k=tuple(k_list), v=tuple(v_list))


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def forward_decode(
    params,
    cache,
    tokens: jax.Array,        # [B] int32 current tokens
    seq_lens: jax.Array,      # [B] int32 lengths INCLUDING current token
    block_tables: jax.Array,  # [B, MAX_PAGES]
    *,
    cfg: ModelConfig,
    axis: Optional[str] = None,
    vocab_sharded: bool = False,
    interpret: Optional[bool] = None,
):
    """One continuous-batching decode step.  Returns ``(logits, new_cache)``.

    Layers are python-unrolled; each layer's KV write + paged attention is
    ONE fused Pallas call whose page pools are input/output-aliased — the
    decode step never copies the cache (the lax.scan-over-layers layout
    cost one full pool copy per token).
    """
    from deepvision_tpu.engine.kernels.paged_attention import (
        paged_attention_update,
    )

    B = tokens.shape[0]
    x = _embed(params, tokens, axis, vocab_sharded)
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.d_model ** 0.5, dtype=x.dtype)
    positions = (seq_lens - 1).astype(jnp.int32)  # [B]

    k_list = list(cache["k"])
    v_list = list(cache["v"])
    for layer_idx in range(cfg.n_layers):
        blk = jax.tree.map(lambda a: a[layer_idx], params["blocks"])
        h = rms_norm(x, blk["ln1"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg)
        n_heads_local = q.shape[-1] // cfg.head_dim
        n_kv_local = k.shape[-1] // cfg.head_dim
        q = q.reshape(B, n_heads_local, cfg.head_dim)
        k = k.reshape(B, n_kv_local, cfg.head_dim)
        v = v.reshape(B, n_kv_local, cfg.head_dim)
        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)

        ksc, vsc = _kv_scales(cache, layer_idx)
        attn, k_list[layer_idx], v_list[layer_idx] = paged_attention_update(
            q, k, v, k_list[layer_idx], v_list[layer_idx],
            block_tables, seq_lens, k_scale=ksc, v_scale=vsc,
            interpret=interpret,
        )  # [B, Hl, HD]
        attn = attn.reshape(B, n_heads_local * cfg.head_dim)
        out = qdot(attn, blk["wo"], preferred_element_type=jnp.float32)
        x = x + _psum(out, axis).astype(x.dtype)
        h2 = rms_norm(x, blk["ln2"], cfg.rms_eps)
        x = x + _mlp(h2, blk, axis)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = _logits(x, params, cfg, axis, vocab_sharded)
    return logits, dict(cache, k=tuple(k_list), v=tuple(v_list))


def calibrate_kv_scales(
    params,
    tokens: jax.Array,  # [B, S] representative prompt tokens
    *,
    cfg: ModelConfig,
    margin: float = 1.25,
):
    """Static int8 KV scales from one representative forward.

    Runs the layer stack once (dense attention — the K/V rows are what
    matter, and x must evolve through real attention to produce realistic
    later-layer K/V) and returns ``(k_scales [L, KV], v_scales [L, KV])``
    where ``scale = margin * maxabs / 127``.  K is measured AFTER RoPE
    (rotation preserves norms but mixes channels) — exactly what the
    pools store.  Decode-time rows that exceed the calibrated max clip at
    +-127; ``margin`` buys headroom, and the quality cost is measured by
    scripts/eval_quant_quality.py rather than assumed.
    """
    from deepvision_tpu.engine.kernels.flash_attention import (
        flash_attention_reference,
    )

    B, S = tokens.shape
    x = _embed(params, tokens, None, False)
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.d_model ** 0.5, dtype=x.dtype)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    seq_lens = jnp.full((B,), S, dtype=jnp.int32)

    def layer(x, blk):
        h = rms_norm(x, blk["ln1"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg)
        n_heads_local = q.shape[-1] // cfg.head_dim
        n_kv_local = k.shape[-1] // cfg.head_dim
        q = apply_rope(
            q.reshape(B, S, n_heads_local, cfg.head_dim), positions,
            cfg.rope_theta,
        )
        k = apply_rope(
            k.reshape(B, S, n_kv_local, cfg.head_dim), positions,
            cfg.rope_theta,
        )
        v = v.reshape(B, S, n_kv_local, cfg.head_dim)
        k_max = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(0, 1, 3))
        v_max = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=(0, 1, 3))
        attn = flash_attention_reference(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), seq_lens,
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(
            B, S, n_heads_local * cfg.head_dim)
        out = qdot(attn, blk["wo"], preferred_element_type=jnp.float32)
        x = x + out.astype(x.dtype)
        h2 = rms_norm(x, blk["ln2"], cfg.rms_eps)
        x = x + _mlp(h2, blk, None)
        return x, (k_max, v_max)

    x, (k_maxes, v_maxes) = jax.lax.scan(
        lambda carry, blk: layer(carry, blk), x, params["blocks"]
    )
    k_scales = jnp.maximum(k_maxes * margin / 127.0, 1e-6)
    v_scales = jnp.maximum(v_maxes * margin / 127.0, 1e-6)
    return k_scales, v_scales



# ---------------------------------------------------------------------------
# Teaching/training forward (no cache) — used by the training step and tests.
# ---------------------------------------------------------------------------

def forward_train(
    params,
    tokens: jax.Array,  # [B, S]
    *,
    cfg: ModelConfig,
    axis: Optional[str] = None,
    vocab_sharded: bool = False,
    interpret: Optional[bool] = None,
    use_kernel: bool = False,
    act_dtype=jnp.bfloat16,
):
    """Full-sequence forward returning ``[B, S, V]`` logits (fp32).

    No KV cache; suitable for fine-tuning / eval.  ``use_kernel=False`` keeps
    attention in plain XLA so the whole step is differentiable (the Pallas
    flash kernel has no VJP yet); set ``use_kernel=True`` for inference-only
    full-sequence scoring.  ``act_dtype=float32`` enables bit-accurate
    parity checks against external implementations.
    """
    from deepvision_tpu.engine.kernels.flash_attention import (
        flash_attention_reference,
    )
    attn_fn = flash_attention if use_kernel else flash_attention_reference
    B, S = tokens.shape
    x = _embed(params, tokens, axis, vocab_sharded, dtype=act_dtype)
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.d_model ** 0.5, dtype=x.dtype)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    seq_lens = jnp.full((B,), S, dtype=jnp.int32)

    def layer(x, blk):
        h = rms_norm(x, blk["ln1"], cfg.rms_eps)
        q, k, v = _qkv_proj(h, blk, cfg, dtype=act_dtype)
        n_heads_local = q.shape[-1] // cfg.head_dim
        n_kv_local = k.shape[-1] // cfg.head_dim
        q = apply_rope(
            q.reshape(B, S, n_heads_local, cfg.head_dim), positions,
            cfg.rope_theta,
        )
        k = apply_rope(
            k.reshape(B, S, n_kv_local, cfg.head_dim), positions,
            cfg.rope_theta,
        )
        v = v.reshape(B, S, n_kv_local, cfg.head_dim)
        if use_kernel:
            attn = attn_fn(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                seq_lens,
                interpret=interpret,
            )
        else:
            attn = attn_fn(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                seq_lens,
            )
        attn = attn.transpose(0, 2, 1, 3).reshape(
            B, S, n_heads_local * cfg.head_dim
        )
        out = qdot(attn, blk["wo"], preferred_element_type=jnp.float32)
        x = x + _psum(out, axis).astype(x.dtype)
        h2 = rms_norm(x, blk["ln2"], cfg.rms_eps)
        x = x + _mlp(h2, blk, axis, compute_dtype=act_dtype)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["blocks"])
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    if cfg.tie_embeddings:
        w = params["embed"].T
    else:
        w = params["lm_head"]
    if isinstance(w, dict):
        logits = qdot(x, w, preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(
            x.astype(jnp.float32), w.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    if axis and vocab_sharded:
        # training keeps full-vocab logits for the softmax-CE loss
        logits = jax.lax.all_gather(logits, axis, axis=-1, tiled=True)
    if cfg.logit_softcap:
        logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
    return logits
