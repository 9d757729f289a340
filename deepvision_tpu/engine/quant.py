"""Int8 weight-only quantization for serving (per-output-channel symmetric).

Decode at serving batch sizes is HBM-bound on PARAMETER STREAMING: every
token-step pulls the full weight set from HBM once, so bytes-per-param is
the floor (PERF_NOTES.md round-3 K-sweep: dv-1b decode compute ~10 ms/step
vs a 4 ms bf16 params-streaming floor).  Storing the block matmul weights
as int8 halves those bytes.  The TPU-native mechanics:

* weights live in HBM as ``int8`` plus one fp32 scale per OUTPUT channel
  (symmetric, zero-point-free — weights are zero-centered in practice);
* the matmul runs ``x_bf16 @ convert(w_int8 -> bf16)``: XLA fuses the
  convert into the MXU tile loads, so HBM traffic stays int8 and the MXU
  sees ordinary bf16 operands (int8 values up to 127 are exact in bf16);
* the per-channel scale multiplies the ``[B, out]`` RESULT — O(B*out)
  VPU work, amortized to nothing next to the O(in*out) weight stream.
  For row-parallel (input-sharded) layers the scale is replicated and
  per-out-channel, so ``scale * psum(partial)`` == ``psum(scale * partial)``
  and the multiply can stay inside the shard_map body before the psum.

Activations stay bf16 end to end: this is weight-only quantization, chosen
because serving decode is weight-bandwidth-bound, not activation-bound,
and it needs no calibration data.

The reference has no quantization (its inference was remote HTTP,
reference web/server.py:26860 ``call_claude``); this is TPU-native serving
surface the reference outsourced to its model vendors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Block weight leaves that are matmul operands (norm scales stay fp).
# Includes the fused-projection leaves (engine/fuse.py): fuse first,
# then quantize — per-out-channel scales concatenate along the fused axis.
QUANT_LEAVES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                "w_qkv", "w_gate_up")

_INT8_MAX = 127.0


def quantize_weight(w: jax.Array) -> dict:
    """Quantize one matmul weight ``[..., in, out]`` to int8.

    Returns ``{"q8": int8 [..., in, out], "scale": f32 [..., out]}`` with
    ``w ≈ q8 * scale[..., None, :]`` (scale folded by 1/127 so dequant is
    a single multiply).
    """
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)  # [..., out]
    scale = jnp.where(amax > 0, amax, 1.0) / _INT8_MAX
    q = jnp.clip(
        jnp.round(wf / scale[..., None, :]), -_INT8_MAX, _INT8_MAX
    ).astype(jnp.int8)
    return {"q8": q, "scale": scale.astype(jnp.float32)}


def dequantize_weight(qw: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (
        qw["q8"].astype(jnp.float32) * qw["scale"][..., None, :]
    ).astype(dtype)


def is_quantized_weight(w) -> bool:
    return isinstance(w, dict) and "q8" in w


def quantize_params(params: dict) -> dict:
    """Quantize a serving parameter pytree's matmul weights to int8.

    Blocks (stacked-layer leaves) and an untied ``lm_head`` quantize;
    embeddings and norm scales stay in their checkpoint dtype (the embed
    gather is bandwidth-trivial per token and the tied lm_head shares its
    storage, so quantizing it would also quantize the lookup table).
    """
    out = dict(params)
    blocks = dict(params["blocks"])
    for name in QUANT_LEAVES:
        if name in blocks:
            blocks[name] = quantize_weight(blocks[name])
    out["blocks"] = blocks
    if "lm_head" in params:
        out["lm_head"] = quantize_weight(params["lm_head"])
    return out


def dequantize_params(params: dict, dtype=jnp.bfloat16) -> dict:
    out = dict(params)
    blocks = dict(params["blocks"])
    for name, leaf in blocks.items():
        if is_quantized_weight(leaf):
            blocks[name] = dequantize_weight(leaf, dtype)
    out["blocks"] = blocks
    if is_quantized_weight(out.get("lm_head")):
        out["lm_head"] = dequantize_weight(out["lm_head"], dtype)
    return out


def is_quantized(params: dict) -> bool:
    """True when the pytree carries int8 block weights."""
    blocks = params.get("blocks", {})
    return any(is_quantized_weight(blocks.get(n)) for n in QUANT_LEAVES)
