"""Projection fusion for serving: one matmul where three would run.

Fuses ``wq|wk|wv`` into one ``[D, (H+2KV)*HD]`` matmul and
``w_gate|w_up`` into ``[D, 2F]``; the split of the fused result is a
free slice XLA folds into the consumers, and each output column is the
same dot product as unfused — greedy parity pinned by tests/test_fuse.py.

MEASURED VERDICT (round-3 on-chip K-sweep, dv-1b B=8): within noise.
The decode step is one XLA program, so there is no per-op launch cost
for fusion to remove — the skinny [8, D] matmuls are weight-streaming
bound either way, and wider tiles barely change the DMA pattern
(int8 K=16: 8.10 fused vs 8.20 unfused ms/step; bf16 K=8 regressed
11.9 -> 13.2).  ``EngineConfig.fuse_projections`` therefore defaults
OFF; the path stays for architectures with many small heads where the
qkv tiles underfill the MXU.

Single-device serving only: under tensor parallelism each segment (q, k,
v) shards its own head axis, and a fused weight would need
per-shard-contiguous interleaving to keep ``shard_map`` specs simple —
the engine keeps unfused weights when ``tp > 1`` (engine.py).

Composes with int8: fuse FIRST, then quantize — per-output-channel
scales concatenate naturally along the fused axis.

The reference has no analogue (remote inference); this is TPU serving
surface, same family as engine/quant.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from deepvision_tpu.engine.config import ModelConfig


def fuse_params(params: dict, cfg: ModelConfig) -> dict:
    """Return a pytree with ``w_qkv`` / ``w_gate_up`` replacing the
    separate projection leaves.  Input leaves must be plain arrays
    (quantize AFTER fusing)."""
    blocks = dict(params["blocks"])
    for name in ("wq", "wk", "wv", "w_gate", "w_up"):
        if isinstance(blocks.get(name), dict):
            raise ValueError("fuse_params must run before quantize_params")
    blocks["w_qkv"] = jnp.concatenate(
        [blocks.pop("wq"), blocks.pop("wk"), blocks.pop("wv")], axis=-1
    )
    blocks["w_gate_up"] = jnp.concatenate(
        [blocks.pop("w_gate"), blocks.pop("w_up")], axis=-1
    )
    out = dict(params)
    out["blocks"] = blocks
    return out


def is_fused(params: dict) -> bool:
    return "w_qkv" in params.get("blocks", {})
