"""Device mesh + tensor-parallel shard plan (pjit/shard_map over ICI).

The reference has no distributed compute at all (SURVEY.md §2.2); this module
is the TPU-native equivalent of the scaling story its remote gateways
outsourced.  Round-1 plan is Megatron-style tensor parallelism over a single
``("data", "model")`` mesh:

* attention qkv/out and MLP up/down projections are sharded on the head /
  feature axis of the ``model`` mesh axis; two ``psum``s per layer ride ICI;
* the KV page pool shards its kv-head axis when divisible, otherwise the
  cache (and wk/wv) replicate and only query heads shard — this is what makes
  MQA models (n_kv_heads=1, e.g. the Gemma-2B-class preset) still TP-scalable;
* embeddings / lm_head stay replicated (vocab sharding is a later round).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepvision_tpu.engine.config import ModelConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_model: Optional[int] = None,
    n_data: int = 1,
    devices=None,
) -> Mesh:
    """Create a ``(data, model)`` mesh; defaults to all devices on model."""
    if devices is None:
        devices = jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


@dataclasses.dataclass(frozen=True)
class ShardPlan:
    """How a given model shards over ``n_model`` chips."""

    n_model: int
    kv_sharded: bool
    vocab_sharded: bool = False

    # Below this vocab size the replicated lm_head matmul is cheap enough
    # that vocab sharding only adds collectives; at 128k-class vocabs
    # (dv-llama-8b) the sharded head saves V/n x both HBM and MXU time.
    VOCAB_SHARD_MIN = 32768

    @classmethod
    def for_model(
        cls, cfg: ModelConfig, n_model: int,
        vocab_sharded: Optional[bool] = None,
    ) -> "ShardPlan":
        if cfg.n_heads % n_model != 0:
            raise ValueError(
                f"n_heads={cfg.n_heads} not divisible by TP degree {n_model}"
            )
        if cfg.d_ff % n_model != 0:
            raise ValueError(
                f"d_ff={cfg.d_ff} not divisible by TP degree {n_model}"
            )
        if vocab_sharded is None:
            vocab_sharded = (
                cfg.vocab_size >= cls.VOCAB_SHARD_MIN
                and cfg.vocab_size % n_model == 0
            )
        elif vocab_sharded and cfg.vocab_size % n_model != 0:
            raise ValueError(
                f"vocab_size={cfg.vocab_size} not divisible by TP degree "
                f"{n_model}"
            )
        return cls(
            n_model=n_model,
            kv_sharded=cfg.n_kv_heads % n_model == 0,
            vocab_sharded=vocab_sharded,
        )

    # -- PartitionSpecs ------------------------------------------------

    def param_specs(self, cfg: ModelConfig, quantized: bool = False) -> dict:
        kv = P(None, None, MODEL_AXIS) if self.kv_sharded else P(None, None, None)
        specs = {
            # vocab sharding splits the embedding's vocab rows (Megatron
            # style): the tied lm_head then produces LOCAL [.., V/n] logits
            # and sampling merges per-shard top-k over ICI — the full
            # [B, V] logits tensor never materializes on any one chip.
            "embed": (P(MODEL_AXIS, None) if self.vocab_sharded
                      else P(None, None)),
            "final_norm": P(None),
            "blocks": {
                "ln1": P(None, None),
                "ln2": P(None, None),
                "wq": P(None, None, MODEL_AXIS),
                "wk": kv,
                "wv": kv,
                "wo": P(None, MODEL_AXIS, None),
                "w_gate": P(None, None, MODEL_AXIS),
                "w_up": P(None, None, MODEL_AXIS),
                "w_down": P(None, MODEL_AXIS, None),
            },
        }
        if not cfg.tie_embeddings:
            specs["lm_head"] = (P(None, MODEL_AXIS) if self.vocab_sharded
                                else P(None, None))
        if quantized:
            # int8 weights (engine/quant.py) shard exactly like their bf16
            # originals; the per-OUT-channel scale drops the IN axis
            # (second-to-last), so it inherits the spec minus that entry —
            # replicated for row-parallel (input-sharded) layers, which is
            # what lets the scale multiply commute with the psum.
            from deepvision_tpu.engine.quant import QUANT_LEAVES

            def qspec(base: P) -> dict:
                return {"q8": base, "scale": P(*base[:-2], base[-1])}

            specs["blocks"] = {
                name: (qspec(s) if name in QUANT_LEAVES else s)
                for name, s in specs["blocks"].items()
            }
            if "lm_head" in specs:
                specs["lm_head"] = qspec(specs["lm_head"])
        return specs

    def dfa_spec(self) -> P:
        """Grammar table [S, V]: sharded on the vocab axis alongside the
        logits so constrained masks apply shard-locally."""
        return P(None, MODEL_AXIS) if self.vocab_sharded else P()

    def cache_specs(self, n_layers: int, kv_quantized: bool = False) -> dict:
        # per layer [KV, N_PAGES, PAGE, HD] — shard kv heads when possible.
        spec = (
            P(MODEL_AXIS, None, None, None)
            if self.kv_sharded
            else P(None, None, None, None)
        )
        out = {
            "k": tuple(spec for _ in range(n_layers)),
            "v": tuple(spec for _ in range(n_layers)),
        }
        if kv_quantized:
            # [KV] static dequant scales ride the kv-head shard axis
            sspec = P(MODEL_AXIS) if self.kv_sharded else P(None)
            out["ks"] = tuple(sspec for _ in range(n_layers))
            out["vs"] = tuple(sspec for _ in range(n_layers))
        return out


def named_shardings(mesh: Mesh, specs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params, mesh: Mesh, plan: ShardPlan, cfg: ModelConfig):
    """Place a (host or single-device) param pytree onto the mesh."""
    from deepvision_tpu.engine.quant import is_quantized

    shardings = named_shardings(
        mesh, plan.param_specs(cfg, quantized=is_quantized(params))
    )
    return jax.tree.map(jax.device_put, params, shardings)
