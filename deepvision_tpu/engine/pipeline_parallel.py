"""Pipeline parallelism (GPipe-style) over a ``pipe`` mesh axis.

The last §2.2 scale axis: TP shards within a layer (parallel.py), SP
shards the sequence (ring_attention.py), DP shards the batch — PP
shards the LAYER STACK across devices, which is what lets a model whose
weights exceed one chip's HBM train/serve across ICI neighbors without
paying TP's per-layer collectives.

TPU-native formulation (jax-ml.github.io/scaling-book pipelining
recipe) rather than a port (the reference has no distributed compute,
SURVEY.md §2.2):

* the stacked block params' leading LAYER axis is sharded over
  ``pipe`` — each device materializes only its contiguous ``L/S``-layer
  stage, so HBM per chip drops by the stage count;
* microbatches stream through a ``lax.scan`` over
  ``n_micro + n_stages - 1`` ticks; activations hop stage→stage with a
  single ``lax.ppermute`` per tick (nearest-neighbor ICI traffic, the
  cheapest collective on a TPU torus);
* the whole schedule is one differentiable function: ``jax.grad``
  transposes the ppermute (reverse hop) and scan (reverse ticks), so
  the backward pass is automatically the reverse pipeline — no manual
  1F1B bookkeeping;
* bubbles are masked with ``jnp.where`` (compiler-friendly static
  control flow), costing ``(S-1)/(M+S-1)`` idle fraction exactly as the
  classic GPipe analysis predicts — raise ``n_micro`` to amortize.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepvision_tpu.engine import model as model_lib
from deepvision_tpu.engine.config import ModelConfig

PIPE_AXIS = "pipe"


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devs = np.asarray(devices[:n_stages]).reshape(n_stages)
    return Mesh(devs, (PIPE_AXIS,))


def pp_param_specs(cfg: ModelConfig) -> dict:
    """Blocks shard their LAYER axis over ``pipe`` (= stage assignment:
    contiguous chunks); embeddings/norm/head replicate."""
    blk = {k: P(PIPE_AXIS) for k in
           ("ln1", "ln2", "wq", "wk", "wv", "wo",
            "w_gate", "w_up", "w_down")}
    specs = {"embed": P(), "final_norm": P(), "blocks": blk}
    if not cfg.tie_embeddings:
        specs["lm_head"] = P()
    return specs


def place_pp_params(params, mesh: Mesh, cfg: ModelConfig):
    specs = pp_param_specs(cfg)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
    return jax.tree.map(jax.device_put, params, shardings)


def _stage_forward(blocks_local, x, cfg: ModelConfig, act_dtype):
    """Apply this device's L/S-layer chunk (dense differentiable path,
    same math as model_lib.forward_train's layer body)."""
    from deepvision_tpu.engine.kernels.flash_attention import (
        flash_attention_reference,
    )

    B, S, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    seq_lens = jnp.full((B,), S, dtype=jnp.int32)

    def layer(x, blk):
        h = model_lib.rms_norm(x, blk["ln1"], cfg.rms_eps)
        q = jnp.dot(h, blk["wq"], preferred_element_type=act_dtype)
        k = jnp.dot(h, blk["wk"], preferred_element_type=act_dtype)
        v = jnp.dot(h, blk["wv"], preferred_element_type=act_dtype)
        nh = q.shape[-1] // cfg.head_dim
        nkv = k.shape[-1] // cfg.head_dim
        q = model_lib.apply_rope(
            q.reshape(B, S, nh, cfg.head_dim), positions, cfg.rope_theta)
        k = model_lib.apply_rope(
            k.reshape(B, S, nkv, cfg.head_dim), positions, cfg.rope_theta)
        v = v.reshape(B, S, nkv, cfg.head_dim)
        attn = flash_attention_reference(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), seq_lens)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nh * cfg.head_dim)
        out = jnp.dot(attn, blk["wo"], preferred_element_type=jnp.float32)
        x = x + out.astype(x.dtype)
        h2 = model_lib.rms_norm(x, blk["ln2"], cfg.rms_eps)
        gate = jax.nn.silu(
            jnp.dot(h2, blk["w_gate"], preferred_element_type=act_dtype))
        up = jnp.dot(h2, blk["w_up"], preferred_element_type=act_dtype)
        down = jnp.dot(gate * up, blk["w_down"],
                       preferred_element_type=jnp.float32)
        x = x + down.astype(x.dtype)
        return x, None

    x, _ = jax.lax.scan(layer, x, blocks_local)
    return x


def make_pp_loss_fn(
    cfg: ModelConfig,
    mesh: Mesh,
    n_micro: int,
    act_dtype=jnp.float32,
):
    """Returns ``loss_fn(params, tokens)`` — tokens ``[B, S+1]`` with
    ``B % n_micro == 0`` — computing next-token CE through the pipeline
    schedule.  Differentiable; identical value/grads to the
    single-device ``forward_train`` loss (pinned by tests)."""
    n_stages = mesh.shape[PIPE_AXIS]

    def per_shard(params, tokens):
        # params["blocks"] leaves arrive with ONLY the local stage's
        # layer chunk (leading axis L/S); embed/norm/head replicated.
        stage = jax.lax.axis_index(PIPE_AXIS)
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        B, S = inputs.shape
        mb = B // n_micro
        tok_mb = inputs.reshape(n_micro, mb, S)
        tgt_mb = targets.reshape(n_micro, mb, S)
        n_ticks = n_micro + n_stages - 1

        def embed_mb(toks):
            x = params["embed"][toks].astype(act_dtype)
            if cfg.scale_embeddings:
                x = x * jnp.asarray(cfg.d_model ** 0.5, dtype=x.dtype)
            return x

        def logits_loss(h, tgt):
            h = model_lib.rms_norm(h, params["final_norm"], cfg.rms_eps)
            w = (params["embed"].T if cfg.tie_embeddings
                 else params["lm_head"])
            logits = jnp.dot(h.astype(jnp.float32), w.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            return -jnp.mean(ll)

        right = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(h_recv, t):
            # which microbatch THIS stage processes at tick t
            mb_idx = t - stage
            active = (mb_idx >= 0) & (mb_idx < n_micro)
            safe = jnp.clip(mb_idx, 0, n_micro - 1)
            x0 = embed_mb(jax.lax.dynamic_index_in_dim(
                tok_mb, safe, axis=0, keepdims=False))
            h_in = jnp.where(stage == 0, x0, h_recv)
            h_out = _stage_forward(params["blocks"], h_in, cfg, act_dtype)
            # bubbles forward zeros (masked out of the loss anyway)
            h_out = jnp.where(active, h_out, jnp.zeros_like(h_out))
            # last stage: contribute this microbatch's loss
            tgt = jax.lax.dynamic_index_in_dim(
                tgt_mb, safe, axis=0, keepdims=False)
            is_last = stage == n_stages - 1
            mb_loss = jnp.where(
                is_last & active, logits_loss(h_out, tgt), 0.0)
            h_next = jax.lax.ppermute(h_out, PIPE_AXIS, right)
            return h_next, mb_loss

        h0 = jnp.zeros((mb, S, cfg.d_model), act_dtype)
        _, losses = jax.lax.scan(tick, h0, jnp.arange(n_ticks))
        # mean over microbatches; psum replicates the scalar to every
        # stage (non-last stages contributed zeros)
        return jax.lax.psum(jnp.sum(losses), PIPE_AXIS) / n_micro

    specs = pp_param_specs(cfg)
    kwargs = dict(mesh=mesh, in_specs=(specs, P()), out_specs=P())
    try:
        from jax import shard_map

        return shard_map(per_shard, check_vma=False, **kwargs)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map

        return shard_map(per_shard, check_rep=False, **kwargs)


def make_pp_train_step(
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    n_micro: int,
    act_dtype=jnp.float32,
):
    """jitted ``step(params, opt_state, tokens) -> (params, opt_state,
    loss)`` where block params/optimizer state stay stage-sharded."""
    loss_fn = make_pp_loss_fn(cfg, mesh, n_micro, act_dtype)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def pp_stage_layers(cfg: ModelConfig, n_stages: int) -> int:
    if cfg.n_layers % n_stages != 0:
        raise ValueError(
            f"n_layers={cfg.n_layers} not divisible by pipeline stages "
            f"{n_stages}")
    return cfg.n_layers // n_stages
