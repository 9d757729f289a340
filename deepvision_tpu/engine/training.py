"""Training/fine-tuning step: DP×TP sharded via GSPMD (pjit).

The serving path uses explicit shard_map + Pallas kernels; the training path
is pure XLA (dense attention, differentiable end-to-end), so the idiomatic
TPU route is jit with NamedSharding-placed inputs and letting GSPMD insert
collectives: batch rides the ``data`` mesh axis, parameters ride ``model``
per the same shard plan the serving engine uses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepvision_tpu.engine import model as model_lib
from deepvision_tpu.engine.config import ModelConfig
from deepvision_tpu.engine.parallel import (
    DATA_AXIS,
    ShardPlan,
    shard_params,
)
from deepvision_tpu.engine.weights import init_params


def cross_entropy_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def make_train_step(
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    *,
    use_kernel: bool = False,
):
    """Returns jitted ``step(params, opt_state, tokens) -> (params, opt_state, loss)``.

    ``use_kernel=True`` runs the Pallas flash-attention forward with the
    dense-recompute VJP (kernels/flash_attention.py:128-151): residuals are
    O(S) per layer instead of the dense path's O(S^2) softmax activations,
    which is what makes seq-2048 training of dv-base fit in HBM.
    """

    def step(params, opt_state, tokens):
        def loss_fn(p):
            logits = model_lib.forward_train(
                p, tokens[:, :-1], cfg=cfg, use_kernel=use_kernel
            )
            return cross_entropy_loss(logits, tokens[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


class Trainer:
    """Minimal fine-tuning harness over the serving shard plan."""

    def __init__(
        self,
        cfg: ModelConfig,
        mesh: Optional[Mesh] = None,
        plan: Optional[ShardPlan] = None,
        learning_rate: float = 1e-4,
        seed: int = 0,
        tx: Optional[optax.GradientTransformation] = None,
        param_dtype=None,
        use_kernel: bool = False,
        init: Optional[dict] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.plan = plan
        self.tx = tx if tx is not None else optax.adamw(learning_rate)
        if init is not None:
            params = init
        else:
            params = (init_params(cfg, seed, dtype=param_dtype)
                      if param_dtype is not None else init_params(cfg, seed))
        if mesh is not None:
            assert plan is not None
            params = shard_params(params, mesh, plan, cfg)
        self.params = params
        self.opt_state = jax.jit(self.tx.init)(params)
        self._step = make_train_step(cfg, self.tx, use_kernel=use_kernel)
        self.step_count = 0

    def place_batch(self, tokens):
        if self.mesh is None:
            return jnp.asarray(tokens)
        sharding = NamedSharding(self.mesh, P(DATA_AXIS, None))
        return jax.device_put(jnp.asarray(tokens), sharding)

    def train_step(self, tokens) -> float:
        return float(self.train_step_async(tokens))

    def train_step_async(self, tokens):
        """Like train_step but returns the on-device loss without a host
        sync — on the tunneled TPU a blocking readback costs ~28 ms/step,
        so hot loops convert losses only at log points."""
        tokens = self.place_batch(tokens)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, tokens
        )
        self.step_count += 1
        return loss
