"""Flash kernel differentiability: grads match the dense reference."""

import jax
import jax.numpy as jnp
import numpy as np

from deepvision_tpu.engine.kernels.flash_attention import (
    flash_attention,
    flash_attention_reference,
)


def test_flash_grads_match_dense():
    B, H, KV, S, HD = 1, 2, 2, 64, 32
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, HD), jnp.float32)
    k = jax.random.normal(kk, (B, KV, S, HD), jnp.float32)
    v = jax.random.normal(kv_, (B, KV, S, HD), jnp.float32)
    lens = jnp.asarray([S], jnp.int32)

    def loss_kernel(q, k, v):
        out = flash_attention(q, k, v, lens, blk_q=32, blk_k=32,
                              interpret=True)
        return jnp.sum(out ** 2)

    def loss_dense(q, k, v):
        out = flash_attention_reference(q, k, v, lens)
        return jnp.sum(out ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_forward_train_with_kernel_differentiable():
    from deepvision_tpu.engine import model as model_lib
    from deepvision_tpu.engine.config import TINY_TEST
    from deepvision_tpu.engine.training import cross_entropy_loss
    from deepvision_tpu.engine.weights import init_params

    params = init_params(TINY_TEST, seed=0)
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(1, 100, size=(1, 16)), jnp.int32
    )

    def loss(p):
        logits = model_lib.forward_train(
            p, tokens[:, :-1], cfg=TINY_TEST, use_kernel=True,
            interpret=True,
        )
        return cross_entropy_loss(logits, tokens[:, 1:])

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
