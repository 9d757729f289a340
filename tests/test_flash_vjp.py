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


def test_flash_backward_gqa_padded_lens():
    """Pallas backward kernels vs dense VJP, GQA + per-batch padding.

    Cotangents for rows past seq_lens are zeroed (the documented contract:
    forward output rows past seq_lens are junk, so their cotangents must
    not flow).
    """
    B, H, KV, S, HD = 2, 4, 2, 128, 64
    key = jax.random.PRNGKey(7)
    kq, kk, kv_, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, H, S, HD), jnp.float32)
    k = jax.random.normal(kk, (B, KV, S, HD), jnp.float32)
    v = jax.random.normal(kv_, (B, KV, S, HD), jnp.float32)
    lens = jnp.asarray([S, 80], jnp.int32)
    row_valid = (jnp.arange(S)[None, :] < lens[:, None])[:, None, :, None]
    g = jax.random.normal(kg, (B, H, S, HD), jnp.float32) * row_valid

    def run(fn):
        out, vjp = jax.vjp(lambda q_, k_, v_: fn(q_, k_, v_), q, k, v)
        return vjp(g)

    gk = run(lambda q_, k_, v_: flash_attention(
        q_, k_, v_, lens, blk_q=64, blk_k=32, interpret=True))
    gd = run(lambda q_, k_, v_: flash_attention_reference(q_, k_, v_, lens))
    for a, b, name in zip(gk, gd, ("dq", "dk", "dv")):
        a = np.asarray(a)
        b = np.asarray(b)
        if name == "dq":  # junk-row grads are unspecified; compare valid rows
            m = np.asarray(row_valid, bool)
            a = a * m
            b = b * m
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3, err_msg=name)


def test_flash_backward_uneven_blocks():
    B, H, KV, S, HD = 1, 3, 1, 96, 32
    key = jax.random.PRNGKey(3)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, HD), jnp.float32)
    k = jax.random.normal(kk, (B, KV, S, HD), jnp.float32)
    v = jax.random.normal(kv_, (B, KV, S, HD), jnp.float32)
    lens = jnp.asarray([S], jnp.int32)

    def loss_kernel(q, k, v):
        out = flash_attention(q, k, v, lens, blk_q=32, blk_k=48,
                              interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(flash_attention_reference(q, k, v, lens)))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
