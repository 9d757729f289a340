"""Pipeline-parallel training tests on the 8-virtual-device CPU mesh:
the GPipe schedule must produce EXACTLY the single-device loss and
gradients (microbatch accumulation is mathematically a batch split),
stage params must be materialized only per-stage, and a short training
run must track the single-device trajectory."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepvision_tpu.engine import model as model_lib
from deepvision_tpu.engine.config import TINY_TEST
from deepvision_tpu.engine.pipeline_parallel import (
    make_pp_loss_fn,
    make_pp_mesh,
    make_pp_train_step,
    place_pp_params,
    pp_param_specs,
    pp_stage_layers,
)
from deepvision_tpu.engine.training import cross_entropy_loss
from deepvision_tpu.engine.weights import init_params

# 4 layers / 4 stages on the 8-device virtual mesh
CFG = dataclasses.replace(TINY_TEST, name="dv-tiny-pp", n_layers=4)
N_STAGES, N_MICRO = 4, 4
B, SEQ = 8, 16


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < N_STAGES:
        pytest.skip("needs >=4 devices")
    mesh = make_pp_mesh(N_STAGES)
    params = init_params(CFG, seed=0, dtype=jnp.float32)
    sharded = place_pp_params(params, mesh, CFG)
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(
        rng.integers(0, CFG.vocab_size, (B, SEQ + 1)), jnp.int32)
    return mesh, params, sharded, tokens


def _ref_loss(params, tokens):
    logits = model_lib.forward_train(
        params, tokens[:, :-1], cfg=CFG, act_dtype=jnp.float32)
    return cross_entropy_loss(logits, tokens[:, 1:])


def test_pp_loss_matches_single_device(setup):
    mesh, params, sharded, tokens = setup
    loss_fn = make_pp_loss_fn(CFG, mesh, N_MICRO)
    pp = float(jax.jit(loss_fn)(sharded, tokens))
    ref = float(_ref_loss(params, tokens))
    assert pp == pytest.approx(ref, rel=1e-5), (pp, ref)


def test_pp_grads_match_single_device(setup):
    mesh, params, sharded, tokens = setup
    loss_fn = make_pp_loss_fn(CFG, mesh, N_MICRO)
    g_pp = jax.jit(jax.grad(loss_fn))(sharded, tokens)
    g_ref = jax.grad(_ref_loss)(params, tokens)
    flat_pp = jax.tree.leaves(g_pp)
    flat_ref = jax.tree.leaves(g_ref)
    assert len(flat_pp) == len(flat_ref)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_pp_blocks_sharded_on_stage_axis(setup):
    mesh, params, sharded, tokens = setup
    wq = sharded["blocks"]["wq"]
    # 4 layers over 4 stages: each device holds exactly 1 layer's chunk
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    assert shard_shapes == {(1,) + params["blocks"]["wq"].shape[1:]}
    assert len(wq.addressable_shards) >= N_STAGES
    # replicated embed: every shard holds the full table
    emb_shapes = {s.data.shape
                  for s in sharded["embed"].addressable_shards}
    assert emb_shapes == {params["embed"].shape}


def test_pp_training_tracks_single_device(setup):
    mesh, params, sharded, tokens = setup
    tx = optax.sgd(1e-2)
    step_pp = make_pp_train_step(CFG, tx, mesh, N_MICRO)

    def ref_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(_ref_loss)(params, tokens)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p_pp = jax.tree.map(jnp.copy, sharded)
    o_pp = jax.jit(tx.init)(p_pp)
    p_ref = jax.tree.map(jnp.copy, params)
    o_ref = tx.init(p_ref)
    losses_pp, losses_ref = [], []
    for _ in range(3):
        p_pp, o_pp, l_pp = step_pp(p_pp, o_pp, tokens)
        p_ref, o_ref, l_ref = ref_step(p_ref, o_ref, tokens)
        losses_pp.append(float(l_pp))
        losses_ref.append(float(l_ref))
    np.testing.assert_allclose(losses_pp, losses_ref, rtol=1e-4)
    assert losses_pp[-1] < losses_pp[0]  # it actually learns


def test_pp_stage_layers_divisibility():
    assert pp_stage_layers(CFG, 4) == 1
    assert pp_stage_layers(CFG, 2) == 2
    with pytest.raises(ValueError, match="not divisible"):
        pp_stage_layers(CFG, 3)


def test_pp_specs_cover_all_params():
    params = init_params(CFG, seed=0)
    specs = pp_param_specs(CFG)
    # every param leaf has a spec (tree structures align)
    jax.tree.map(lambda p, s: None, params,
                 jax.tree.map(lambda x: x, specs,
                              is_leaf=lambda x: hasattr(x, "index")))


def test_train_model_cli_pp_smoke(tmp_path):
    """scripts/train_model.py --pp 2: the CLI path trains a dv-mini on
    the virtual mesh and writes a loadable checkpoint."""
    import os
    import subprocess
    import sys

    corpus = tmp_path / "c.txt"
    corpus.write_text("访谈问答示例，流程与预算。\n" * 400, encoding="utf-8")
    out = tmp_path / "pp.npz"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys; sys.argv = ['train_model.py',"
        "'--model','dv-mini','--tokenizer',"
        "'resources/tokenizer/dv_bpe_8k.json',"
        f"'--corpus', r'{corpus}', '--out', r'{out}',"
        "'--steps','2','--batch','4','--seq','64','--pp','2',"
        "'--pp-micro','2','--log-every','1','--save-every','100',"
        "'--val-frac','0.2'];"
        "runpy.run_path('scripts/train_model.py', run_name='__main__')"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=900, cwd=os.getcwd())
    assert r.returncode == 0, (r.stdout[-500:], r.stderr[-1500:])
    assert "pipeline parallel: 2 stages" in r.stdout
    assert out.exists()
    from deepvision_tpu.engine.weights import load_npz

    params = load_npz(str(out))
    assert params["blocks"]["wq"].shape[0] == 6  # full stack re-gathered
