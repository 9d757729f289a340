"""Parameter initialization and checkpoint I/O (orbax).

The reference never stores model weights (inference was remote).  Here
weights are first-class: random init for smoke/bench runs, orbax
checkpoints for real deployments (SURVEY.md §5.4's "TPU equivalent =
orbax-style weight loading").
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

from deepvision_tpu.engine.config import ModelConfig


def init_params(
    cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16
) -> dict:
    """Random-init a parameter pytree with stacked layer leaves."""
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 16)
    D, F, HD = cfg.d_model, cfg.d_ff, cfg.head_dim
    H, KV, L, V = cfg.n_heads, cfg.n_kv_heads, cfg.n_layers, cfg.vocab_size

    def norm(k, shape, fan_in):
        scale = 1.0 / math.sqrt(fan_in)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params = {
        "embed": norm(keys[0], (V, D), D),
        "final_norm": jnp.zeros((D,), dtype),
        "blocks": {
            "ln1": jnp.zeros((L, D), dtype),
            "ln2": jnp.zeros((L, D), dtype),
            "wq": norm(keys[1], (L, D, H * HD), D),
            "wk": norm(keys[2], (L, D, KV * HD), D),
            "wv": norm(keys[3], (L, D, KV * HD), D),
            "wo": norm(keys[4], (L, H * HD, D), H * HD),
            "w_gate": norm(keys[5], (L, D, F), D),
            "w_up": norm(keys[6], (L, D, F), D),
            "w_down": norm(keys[7], (L, F, D), F),
        },
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = norm(keys[8], (D, V), D)
    return params


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def param_bytes(params) -> int:
    return sum(int(x.size) * x.dtype.itemsize for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Orbax checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_checkpoint(path: str, template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, template)
        return ckptr.restore(path)


# ---------------------------------------------------------------------------
# Flat .npz checkpoints — single-file, committable artifacts (bf16)
# ---------------------------------------------------------------------------

def save_npz(path: str, params) -> None:
    import numpy as np

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            getattr(k, "key", getattr(k, "idx", "?")) for k in keypath
        )
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            # npz has no bf16: store the raw uint16 bits + a dtype tag
            flat[name + "@bf16"] = arr.view(np.uint16)
        else:
            flat[name] = arr
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    import io

    buf = io.BytesIO()
    np.savez(buf, **flat)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def load_npz(path: str) -> dict:
    import numpy as np

    data = np.load(path)
    params: dict = {}
    for name in data.files:
        arr = data[name]
        key = name
        if name.endswith("@bf16"):
            key = name[: -len("@bf16")]
            arr = arr.view(jnp.bfloat16)
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return params


def load_or_init(
    cfg: ModelConfig, checkpoint_dir: Optional[str], seed: int = 0
):
    """Engine boot path: restore a checkpoint if configured, else random.

    ``checkpoint_dir`` may be an orbax directory or a flat ``.npz`` file.
    """
    if checkpoint_dir and os.path.isfile(checkpoint_dir) and \
            checkpoint_dir.endswith(".npz"):
        return load_npz(checkpoint_dir)
    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        template = jax.eval_shape(lambda: init_params(cfg, seed))
        return load_checkpoint(checkpoint_dir, template)
    return init_params(cfg, seed)
