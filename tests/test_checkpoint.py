"""Orbax checkpoint round-trip for engine params."""

import os
import tempfile

import jax
import numpy as np

from deepvision_tpu.engine.config import TINY_TEST
from deepvision_tpu.engine.weights import (
    init_params,
    load_checkpoint,
    load_or_init,
    save_checkpoint,
)


def test_checkpoint_roundtrip():
    params = init_params(TINY_TEST, seed=3)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ckpt")
        save_checkpoint(path, params)
        template = jax.eval_shape(lambda: init_params(TINY_TEST, seed=3))
        restored = load_checkpoint(path, template)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_or_init_falls_back_to_random():
    params = load_or_init(TINY_TEST, checkpoint_dir=None, seed=1)
    assert params["embed"].shape[0] == TINY_TEST.vocab_size


def test_load_or_init_restores_when_present():
    params = init_params(TINY_TEST, seed=5)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ckpt")
        save_checkpoint(path, params)
        restored = load_or_init(TINY_TEST, checkpoint_dir=path, seed=999)
        np.testing.assert_array_equal(
            np.asarray(restored["embed"]), np.asarray(params["embed"])
        )
