"""Test bootstrap: force the JAX CPU backend with 8 virtual devices.

The reference runs its suite with ENABLE_AI=False and a stubbed config module
(reference tests/test_api_comprehensive.py:23-68); our equivalent isolation is a
CPU-only JAX runtime (so kernels run in interpret mode) plus a virtual 8-device
mesh for multi-chip sharding tests, per the driver's
``xla_force_host_platform_device_count`` contract.

This module MUST set the environment before anything imports jax.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("DEEPVISION_TPU_TESTING", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Some environments pin JAX_PLATFORMS through a site hook before conftest
# runs; the config update below wins regardless.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
