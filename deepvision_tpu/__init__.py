"""deepvision_tpu — TPU-native rebuild of DeepVision.

A from-scratch framework with two halves:

* ``deepvision_tpu.engine`` — an in-house JAX/XLA/Pallas LLM serving engine
  (paged KV cache, Pallas flash/paged attention, continuous batching with
  priority lanes, pjit/shard_map tensor parallelism over an ICI mesh).  This
  replaces the reference's remote Anthropic-compatible gateway layer
  (reference web/server.py:15164-15640, call_claude at web/server.py:26860).
* ``deepvision_tpu.web`` — the requirements-interview application (sessions,
  interview runtime, report draft→review pipeline, solution pages, exports,
  auth/license/admin) re-implemented on a stdlib WSGI micro-framework with an
  HTTP API compatible with the reference's ``/api/**`` surface.
"""

from deepvision_tpu.version import __version__

__all__ = ["__version__"]
