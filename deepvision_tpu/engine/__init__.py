"""In-house TPU LLM serving engine.

Replaces the reference's remote-gateway AI layer (its "L2": lane resolution,
client init, priority scheduler, circuit breaker, call_claude — reference
web/server.py:2033-2407, :4499, :14985-15148, :26860) with a local JAX engine:

* :mod:`deepvision_tpu.engine.config`    — model architecture configs/presets
* :mod:`deepvision_tpu.engine.model`     — pure-JAX decoder-only transformer
* :mod:`deepvision_tpu.engine.kv_cache`  — paged KV cache + page allocator
* :mod:`deepvision_tpu.engine.kernels`   — Pallas flash/paged attention
* :mod:`deepvision_tpu.engine.parallel`  — mesh + shardings (TP over ICI)
* :mod:`deepvision_tpu.engine.sampling`  — temperature/top-k/top-p sampling
* :mod:`deepvision_tpu.engine.scheduler` — continuous-batching scheduler
* :mod:`deepvision_tpu.engine.runner`    — jitted prefill/decode step functions
* :mod:`deepvision_tpu.engine.engine`    — LLMEngine front door (threads/queues)
* :mod:`deepvision_tpu.engine.lanes`     — generation profiles ("lanes")
* :mod:`deepvision_tpu.engine.client`    — call_model() facade (call_claude parity)
"""
