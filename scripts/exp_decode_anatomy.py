#!/usr/bin/env python
"""Decode-step anatomy by PROGRAM ABLATION (VERDICT r4 #3).

The in-jit microbench route (exp_round5_perf.py --section decode) over-
measures: page pools in a fori_loop carry defeat the kernel's aliasing
and the copies dwarf the term being measured (terms_sum 31.9 ms vs a
5.9 ms/step end-to-end fit).  Here every term comes from the SAME
instrument instead: the real K=32 fused decode scan with one piece
removed, timed exactly like the baseline, each as a 2-point K sweep so
per-call dispatch cancels.

  full      — the production program (runner._build_decode)
  nosample  — constrained sampling replaced by argmax
  nologits  — final-norm + logits matmul also removed (token fed back
              constant; layers+embed only)
  noattn    — layer attention kernel replaced by identity (matmuls,
              norms, MLP, embed only; KV write also gone)
  halfdepth — nologits at 8 of 16 layers (per-layer slope check)

ms/step(term) = fit(full) - fit(variant) attributes: sampling, logits,
attention kernel (incl. KV write), per-layer math.  Terms must sum to
fit(full) within noise or the residual is reported honestly.

Usage: python scripts/exp_decode_anatomy.py [--ctx 600] [--model dv-1b]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXP_REPS = int(os.environ.get("DV_EXP_REPS", "9"))


def _median(fn, n=None, warmup=3):
    if n is None:
        n = EXP_REPS
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def build_variant(runner, cfg, n_steps, *, sample=True, logits=True,
                  attn=True, n_layers=None):
    """A decode-scan program with pieces removed; mirrors
    runner._build_decode (engine/runner.py) piece for piece."""
    import jax
    import jax.numpy as jnp

    from deepvision_tpu.engine import model as model_lib
    from deepvision_tpu.engine.kernels.paged_attention import (
        paged_attention_update,
    )
    from deepvision_tpu.engine.sampling import sample_tokens_constrained

    L = n_layers if n_layers is not None else cfg.n_layers

    def fwd(params, cache, tokens, seq_lens, block_tables):
        B = tokens.shape[0]
        x = model_lib._embed(params, tokens, None, False)
        if cfg.scale_embeddings:
            x = x * jnp.asarray(cfg.d_model ** 0.5, dtype=x.dtype)
        positions = (seq_lens - 1).astype(jnp.int32)
        k_list = list(cache["k"])
        v_list = list(cache["v"])
        for li in range(L):
            blk = jax.tree.map(lambda a: a[li], params["blocks"])
            h = model_lib.rms_norm(x, blk["ln1"], cfg.rms_eps)
            q, k, v = model_lib._qkv_proj(h, blk, cfg)
            nh = q.shape[-1] // cfg.head_dim
            nkv = k.shape[-1] // cfg.head_dim
            q = q.reshape(B, nh, cfg.head_dim)
            k = k.reshape(B, nkv, cfg.head_dim)
            v = v.reshape(B, nkv, cfg.head_dim)
            q = model_lib.apply_rope(q, positions, cfg.rope_theta)
            k = model_lib.apply_rope(k, positions, cfg.rope_theta)
            if attn:
                ksc, vsc = model_lib._kv_scales(cache, li)
                a_, k_list[li], v_list[li] = paged_attention_update(
                    q, k, v, k_list[li], v_list[li], block_tables,
                    seq_lens, k_scale=ksc, v_scale=vsc, interpret=None)
                a_ = a_.reshape(B, nh * cfg.head_dim)
            else:
                a_ = (q + 0 * k.sum() + 0 * v.sum()).reshape(
                    B, nh * cfg.head_dim)
            o = model_lib.qdot(a_, blk["wo"],
                               preferred_element_type=jnp.float32)
            x = x + o.astype(x.dtype)
            h2 = model_lib.rms_norm(x, blk["ln2"], cfg.rms_eps)
            x = x + model_lib._mlp(h2, blk, None)
        if logits:
            x = model_lib.rms_norm(x, params["final_norm"], cfg.rms_eps)
            lg = model_lib._logits(x, params, cfg, None, False)
        else:
            lg = None
        live = x[:, 0].astype(jnp.float32)
        return (lg, live), dict(cache, k=tuple(k_list), v=tuple(v_list))

    def step(params, cache, tokens, seq_lens, bt, rng, temp, topk, topp,
             dstates, buds, ddist, dfa):
        def body(carry, rng_step):
            toks, lens, states, rem, cache = carry
            (lg, live), cache = fwd(params, cache, toks, lens, bt)
            if lg is None:
                new, nstates = toks, states
            elif sample:
                new, nstates = sample_tokens_constrained(
                    lg, rng_step, temp, topk, topp, states, dfa,
                    budgets=rem, dfa_dist=ddist)
            else:
                new = jax.numpy.argmax(lg, axis=-1).astype(toks.dtype)
                nstates = states
            # `live` (a slice of the final hidden state) rides the scan
            # output so variants that drop logits/cache writes cannot be
            # dead-code-eliminated whole (observed: noattn at 0.35 ms —
            # the entire layer stack pruned)
            return (new, lens + 1, nstates, rem - 1, cache), (new, live)

        rngs = jax.random.split(rng, n_steps)
        (lt, _, _, _, cache), (out, lives) = jax.lax.scan(
            body, (tokens, seq_lens, dstates, buds, cache), rngs)
        return (out, lives), cache

    return jax.jit(step, donate_argnums=(1,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=600)
    ap.add_argument("--model", default="dv-1b")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepvision_tpu.engine.kv_cache import pages_needed
    from scripts.exp_round5_perf import _dispatch_ms, _mk_engine, _prompt

    B = 8
    eng = _mk_engine(args.model)
    runner, alloc, cfg = eng.runner, eng.allocator, eng.model_cfg
    MP = eng.cache_cfg.max_pages_per_seq
    out = {"section": "decode_anatomy", "B": B, "ctx": args.ctx,
           "dispatch_ms": round(_dispatch_ms(), 2)}

    prompt = _prompt(args.ctx)
    bt = np.zeros((B, MP), np.int32)
    for b in range(B):
        pages = alloc.alloc(pages_needed(args.ctx + 900, 128))
        runner.prefill(prompt, pages)
        bt[b, : len(pages)] = pages

    lens0 = np.full(B, args.ctx + 1, np.int32)
    toks = jnp.ones(B, jnp.int32)
    temp = jnp.full(B, 0.7, jnp.float32)
    topk = jnp.full(B, 40, jnp.int32)
    topp = jnp.ones(B, jnp.float32)
    st0 = jnp.zeros(B, jnp.int32)
    buds = jnp.full(B, 1 << 20, jnp.int32)
    jbt = jnp.asarray(bt)

    variants = {
        "full": dict(),
        "nosample": dict(sample=False),
        "nologits": dict(sample=False, logits=False),
        "noattn": dict(sample=False, logits=False, attn=False),
        "halfdepth": dict(sample=False, logits=False,
                          n_layers=cfg.n_layers // 2),
    }
    fits = {}
    for name, kw in variants.items():
        per_call = {}
        for K in (8, 32):
            fn = build_variant(runner, cfg, K, **kw)
            state = {"cache": runner.cache, "lens": lens0.copy()}

            def call():
                (o, lv), state["cache"] = fn(
                    runner.params, state["cache"], toks,
                    jnp.asarray(state["lens"]), jbt,
                    runner.next_rng(), temp, topk, topp, st0, buds,
                    runner._dfa_dist, runner._dfa_table)
                np.asarray(o), np.asarray(lv)
                state["lens"] = state["lens"] + K
                if state["lens"][0] + K >= MP * 128:
                    state["lens"] = lens0.copy()

            per_call[K] = _median(call)
            runner.cache = state["cache"]  # keep the donated chain valid
        fit = (per_call[32] - per_call[8]) / 24.0
        fits[name] = fit
        out[f"{name}_ms_per_step"] = round(fit, 3)
        out[f"{name}_call_K8"] = round(per_call[8], 2)
        out[f"{name}_call_K32"] = round(per_call[32], 2)
        print(json.dumps({name: out[f"{name}_ms_per_step"]}), flush=True)

    L = cfg.n_layers
    anatomy = {
        "sampling_ms": fits["full"] - fits["nosample"],
        "logits_ms": fits["nosample"] - fits["nologits"],
        "attn_kernel_ms_total": fits["nologits"] - fits["noattn"],
        "layer_math_ms_total": fits["noattn"],  # embed rides here (~0)
        "per_layer_ms_from_slope": (fits["nologits"] - fits["halfdepth"])
        / (L - L // 2),
    }
    out["anatomy"] = {k: round(v, 3) for k, v in anatomy.items()}
    out["terms_sum_ms"] = round(
        anatomy["sampling_ms"] + anatomy["logits_ms"]
        + anatomy["attn_kernel_ms_total"]
        + anatomy["layer_math_ms_total"], 3)
    out["vs_full_fit_ms"] = round(fits["full"], 3)
    eng.shutdown()
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
