#!/usr/bin/env python
"""Round-5 on-chip experiments: prefill MFU levers + decode step anatomy.

VERDICT r4 next-round #2 and #3.  One TPU process, two sections:

  --section prefill   A/B the levers that set prefill MFU at the app's
                      [B, ~600, D] shapes on dv-1b int8:
                        - chunked prefill, sync-per-chunk (round-4 path)
                        - chunked prefill, ONE sync (async intermediate
                          chunks — runner change under test)
                        - chunk size 256 vs 512
                        - classic single-dispatch bucket prefill (1024)
                        - batched admission prefill (B=4, bucket 1024/768)
                        - projection fusion at prefill shapes (fuse.py was
                          only ever A/B'd on decode's [8, D] matmuls)
  --section decode    decompose ms/step into MEASURED terms:
                        - per-call dispatch overhead (K sweep: t = a + bK)
                        - per-layer paged-attention kernel (in-jit loop)
                        - per-layer matmul+elementwise chain (in-jit loop)
                        - final-norm + logits matmul        (in-jit loop)
                        - embed + constrained sampling      (in-jit loop)
                      The in-jit fori_loop(32) amortizes dispatch so each
                      term is pure device time; the table must SUM to the
                      K-sweep per-step slope or the residual is reported.

Numbers go to PERF_NOTES.md; the winning configs become engine defaults.
Usage: python scripts/exp_round5_perf.py [--section all] [--ctx 600]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_FLOPS = 197e12
# smoke-test knobs (CPU interpret mode): shrink loop/rep counts
EXP_N = int(os.environ.get("DV_EXP_N", "32"))
EXP_REPS = int(os.environ.get("DV_EXP_REPS", "5"))


def _median_call(fn, n=None, warmup=2):
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
    return ts[len(ts) // 2] * 1e3  # ms


def _dispatch_ms():
    """Per-call host-synced dispatch latency of a trivial op."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.bfloat16)
    return _median_call(lambda: np.asarray(f(x)), n=10, warmup=3)


def _mk_engine(model="dv-1b", fuse=False, chunk=256, pages=1024):
    # shapes mirror bench.py's int8 section exactly so the persistent
    # compile cache from prior bench runs is hit wherever possible
    from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

    return LLMEngine(EngineConfig(
        model=model, tokenizer="byte", max_slots=8,
        num_pages=pages, page_size=128, max_pages_per_seq=16,
        chunked_prefill=True, prefill_chunk_size=chunk, warmup=False,
        quantize="int8", kv_quantize="int8",
        fuse_projections=fuse,
    ))


def _prompt(ctx, seed=0):
    import numpy as np

    return list(np.random.default_rng(seed).integers(1, 250, size=ctx))


def section_prefill(ctx, model="dv-1b"):
    import numpy as np

    from bench import _model_param_count
    from deepvision_tpu.engine.config import get_model_config
    from deepvision_tpu.engine.kv_cache import pages_needed

    n_params = _model_param_count(get_model_config(model))
    flops_1 = 2.0 * n_params * ctx

    out = {"section": "prefill", "ctx": ctx,
           "dispatch_ms": round(_dispatch_ms(), 2)}
    eng = _mk_engine(model)
    runner, alloc = eng.runner, eng.allocator
    need = pages_needed(ctx + 128, 128)

    def run_chunked(sync_each, seed):
        toks = _prompt(ctx, seed)
        pages = alloc.alloc(need)
        C = runner.prefill_chunk_size
        n = len(toks)
        if sync_each:
            for start in range(0, n, C):
                runner.prefill_chunk_step(toks, pages, start, sync=True)
        else:
            runner.prefill(toks, pages)  # one-sync path (runner change)
        alloc.free(pages)

    seeds = iter(range(10_000))

    def mfu(ms, nseq=1):
        return round(flops_1 * nseq / (ms / 1e3) / V5E_BF16_FLOPS, 3)

    ms = _median_call(lambda: run_chunked(True, next(seeds)))
    out["chunked_sync_each_ms"] = round(ms, 1)
    out["chunked_sync_each_mfu"] = mfu(ms)

    ms = _median_call(lambda: run_chunked(False, next(seeds)))
    out["chunked_one_sync_ms"] = round(ms, 1)
    out["chunked_one_sync_mfu"] = mfu(ms)

    # chunk size 512: rebuild the (single) chunk program
    runner.prefill_chunk_size, runner._prefill_chunk_fn = 512, None
    ms = _median_call(lambda: run_chunked(False, next(seeds)))
    out["chunked_512_one_sync_ms"] = round(ms, 1)
    out["chunked_512_one_sync_mfu"] = mfu(ms)
    runner.prefill_chunk_size, runner._prefill_chunk_fn = 256, None

    # classic bucket prefill: one dispatch, padded to 1024
    runner.chunked_prefill = False

    def run_classic(seed):
        pages = alloc.alloc(need)
        runner.prefill(_prompt(ctx, seed), pages)
        alloc.free(pages)

    ms = _median_call(lambda: run_classic(next(seeds)))
    out["classic_1024_ms"] = round(ms, 1)
    out["classic_1024_mfu"] = mfu(ms)
    # flash block-size sweep at the same shape (kernel-level lever):
    # bigger q/k blocks = fewer grid programs + larger MXU contractions
    import deepvision_tpu.engine.model as _m
    for bq, bk in ((256, 256), (256, 512), (512, 512)):
        os.environ["DV_FLASH_BLK_Q"] = str(bq)
        os.environ["DV_FLASH_BLK_K"] = str(bk)
        runner._prefill_fns.clear()
        ms = _median_call(lambda: run_classic(next(seeds)))
        out[f"classic_1024_blk{bq}x{bk}_ms"] = round(ms, 1)
        out[f"classic_1024_blk{bq}x{bk}_mfu"] = mfu(ms)
    os.environ.pop("DV_FLASH_BLK_Q", None)
    os.environ.pop("DV_FLASH_BLK_K", None)
    runner._prefill_fns.clear()
    runner.chunked_prefill = True

    # batched admission prefill at B in {2, 4}, canonical bucket 1024
    def run_batch(B, seed):
        prompts = [_prompt(ctx, seed * 100 + i) for i in range(B)]
        pagess = [alloc.alloc(need) for _ in range(B)]
        runner.prefill_batch(prompts, pagess)
        for p in pagess:
            alloc.free(p)

    for B in (2, 4):
        ms = _median_call(lambda: run_batch(B, next(seeds)))
        out[f"batch{B}_1024_ms"] = round(ms, 1)
        out[f"batch{B}_1024_mfu"] = mfu(ms, B)
        out[f"batch{B}_1024_ms_per_seq"] = round(ms / B, 1)

    # a 768 bucket would pad the app's ~700-token prompts 1.10x instead
    # of 1.46x — worth one more boot executable?
    runner.batch_buckets = (768,)
    ms = _median_call(lambda: run_batch(4, next(seeds)))
    out["batch4_768_ms"] = round(ms, 1)
    out["batch4_768_mfu"] = mfu(ms, 4)
    runner.batch_buckets = (256, 512, 1024, 2048)
    # the app/bench prompt is ~1800 BYTE tokens (CJK = 3 bytes/char):
    # batch4 at bucket 2048 is the production admission shape there
    def run_batch_n(B, n_tok, seed):
        prompts = [_prompt(n_tok, seed * 100 + i) for i in range(B)]
        pagess = [alloc.alloc(pages_needed(n_tok + 128, 128))
                  for _ in range(B)]
        runner.prefill_batch(prompts, pagess)
        for p_ in pagess:
            alloc.free(p_)
    ms = _median_call(lambda: run_batch_n(4, 1800, next(seeds)))
    out["batch4_1800tok_2048_ms"] = round(ms, 1)
    out["batch4_1800tok_2048_mfu"] = round(
        2.0 * n_params * 1800 * 4 / (ms / 1e3) / V5E_BF16_FLOPS, 3)
    eng.shutdown()
    print(json.dumps(out), flush=True)

    # projection fusion at prefill shapes (new engine: fused THEN int8)
    eng = _mk_engine(model, fuse=True)
    runner, alloc = eng.runner, eng.allocator
    out2 = {"section": "prefill_fused"}
    ms = _median_call(lambda: run_chunked(False, next(seeds)))
    out2["fused_chunked_one_sync_ms"] = round(ms, 1)
    out2["fused_chunked_one_sync_mfu"] = mfu(ms)
    ms = _median_call(lambda: run_batch(4, next(seeds)))
    out2["fused_batch4_1024_ms"] = round(ms, 1)
    out2["fused_batch4_1024_mfu"] = mfu(ms, 4)
    eng.shutdown()
    print(json.dumps(out2), flush=True)


def section_decode(ctx, model="dv-1b"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepvision_tpu.engine import model as model_lib
    from deepvision_tpu.engine.kernels.paged_attention import (
        paged_attention_update,
    )
    from deepvision_tpu.engine.kv_cache import pages_needed
    from deepvision_tpu.engine.sampling import sample_tokens_constrained

    B = 8
    eng = _mk_engine(model)
    runner, alloc = eng.runner, eng.allocator
    cfg = eng.model_cfg
    MP = eng.cache_cfg.max_pages_per_seq
    out = {"section": "decode", "B": B, "ctx": ctx,
           "dispatch_ms": round(_dispatch_ms(), 2)}

    prompt = _prompt(ctx)
    bt = np.zeros((B, MP), np.int32)
    for b in range(B):
        pages = alloc.alloc(pages_needed(ctx + 900, 128))
        runner.prefill(prompt, pages)
        bt[b, : len(pages)] = pages

    lens = np.full(B, ctx + 1, np.int32)
    toks = np.ones(B, np.int32)
    # the served config: T=0.7 top_k=40 (the bench burst's sampling)
    temps = np.full(B, 0.7, np.float32)
    topk = np.full(B, 40, np.int32)
    topp = np.ones(B, np.float32)

    # K sweep: ms/call = a + b*K  ->  a = dispatch+readback, b = per step
    per_call = {}
    for K in (8, 32):
        cur = lens.copy()

        def call():
            nonlocal cur
            np.asarray(runner.decode(toks, cur, bt, temps, topk, topp,
                                     n_steps=K))
            cur = cur + K
            if cur[0] + K >= MP * 128:
                cur = lens.copy()

        per_call[K] = _median_call(call, n=min(9, EXP_REPS * 2), warmup=3)
    a = (32 * per_call[8] - 8 * per_call[32]) / 24.0
    b = (per_call[32] - per_call[8]) / 24.0
    out["call_ms_K8"] = round(per_call[8], 2)
    out["call_ms_K32"] = round(per_call[32], 2)
    out["fit_call_overhead_ms"] = round(a, 2)
    out["fit_ms_per_step"] = round(b, 2)
    print(json.dumps(out), flush=True)  # partial: K-sweep done

    # ---- per-term in-jit microbenches (fori_loop(32) per call) ------
    N = EXP_N
    disp = _dispatch_ms()
    params, cache = runner.params, runner.cache
    blk0 = jax.tree.map(lambda a_: a_[0], params["blocks"])
    D = cfg.d_model
    HD = cfg.head_dim
    x0 = jnp.zeros((B, D), jnp.bfloat16)

    def timed_loop(jfn, *args):
        ms = _median_call(lambda: np.asarray(jax.block_until_ready(
            jfn(*args))), n=7, warmup=2)
        return (ms - disp) / N

    # (1) paged-attention kernel, one layer, looped N times
    kp, vp = cache["k"][0], cache["v"][0]
    ksc, vsc = model_lib._kv_scales(cache, 0)
    q0 = jnp.zeros((B, cfg.n_heads, HD), jnp.bfloat16)
    kv0 = jnp.zeros((B, cfg.n_kv_heads, HD), jnp.bfloat16)
    jlens = jnp.asarray(lens)
    jbt = jnp.asarray(bt)

    @jax.jit
    def attn_loop(q, kv, kp, vp):
        def body(i, carry):
            kp, vp, acc = carry
            o, kp, vp = paged_attention_update(
                q, kv, kv, kp, vp, jbt, jlens, k_scale=ksc, v_scale=vsc,
                interpret=None)
            return kp, vp, acc + o[0, 0, 0].astype(jnp.float32)

        _, _, acc = jax.lax.fori_loop(
            0, N, body, (kp, vp, jnp.zeros((), jnp.float32)))
        return acc

    out["attn_kernel_ms_per_layer"] = round(
        timed_loop(attn_loop, q0, kv0, kp, vp), 3)
    print(json.dumps({"attn_kernel_ms_per_layer":
                      out["attn_kernel_ms_per_layer"]}), flush=True)

    # (2) per-layer matmuls + elementwise (attention replaced by a
    # zero-cost stub so ONLY projections/MLP/norms are in the loop)
    @jax.jit
    def layer_math_loop(x):
        def body(i, x):
            h = model_lib.rms_norm(x, blk0["ln1"], cfg.rms_eps)
            q, k, v = model_lib._qkv_proj(h, blk0, cfg)
            attn = q  # stub: same [B, H*HD] shape, no attention cost
            o = model_lib.qdot(attn, blk0["wo"],
                               preferred_element_type=jnp.float32)
            x = x + o.astype(x.dtype) + k.sum() * 0 + v.sum() * 0
            h2 = model_lib.rms_norm(x, blk0["ln2"], cfg.rms_eps)
            return x + model_lib._mlp(h2, blk0, None)

        return jax.lax.fori_loop(0, N, body, x)

    out["layer_math_ms_per_layer"] = round(timed_loop(layer_math_loop, x0), 3)
    print(json.dumps({"layer_math_ms_per_layer":
                      out["layer_math_ms_per_layer"]}), flush=True)

    # (3) final norm + logits matmul [B, D] x [D, V]
    @jax.jit
    def logits_loop(x):
        def body(i, acc):
            h = model_lib.rms_norm(x, params["final_norm"], cfg.rms_eps)
            lg = model_lib._logits(h, params, cfg, None, False)
            return acc + lg[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))

    out["logits_ms"] = round(timed_loop(logits_loop, x0), 3)
    print(json.dumps({"logits_ms": out["logits_ms"]}), flush=True)

    # (4) embed + constrained sampling (T=0.7 top_k=40 over [B, V])
    jt = jnp.asarray(temps)
    jk = jnp.asarray(topk)
    jp = jnp.asarray(topp)
    st0 = jnp.zeros(B, jnp.int32)
    buds = jnp.full(B, 1 << 20, jnp.int32)
    lg0 = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    rng = jax.random.PRNGKey(0)

    # dfa table enters as an ARGUMENT: closed over, the [S, V] table is
    # baked into the HLO as a literal and the remote compile helper
    # rejects the oversized request body (HTTP 413, observed)
    @jax.jit
    def sample_loop(lg, rng, dfa_table, dfa_dist):
        def body(i, carry):
            acc, rng = carry
            rng, sub = jax.random.split(rng)
            tok, st = sample_tokens_constrained(
                lg, sub, jt, jk, jp, st0, dfa_table,
                budgets=buds, dfa_dist=dfa_dist)
            e = model_lib._embed(params, tok, None, False)
            return acc + e[0, 0].astype(jnp.float32), rng

        acc, _ = jax.lax.fori_loop(
            0, N, body, (jnp.zeros((), jnp.float32), rng))
        return acc

    out["sample_embed_ms"] = round(timed_loop(
        sample_loop, lg0, rng, runner._dfa_table, runner._dfa_dist), 3)

    L = cfg.n_layers
    total = (L * (out["attn_kernel_ms_per_layer"]
                  + out["layer_math_ms_per_layer"])
             + out["logits_ms"] + out["sample_embed_ms"])
    out["terms_sum_ms"] = round(total, 2)
    out["residual_vs_fit_ms"] = round(b - total, 2)
    eng.shutdown()
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["all", "prefill", "decode"])
    ap.add_argument("--ctx", type=int, default=600)
    ap.add_argument("--model", default="dv-1b")
    args = ap.parse_args()
    if args.section in ("all", "prefill"):
        section_prefill(args.ctx, args.model)
    if args.section in ("all", "decode"):
        section_decode(args.ctx, args.model)
    return 0


if __name__ == "__main__":
    sys.exit(main())
