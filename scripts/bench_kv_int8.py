#!/usr/bin/env python
"""On-chip A/B: int8 KV pages vs bf16 KV on the dv-1b raw decode path.

Measures ms/token-step via runner.decode (no scheduler, no admission —
the same harness as the round-3 K-sweep in PERF_NOTES) for the decode
configurations that matter:

  bf16 weights + bf16 KV      (round-3 baseline)
  int8 weights + bf16 KV      (round-3 shipped lever)
  int8 weights + int8 KV      (round-4 lever under test)
  int8 weights + int8 KV @128-token pages (deployment-tuned)

Each config runs in its own engine instance but one process (ONE TPU
process at a time); 20 synced calls per K point after 3 warmup calls.

Usage: python scripts/bench_kv_int8.py [--ks 8,16,32] [--ctx 600] [--b 8]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_config(name, quantize, kv_quantize, page_size, ks, ctx, B,
               n_calls=20):
    import numpy as np

    from deepvision_tpu.engine.engine import EngineConfig, LLMEngine
    from deepvision_tpu.engine.kv_cache import pages_needed

    eng = LLMEngine(EngineConfig(
        model="dv-1b", tokenizer="byte", max_slots=B,
        num_pages=1024, page_size=page_size,
        max_pages_per_seq=max(8, 2048 // page_size),
        chunked_prefill=True, warmup=False,
        quantize=quantize, kv_quantize=kv_quantize,
    ))
    runner, alloc = eng.runner, eng.allocator
    MP = eng.cache_cfg.max_pages_per_seq

    # fill B sequences to ctx tokens via prefill
    prompt = list(np.random.default_rng(0).integers(1, 250, size=ctx))
    seqs = []
    for b in range(B):
        pages = alloc.alloc(pages_needed(ctx + 600, page_size))
        runner.prefill(prompt, pages)
        seqs.append(pages)
    bt = np.zeros((B, MP), np.int32)
    for b, pages in enumerate(seqs):
        bt[b, : len(pages)] = pages

    out = {"config": name, "ctx": ctx, "B": B}
    lens = np.full(B, ctx + 1, np.int32)
    toks = np.ones(B, np.int32)
    temps = np.zeros(B, np.float32)
    topk = np.zeros(B, np.int32)
    topp = np.ones(B, np.float32)
    for K in ks:
        # warmup (compile + cache)
        for _ in range(3):
            np.asarray(runner.decode(toks, lens, bt, temps, topk, topp,
                                     n_steps=K))
        times = []
        cur = lens.copy()
        for _ in range(n_calls):
            t0 = time.perf_counter()
            np.asarray(runner.decode(toks, cur, bt, temps, topk, topp,
                                     n_steps=K))
            times.append(time.perf_counter() - t0)
            cur = cur + K
            if cur[0] + K >= MP * page_size:
                cur = lens.copy()
        times.sort()
        p50_call = times[len(times) // 2]
        out[f"K{K}_ms_per_call"] = round(p50_call * 1e3, 2)
        out[f"K{K}_ms_per_step"] = round(p50_call * 1e3 / K, 2)
    eng.shutdown()
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="8,16,32")
    ap.add_argument("--ctx", type=int, default=600)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--configs", default="bf16,int8,int8kv,int8kv128")
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    specs = {
        "bf16": ("", "", 64),
        "int8": ("int8", "", 64),
        "int8kv": ("int8", "int8", 64),
        "int8kv128": ("int8", "int8", 128),
        "bf16kv128": ("", "", 128),
        "kvonly": ("", "int8", 64),
    }
    for name in args.configs.split(","):
        quantize, kv_quantize, page = specs[name]
        run_config(name, quantize, kv_quantize, page, ks, args.ctx, args.b)
    return 0


if __name__ == "__main__":
    sys.exit(main())
