#!/usr/bin/env python
"""Headline benchmark: p50 next-question TTFT through the TPU engine.

Drives the real serving stack (tokenizer -> gateway-style request ->
continuous-batching scheduler -> Pallas prefill/decode on device) with a
question-lane workload shaped like the reference's next-question path
(~2.2k-char prompt budget, web/config.py:109; ~120-token completions).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus extra
diagnostic fields.  Baseline is the build target p50 TTFT = 1500 ms on a
v5e chip (BASELINE.md build targets); vs_baseline > 1 means faster than
target.
"""

import json
import statistics
import sys
import threading
import time


def main():
    import jax

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

    if on_tpu:
        eng_cfg = EngineConfig(
            model="dv-1b",
            tokenizer="byte",
            # 8 slots + K=8 is the measured sweet spot for p50 TTFT on one
            # chip (16 slots trades ~50% worse p50 for +7% req/min — see
            # PERF_NOTES.md).
            max_slots=8,
            num_pages=1024,
            page_size=64,
            max_pages_per_seq=32,
            max_pending=128,
            prefills_per_step=2,
            decode_steps_per_call=8,
            chunked_prefill=True,
            prefill_chunk_size=256,
            interpret=False,
        )
        n_sessions, n_threads, max_tokens = 16, 8, 120
    else:  # CI / smoke fallback on CPU
        eng_cfg = EngineConfig(
            model="dv-tiny-test",
            tokenizer="byte",
            max_slots=4,
            num_pages=128,
            page_size=16,
            max_pages_per_seq=8,
            interpret=True,
        )
        n_sessions, n_threads, max_tokens = 2, 2, 8

    engine = LLMEngine(eng_cfg)
    engine.start()

    prompt = (
        "你是需求访谈助手。基于以下访谈场景与历史问答，生成下一个访谈问题，"
        "输出 JSON，字段包括 question/options/answer_mode/evidence_intent。\n"
        "场景：企业客户关系管理系统的需求调研。维度：客户需求。\n"
        + "历史问答：" + ("问：当前流程的主要痛点？答：跨部门协作效率低，"
        "数据分散，报表手工汇总耗时。" * 12)
    )  # ~1.7k byte tokens — inside the 2048 context so the session's
    # prompt head stays prefix-cacheable (left-truncation breaks alignment)

    # Warm-up: compile the prefill bucket + decode step once.
    t0 = time.time()
    engine.generate_text(prompt, max_tokens=4, temperature=0.0, timeout=600)
    compile_s = time.time() - t0

    ttfts, totals = [], []
    lock = threading.Lock()
    errors = []

    def worker(i):
        """One interview session asking two consecutive questions — the
        app's real shape: the first prefill is cold, the follow-up reuses
        the session's KV prefix (reference sessions re-send a shared
        prompt head every next-question call)."""
        try:
            for round_no in (1, 2):
                t_submit = time.time()
                _, meta = engine.generate_text(
                    prompt + f"\n会话:{i} 第{round_no}个问题，请结合历史生成。",
                    max_tokens=max_tokens,
                    temperature=0.7,
                    top_k=40,
                    timeout=600,
                    prefix_key=f"bench-sess-{i}",
                )
                with lock:
                    ttfts.append(
                        meta["queue_wait_ms"] + meta["prefill_ms"]
                    )
                    totals.append((time.time() - t_submit) * 1e3)
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(f"{type(e).__name__}: {e}")

    t_bench = time.time()
    threads = []
    for i in range(n_sessions):
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        threads.append(t)
        if len(threads) >= n_threads:
            threads.pop(0).join()
    for t in threads:
        t.join()
    wall_s = time.time() - t_bench

    stats = engine.stats()
    engine.shutdown()

    if not ttfts:
        print(json.dumps({
            "metric": "next_question_ttft_p50",
            "value": -1,
            "unit": "ms",
            "vs_baseline": 0.0,
            "error": errors[:3],
        }))
        return 1

    p50 = statistics.median(ttfts)
    p95 = sorted(ttfts)[int(0.95 * (len(ttfts) - 1))]
    tok_s = stats["tokens_generated"] / wall_s if wall_s > 0 else 0.0
    req_min = len(ttfts) / wall_s * 60.0

    print(json.dumps({
        "metric": "next_question_ttft_p50",
        "value": round(p50, 1),
        "unit": "ms",
        "vs_baseline": round(1500.0 / p50, 3) if p50 > 0 else 0.0,
        "backend": backend,
        "model": eng_cfg.model,
        "ttft_p95_ms": round(p95, 1),
        "request_total_p50_ms": round(statistics.median(totals), 1),
        "decode_tokens_per_s": round(tok_s, 1),
        "requests_per_min": round(req_min, 1),
        "n_requests": len(ttfts),
        "errors": len(errors),
        "compile_s": round(compile_s, 1),
        "prefix_cache": stats.get("prefix_cache"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
