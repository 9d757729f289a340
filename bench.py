#!/usr/bin/env python
"""Headline benchmark for the TPU serving stack.

Three measured workloads against the REAL flagship checkpoint (the best
in-repo model trained on-TPU by scripts/train_model.py — dv-base 88M,
falling back to dv-mini 21M — BPE tokenizer, grammar-constrained JSON
decoding — the exact production serving path):

1. question lane: 64 concurrent interview sessions x 2 questions each
   (~2.2k-char prompts, ~120-token completions) -> TTFT p50/p95, req/min
   (BASELINE.md build targets: 64 sessions, p50 < 1500 ms);
2. report lane: 16 concurrent 1.5k-token draft generations ->
   reports/min (target >= 20);
3. doc ingest: pages/sec through the from-scratch docx converter.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
diagnostics.  vs_baseline = 1500 ms / p50 TTFT (>1 is faster than target).
"""

import io
import json
import os
import statistics
import sys
import threading
import time
import zipfile


# Prompts render through the SAME canonical builders the app serves
# with (runtime/interview.build_interview_prompt, prompt_formats.
# report_draft_prompt) — a from-scratch checkpoint decodes degenerately
# on out-of-distribution prompt shapes, so a handwritten bench prompt
# measures fiction (round-3 lesson: a trailing "(任务N)" suffix cut
# dv-base drafts from ~900 tokens to ~84).

def question_prompt(i: int, round_no: int, tag: str = "") -> str:
    from deepvision_tpu.web.runtime.interview import build_interview_prompt

    session = {
        "topic": f"企业{tag}客户关系管理系统需求调研（分部{i}）",
        "description": "",
        "summary": "",
        "interview_log": [
            {"question": "当前流程的主要痛点是什么？",
             "answer": "跨部门协作效率低，数据分散，报表手工汇总耗时，"
                       "管理层缺少实时视图。"}
        ] * (8 + round_no),
        "reference_materials": [],
    }
    dim = {"name": "客户需求",
           "key_aspects": ["核心痛点", "期望价值", "使用场景"]}
    return build_interview_prompt(session, dim)


def report_prompt(i: int, n_facts: int = 8) -> str:
    from deepvision_tpu.web.runtime import prompt_formats

    facts = [
        (f"Q{k}", f"关于维度{k}的现状与期望？",
         "存在流程断点，期望自动化，预算与时间窗口受限。")
        for k in range(1, 1 + n_facts)
    ]
    return prompt_formats.report_draft_prompt(
        f"企业客户关系管理系统（事业部{i}）", facts)


def _bench_questions(engine, n_sessions, n_threads, max_tokens,
                     key_prefix="bench-sess", topic_tag=""):
    """Two questions per session under one prefix_key: round 1 prefills
    the shared prompt head cold, round 2 must hit the radix prefix cache
    — the cold/warm TTFT split is reported separately so the prefix
    cache's effect is measured, not assumed (reference prompt cache
    web/server.py:4920-5012)."""
    ttfts, totals, errors = [], [], []
    ttfts_by_round = {1: [], 2: []}
    lock = threading.Lock()

    def worker(i):
        try:
            for round_no in (1, 2):
                t0 = time.time()
                _, meta = engine.generate_text(
                    question_prompt(i, round_no, topic_tag),
                    max_tokens=max_tokens, temperature=0.7, top_k=40,
                    timeout=600, prefix_key=f"{key_prefix}-{i}",
                    json_mode=True,
                )
                with lock:
                    ttft = meta["queue_wait_ms"] + meta["prefill_ms"]
                    ttfts.append(ttft)
                    ttfts_by_round[round_no].append(ttft)
                    totals.append((time.time() - t0) * 1e3)
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(f"{type(e).__name__}: {e}")

    t0 = time.time()
    threads = []
    for i in range(n_sessions):
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        threads.append(t)
        if len(threads) >= n_threads:
            threads.pop(0).join()
    for t in threads:
        t.join()
    wall = time.time() - t0
    return ttfts, totals, errors, wall, ttfts_by_round


def _bench_reports(engine, n_reports, n_threads, max_tokens):
    """Two drafts per report job under one prefix_key: round 1 prefills
    the evidence-pack head cold; round 2 re-drafts with a SLIMMED facts
    list — a strict head-prefix of round 1's prompt, exactly the shape
    the pipeline's degrading-facts retry and profile-regenerate produce
    (report_v3.py draft loop; reference retry loop
    server_modules/report_generation_runtime.py:409-613) — and must hit
    the radix prefix cache.  Round-5 change: report calls previously ran
    keyless, so prefix_cache_report was zero by construction."""
    done, errors = [], []
    prefill_by_round = {1: [], 2: []}
    lock = threading.Lock()

    def worker(i):
        try:
            for round_no, n_facts in ((1, 8), (2, 6)):
                _, meta = engine.generate_text(
                    report_prompt(i, n_facts=n_facts),
                    max_tokens=max_tokens, temperature=0.7, top_k=40,
                    timeout=900, json_mode=True,
                    prefix_key=f"bench-report-{i}",
                )
                with lock:
                    done.append(meta["completion_tokens"])
                    prefill_by_round[round_no].append(meta["prefill_ms"])
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(f"{type(e).__name__}: {e}")

    t0 = time.time()
    threads = []
    for i in range(n_reports):
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        threads.append(t)
        if len(threads) >= n_threads:
            threads.pop(0).join()
    for t in threads:
        t.join()
    wall = time.time() - t0
    return done, errors, wall, prefill_by_round


def _bench_ingest(n_pages=60):
    """Pages/sec through the from-scratch OOXML docx parser (the doc-ingest
    hot path before AI summarization; reference convert_doc.py:73-322)."""
    from deepvision_tpu.web.runtime.documents import convert_to_markdown

    para = (
        "<w:p><w:r><w:t>需求调研参考资料：业务流程现状、系统痛点、预算与"
        "时间约束的详细说明文档内容。</w:t></w:r></w:p>"
    )
    body = (para * 25 + '<w:p><w:r><w:br w:type="page"/></w:r></w:p>') * n_pages
    doc_xml = (
        '<?xml version="1.0"?><w:document xmlns:w="http://schemas.openxml'
        'formats.org/wordprocessingml/2006/main"><w:body>'
        + body + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc_xml)
    data = buf.getvalue()
    t0 = time.time()
    text = convert_to_markdown("bench.docx", data)
    wall = time.time() - t0
    assert len(text) > 1000
    return n_pages / wall if wall > 0 else 0.0


# TPU v5e single-chip peaks (public spec; jax-ml.github.io/scaling-book):
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def _model_param_count(mc) -> int:
    attn = (mc.d_model * mc.n_heads * mc.head_dim
            + 2 * mc.d_model * mc.n_kv_heads * mc.head_dim
            + mc.n_heads * mc.head_dim * mc.d_model)
    mlp = 3 * mc.d_model * mc.d_ff
    embed = mc.vocab_size * mc.d_model * (1 if mc.tie_embeddings else 2)
    return mc.n_layers * (attn + mlp + 2 * mc.d_model) + embed + mc.d_model


def _bench_scale(pipeline, chain, quantize="", kv_quantize="",
                 decode_steps=8, page_size=64):
    """dv-1b scale datum (VERDICT r2 #5): decode ms/token-step and
    prefill latency on the 1.1B-class preset (random weights — this
    measures the serving stack at scale, not model quality), plus
    honest roofline accounting: decode %-of-HBM-roofline and prefill
    MFU against v5e peaks.

    The decode burst runs TWICE: the first pass flushes any program that
    warmup didn't cover (round-3's int8 section compiled inside the
    measured window — its 73 s request wall vs 40 s bf16 was cold XLA,
    not serving; VERDICT weak #4), the second is the steady-state
    record.  Both walls are reported.

    ``quantize``/``kv_quantize``/``decode_steps``/``page_size`` pick the
    measured deployment: the int8 section runs the TUNED config the
    kernel work actually shipped (K=32, page 128, int8 weights + int8 KV
    pages) instead of the default-config stack (VERDICT weak #5)."""
    from deepvision_tpu.engine.config import get_model_config
    from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

    B = 8
    cfg = EngineConfig(
        model="dv-1b", tokenizer="byte", max_slots=B,
        num_pages=1024, page_size=page_size,
        max_pages_per_seq=max(8, 2048 // page_size),
        decode_steps_per_call=decode_steps, pipeline_decode=pipeline,
        max_chained_decodes=chain, chunked_prefill=True,
        prefill_chunk_size=256, interpret=False, warmup=True,
        quantize=quantize, kv_quantize=kv_quantize,
    )
    t0 = time.time()
    eng = LLMEngine(cfg)
    eng.start()
    compile_s = time.time() - t0
    mc = get_model_config("dv-1b")
    n_params = _model_param_count(mc)
    ctx_tokens = 600
    prompt = ("需求访谈背景：" + "流程现状与痛点，预算与排期约束。" * 60)[:ctx_tokens]

    # throwaway request first: any shape not covered by warmup compiles
    # here, so the MEASURED prefill below is runtime, not XLA
    _, _ = eng.generate_text(prompt, max_tokens=8, temperature=0.0,
                             timeout=900)
    _, meta = eng.generate_text(prompt + "。", max_tokens=1,
                                temperature=0.0, timeout=900)
    prefill_ms = meta["prefill_ms"]
    prompt_tokens = meta["prompt_tokens"]

    # Batched admission prefill — the shape that actually serves the
    # TTFT burst: under concurrent arrival the scheduler admits up to
    # prefill_batch_max fresh prompts in ONE runner.prefill_batch
    # dispatch (engine/scheduler.py _admit), so per-sequence dispatch
    # amortizes 4x and the MXU sees [4, bucket, D].  prefill_mfu is
    # computed from THIS path (single-request MFU is dispatch-bound by
    # the ~20-30 ms tunnel round-trip: r5 on-chip A/B measured 0.095
    # single vs 0.342 batch4 on identical weights).
    from deepvision_tpu.engine.kv_cache import pages_needed

    PB = 4
    tok_ids = eng.tokenizer.encode(prompt)
    page = eng.cache_cfg.page_size
    need = pages_needed(len(tok_ids) + page, page)

    def batch_prefill_once(tag):
        prompts = [eng.tokenizer.encode(f"（并发{tag}{i}）" + prompt)
                   for i in range(PB)]
        pagess = [eng.allocator.alloc(need + 1) for _ in range(PB)]
        t = time.time()
        eng.runner.prefill_batch(prompts, pagess)
        dt = time.time() - t
        for p in pagess:
            eng.allocator.free(p)
        return dt, sum(len(p) for p in prompts)

    batch_prefill_once("暖")  # compile/cache-load outside the window
    best_ms, batch_tokens = 1e9, 0
    for i in range(3):
        dt, ntok = batch_prefill_once(i)
        if dt * 1e3 < best_ms:
            best_ms, batch_tokens = dt * 1e3, ntok
    prefill_batch_ms = best_ms

    # decode: B concurrent sequences, 256 tokens each
    errors = []
    lock = threading.Lock()

    def burst(tag):
        done = []

        def worker(i):
            try:
                _, m = eng.generate_text(
                    prompt + f"(任务{tag}{i})", max_tokens=256,
                    temperature=0.7, top_k=40, timeout=900)
                with lock:
                    done.append(m["completion_tokens"])
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")

        s0 = eng.stats()
        t0 = time.time()
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(B)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        s1 = eng.stats()
        steps = s1["decode_steps"] - s0["decode_steps"]
        # pure decode dispatch+readback time (scheduler decode_time_s);
        # wall/steps would blame prefill + admission on the decode step
        decode_s = s1["decode_time_s"] - s0["decode_time_s"]
        return wall, steps, decode_s, sum(done)

    wall_cold, _, _, _ = burst("冷")
    wall, steps, decode_s, tokens = burst("")
    eng.shutdown()
    tok_s = tokens / wall if wall > 0 else 0.0
    step_ms = (decode_s * 1e3 / steps) if steps else -1.0

    # roofline: each decode step streams all params (bf16, or int8+scales
    # under weight-only quantization — embed stays bf16) + the live KV
    # pages for B sequences from HBM (halved again by int8 KV pages)
    if quantize == "int8":
        embed_params = mc.vocab_size * mc.d_model
        param_bytes = (n_params - embed_params) * 1 + embed_params * 2
    else:
        param_bytes = 2 * n_params
    kv_per_tok = mc.kv_bytes_per_token_bf16
    if kv_quantize == "int8":
        kv_per_tok //= 2
    kv_bytes = B * (ctx_tokens + 128) * kv_per_tok
    step_floor_ms = (param_bytes + kv_bytes) / V5E_HBM_BYTES_PER_S * 1e3
    prefill_flops = 2 * n_params * prompt_tokens
    prefill_mfu_single = (prefill_flops / (prefill_ms / 1e3)
                          / V5E_BF16_FLOPS if prefill_ms > 0 else 0.0)
    # headline MFU: the batched admission shape (see batch_prefill_once)
    prefill_mfu = (2 * n_params * batch_tokens / (prefill_batch_ms / 1e3)
                   / V5E_BF16_FLOPS if prefill_batch_ms > 0 else 0.0)
    return {
        "model": "dv-1b" + ("-int8" if quantize == "int8" else ""),
        "config": {"K": decode_steps, "page_size": page_size,
                   "quantize": quantize or "bf16",
                   "kv_quantize": kv_quantize or "bf16"},
        "params_m": round(n_params / 1e6, 1),
        "decode_slots": B,
        "decode_ms_per_step": round(step_ms, 2),
        "decode_tokens_per_s": round(tok_s, 1),
        "request_wall_s": round(wall, 2),
        "request_wall_cold_s": round(wall_cold, 2),
        "decode_hbm_floor_ms": round(step_floor_ms, 2),
        "decode_roofline_frac": round(step_floor_ms / step_ms, 3)
        if step_ms > 0 else 0.0,
        "prefill_ms_600tok": round(prefill_ms, 1),
        "prefill_batch4_ms": round(prefill_batch_ms, 1),
        "prefill_mfu": round(prefill_mfu, 3),
        "prefill_mfu_single": round(prefill_mfu_single, 3),
        "compile_s": round(compile_s, 1),
        "errors": errors[:3],
    }


def main():
    import jax

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # One-time device bring-up (tunnel/remote-helper init) is triggered by
    # the FIRST real device execution and measured 90-500s on the axon
    # tunnel for an IDENTICAL trivial op — it is environment cost, not
    # compilation, so it is measured separately from compile_s.
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    np.asarray(jnp.ones((8, 8), jnp.bfloat16) + 1)
    backend_up_s = time.time() - t0
    # Tunnel-window guard (round-4 run 4 recorded 361 req/min purely from
    # a degraded window — PERF_NOTES tunnel-variance disclosure): a
    # bring-up stall this long predicts inflated per-dispatch RTT for the
    # whole process, so flag the record rather than let it pass as a
    # steady-state number.
    degraded_window = backend_up_s > 120.0
    if degraded_window:
        print(f"# WARNING: backend bring-up took {backend_up_s:.0f}s "
              "(>120s) — degraded tunnel window; treat throughput/TTFT "
              "in this record as a lower bound", file=sys.stderr)

    from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

    # Production lane split (matches the server's "auto" resolution): the
    # TTFT-bound question lane runs the fast model, the report lanes run
    # the big one — the reference's per-lane model architecture
    # (web/config.py:14-46).
    TOK16 = "resources/tokenizer/dv_bpe_16k.json"
    TOK8 = "resources/tokenizer/dv_bpe_8k.json"
    CANDIDATES = {"dv-fast": TOK16, "dv-base": TOK16, "dv-mini": TOK8}

    def resolve(prefs):
        for m in prefs:
            if os.path.isfile(f"resources/checkpoints/{m}.npz"):
                return m, CANDIDATES[m]
        return "dv-1b", "byte"

    fast_model, fast_tok = resolve(("dv-fast", "dv-mini", "dv-base"))
    big_model, big_tok = resolve(("dv-base", "dv-fast", "dv-mini"))

    # default OFF — the controlled A/B measured pipelined decode 6x
    # slower on the tunneled chip (PERF_NOTES round 3); the bench runs
    # what the server defaults run.
    pipeline = os.environ.get("DV_BENCH_PIPELINE", "0") == "1"
    chain = int(os.environ.get("DV_BENCH_CHAIN", "4"))

    if on_tpu:
        q_cfg = EngineConfig(
            model=fast_model,
            tokenizer=fast_tok,
            checkpoint_dir=f"resources/checkpoints/{fast_model}.npz",
            max_slots=32,
            num_pages=3072,
            page_size=64,
            max_pages_per_seq=32,
            max_pending=256,
            prefills_per_step=2,
            prefill_batch_max=4,
            decode_steps_per_call=8,
            pipeline_decode=pipeline,
            max_chained_decodes=chain,
            chunked_prefill=True,
            prefill_chunk_size=256,
            interpret=False,
            warmup=True,
        )
        r_cfg = EngineConfig(
            model=big_model,
            tokenizer=big_tok,
            checkpoint_dir=f"resources/checkpoints/{big_model}.npz",
            max_slots=16,
            num_pages=2048,
            page_size=64,
            max_pages_per_seq=32,
            max_pending=64,
            # K=16 on the throughput-bound report lane: measured
            # 37.5ms/call fixed + 10ms/step -> 12.3 ms/token-step
            decode_steps_per_call=16,
            pipeline_decode=pipeline,
            max_chained_decodes=chain,
            chunked_prefill=True,
            prefill_chunk_size=256,
            interpret=False,
            warmup=True,
        )
        n_sessions, n_threads, q_tokens = 64, 32, 120
        n_reports, r_threads, r_tokens = 16, 16, 1500
    else:  # CI / smoke fallback on CPU
        q_cfg = r_cfg = EngineConfig(
            model="dv-tiny-test", tokenizer="byte", max_slots=4,
            num_pages=128, page_size=16, max_pages_per_seq=8,
            interpret=True,
        )
        n_sessions, n_threads, q_tokens = 2, 2, 8
        n_reports, r_threads, r_tokens = 2, 2, 8

    # Boot both engines CONCURRENTLY: their warmup compiles / cache-loads
    # overlap through the remote helper.  compile_s = time until the
    # QUESTION engine is serving-ready (the server's readiness gate —
    # report-only engines warm in the background, server.py lazy boot);
    # compile_full_s = until every engine is hot.  The report burst below
    # still waits for full warmup so the measured window contains
    # serving, not XLA.
    t0 = time.time()
    engine_q = LLMEngine(q_cfg)
    engine_r = engine_q if r_cfg is q_cfg or r_cfg == q_cfg else (
        LLMEngine(r_cfg))
    t_q = threading.Thread(target=engine_q.start)
    boot_threads = [t_q] + [threading.Thread(target=e.start)
                            for e in ({engine_q, engine_r} - {engine_q})]
    for t in boot_threads:
        t.start()
    t_q.join()
    compile_s = time.time() - t0
    for t in boot_threads:
        t.join()
    compile_full_s = time.time() - t0

    # Unmeasured pre-burst: flush any program the boot warmup did not
    # cover (mixed-size admission batches, json DFA decode) so the
    # measured window contains serving, not XLA — compile cost is
    # reported separately as compile_s (round-3's driver run lost half
    # its req/min to in-window compiles; VERDICT weak #1).
    t0 = time.time()
    # distinct topics AND keys: the radix cache matches by token content,
    # so prewarm prompts must not share heads with measured sessions or
    # the measured "cold" round would hit a cache prewarm seeded
    _bench_questions(engine_q, min(6, n_sessions), min(6, n_threads),
                     min(16, q_tokens), key_prefix="prewarm",
                     topic_tag="预热")
    compile_s += time.time() - t0
    compile_full_s += time.time() - t0

    ttfts, totals, q_errors, q_wall, ttfts_by_round = _bench_questions(
        engine_q, n_sessions, n_threads, q_tokens)
    q_stats = engine_q.stats()
    tokens_q = q_stats["tokens_generated"]

    drafts, r_errors, r_wall, r_prefill_by_round = _bench_reports(
        engine_r, n_reports, r_threads, r_tokens)
    r_stats = engine_r.stats()
    tokens_r = (r_stats["tokens_generated"]
                - (tokens_q if engine_r is engine_q else 0))

    # TPU embed path (engine/embedding.py): the serving params double as
    # the document encoder — semantic-retrieval datum for doc ingest
    doc_embed = None
    try:
        chunk = ("现状为多套异构系统并存，补货决策依赖人工经验，期望统一"
                 "数据口径并实现自动补货建议，同时兼容现有审批流程。")
        chunks = [f"{chunk}（片段{i}）" for i in range(64)]
        if engine_q.embed_texts(chunks[:4]) is not None:  # compile warmup
            t0 = time.time()
            out = engine_q.embed_texts(chunks)
            doc_embed = {
                "chunks_per_s": round(len(chunks) / (time.time() - t0), 1),
                "dim": int(out.shape[1]),
            }
    except Exception:  # noqa: BLE001
        doc_embed = None

    engine_q.shutdown()
    if engine_r is not engine_q:
        engine_r.shutdown()

    try:
        pages_per_s = _bench_ingest()
    except Exception:  # noqa: BLE001
        pages_per_s = -1.0

    scale = scale_int8 = None
    if on_tpu and os.environ.get("DV_BENCH_1B", "1") == "1":
        try:
            scale = _bench_scale(pipeline, chain)
        except Exception as e:  # noqa: BLE001
            scale = {"error": f"{type(e).__name__}: {e}"}
        if os.environ.get("DV_BENCH_1B_INT8", "1") == "1":
            try:
                # the TUNED deployment config the kernel work shipped:
                # K=32 decode window, 128-token pages, int8 weights AND
                # int8 KV pages (PERF_NOTES deployment guidance)
                scale_int8 = _bench_scale(
                    pipeline, chain, quantize="int8", kv_quantize="int8",
                    decode_steps=32, page_size=128)
            except Exception as e:  # noqa: BLE001
                scale_int8 = {"error": f"{type(e).__name__}: {e}"}

    if not ttfts:
        print(json.dumps({
            "metric": "next_question_ttft_p50", "value": -1, "unit": "ms",
            "vs_baseline": 0.0, "error": (q_errors + r_errors)[:3],
        }))
        return 1

    p50 = statistics.median(ttfts)
    p95 = sorted(ttfts)[int(0.95 * (len(ttfts) - 1))]
    cold = ttfts_by_round.get(1) or []
    warm = ttfts_by_round.get(2) or []
    print(json.dumps({
        "metric": "next_question_ttft_p50",
        "value": round(p50, 1),
        "unit": "ms",
        "vs_baseline": round(1500.0 / p50, 3) if p50 > 0 else 0.0,
        "backend": backend,
        "model": f"{q_cfg.model}+{r_cfg.model}",
        "concurrent_sessions": n_sessions,
        "ttft_p95_ms": round(p95, 1),
        "request_total_p50_ms": round(statistics.median(totals), 1),
        "question_decode_tokens_per_s": round(tokens_q / q_wall, 1),
        "requests_per_min": round(len(ttfts) / q_wall * 60.0, 1),
        "reports_per_min": round(len(drafts) / r_wall * 60.0, 2),
        "report_draft_tokens_p50": (
            statistics.median(drafts) if drafts else 0),
        "report_decode_tokens_per_s": round(tokens_r / r_wall, 1),
        "doc_ingest_pages_per_s": round(pages_per_s, 1),
        "doc_embed": doc_embed,
        "n_requests": len(ttfts),
        "errors": len(q_errors) + len(r_errors),
        # compile_s = question-serving readiness (the server's readiness
        # gate; report-only engines warm in the background) + prewarm;
        # compile_full_s = every engine hot + prewarm
        "compile_s": round(compile_s, 1),
        "compile_full_s": round(compile_full_s, 1),
        "backend_up_s": round(backend_up_s, 1),
        "degraded_window": degraded_window,
        # cold = first question per session (prefix miss), warm = second
        # question reusing the session's cached prompt-head pages
        "ttft_cold_p50_ms": round(statistics.median(cold), 1)
        if cold else -1,
        "ttft_warm_p50_ms": round(statistics.median(warm), 1)
        if warm else -1,
        # cold = round-1 full-facts draft, warm = round-2 slimmed re-draft
        # sharing the evidence-pack head (report-lane prefix reuse)
        "report_prefill_cold_p50_ms": round(statistics.median(
            r_prefill_by_round[1]), 1) if r_prefill_by_round[1] else -1,
        "report_prefill_warm_p50_ms": round(statistics.median(
            r_prefill_by_round[2]), 1) if r_prefill_by_round[2] else -1,
        "prefix_cache_question": q_stats.get("prefix_cache"),
        "prefix_cache_report": r_stats.get("prefix_cache")
        if engine_r is not engine_q else None,
        "dv1b": scale,
        "dv1b_int8": scale_int8,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
