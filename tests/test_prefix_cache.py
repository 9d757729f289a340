"""Prefix cache: correctness of shared-page prefill + refcount integrity."""

import numpy as np
import pytest

from deepvision_tpu.engine.engine import EngineConfig, LLMEngine
from deepvision_tpu.engine.kv_cache import PageAllocator
from deepvision_tpu.engine.prefix_cache import PrefixCache

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def engine():
    eng = LLMEngine(EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=2,
        num_pages=96, page_size=16, max_pages_per_seq=16,
        chunked_prefill=True, prefill_chunk_size=16,
        interpret=True, seed=0,
    ))
    eng.start()
    yield eng
    eng.shutdown()


def test_prefix_hit_produces_identical_output(engine):
    head = "共享的系统提示头部 " * 6  # > 1 page of byte tokens
    p1 = head + "第一个问题"
    p2 = head + "第二个不同的问题"

    t_cold, _ = engine.generate_text(p1, max_tokens=6, temperature=0.0,
                                     timeout=300, prefix_key="sess-1")
    stats0 = engine.scheduler.prefix_cache.stats()
    # second request shares the head through the cache
    t_warm, _ = engine.generate_text(p2, max_tokens=6, temperature=0.0,
                                     timeout=300, prefix_key="sess-1")
    stats1 = engine.scheduler.prefix_cache.stats()
    assert stats1["hits"] > stats0["hits"]
    assert stats1["tokens_saved"] > 0

    # the warm result must equal a completely cold run of the same prompt
    t_ref, _ = engine.generate_text(p2, max_tokens=6, temperature=0.0,
                                    timeout=300, prefix_key=None)
    assert t_warm == t_ref


def test_prefix_cache_refcounting():
    alloc = PageAllocator(num_pages=32)
    cache = PrefixCache(alloc, page_size=4)
    tokens = list(range(10))  # 2 full pages + partial
    pages = alloc.alloc(3)
    avail_after_alloc = alloc.available()
    cache.store("k", tokens, pages)
    # cache holds refs on the 2 full pages; freeing the request's refs
    # must NOT return those to the free list
    alloc.free(pages)
    assert alloc.available() == avail_after_alloc + 1  # only partial page
    n, shared = cache.lookup("k", tokens + [99])
    assert n == 8 and len(shared) == 2
    cache.clear()
    alloc.free(shared)
    assert alloc.available() == 31  # all pages back (page 0 reserved)


def test_prefix_lookup_respects_divergence():
    alloc = PageAllocator(num_pages=32)
    cache = PrefixCache(alloc, page_size=4)
    tokens = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    pages = alloc.alloc(3)
    cache.store("k", tokens, pages)
    # diverges at position 2 -> no full page shared
    n, shared = cache.lookup("k", [1, 2, 99, 4, 5, 6, 7, 8])
    assert n == 0 and shared == []
    # diverges at position 6 -> one full page
    n, shared = cache.lookup("k", [1, 2, 3, 4, 5, 6, 99, 8])
    assert n == 4 and len(shared) == 1
    alloc.free(shared)


def test_prefix_never_shares_whole_prompt():
    alloc = PageAllocator(num_pages=32)
    cache = PrefixCache(alloc, page_size=4)
    tokens = [1, 2, 3, 4, 5, 6, 7, 8]
    pages = alloc.alloc(2)
    cache.store("k", tokens, pages)
    # identical prompt: must leave at least the final token to re-run
    n, shared = cache.lookup("k", tokens)
    assert n == 4  # not 8
    alloc.free(shared)


def test_radix_cross_key_sharing():
    """The round-2 radix tree: a prompt head cached under one session key
    is hit by a DIFFERENT session whose prompt starts with the same
    tokens (cross-session scenario/doc-head reuse)."""
    alloc = PageAllocator(num_pages=64)
    cache = PrefixCache(alloc, page_size=4)
    head = [7, 7, 7, 7, 8, 8, 8, 8]          # two full pages
    tokens_a = head + [1, 2, 3]
    pages_a = alloc.alloc(3)
    cache.store("sess-a", tokens_a, pages_a)
    # different key, same head, different tail
    n, shared = cache.lookup("sess-b", head + [9, 9, 9, 9, 5])
    assert n == 8 and shared == pages_a[:2]
    alloc.free(shared)


def test_radix_edge_split_and_dedupe():
    alloc = PageAllocator(num_pages=64)
    cache = PrefixCache(alloc, page_size=2)
    a = [1, 2, 3, 4, 5, 6]                    # 3 pages
    pa = alloc.alloc(3)
    cache.store("k1", a, pa)
    pages_before = cache.stats()["pages"]
    # same chain again with fresh pages: must dedupe (no new cached pages)
    pb = alloc.alloc(3)
    cache.store("k2", a, pb)
    assert cache.stats()["pages"] == pages_before
    alloc.free(pb)
    # divergent at token 4 (page boundary 4): splits the edge
    c = [1, 2, 3, 4, 9, 9]
    pc = alloc.alloc(3)
    cache.store("k3", c, pc)
    n, shared = cache.lookup("k4", [1, 2, 3, 4, 9, 9, 0])
    assert n == 6 and len(shared) == 3
    assert shared[:2] == pa[:2] and shared[2] == pc[2]
    alloc.free(shared)
    alloc.free(pc)
    alloc.free(pa)


def test_radix_page_cap_evicts_lru():
    alloc = PageAllocator(num_pages=64)
    cache = PrefixCache(alloc, page_size=2, max_pages=4)
    p1 = alloc.alloc(3)
    cache.store("k1", [1, 1, 1, 1, 1, 1], p1)
    p2 = alloc.alloc(3)
    cache.store("k2", [2, 2, 2, 2, 2, 2], p2)
    assert cache.stats()["pages"] <= 4
    alloc.free(p1)
    alloc.free(p2)
    cache.clear()
    assert alloc.available() == 63


def test_mid_page_divergence_chains_coexist():
    """Round-4 regression (BENCH_r03 hits 1/127): every interview prompt
    opens with the same preamble token but diverges mid-first-page (the
    topic differs per session).  First-token-keyed branching could store
    only ONE such chain; page-keyed branching stores them all, and each
    session's identical re-submission hits."""
    alloc = PageAllocator(num_pages=128)
    cache = PrefixCache(alloc, page_size=4)
    chains = []
    for i in range(8):
        # shared first token 1, divergence at position 1 (inside page 0)
        chain = [1, 100 + i, 2, 3, 4, 5, 6, 7, 8]
        pages = alloc.alloc(2)
        cache.store(f"sess-{i}", chain, pages)
        chains.append((chain, pages))
    assert cache.stats()["entries"] == 8          # all siblings stored
    for i, (chain, _) in enumerate(chains):
        n, shared = cache.lookup(f"sess-{i}", chain)
        assert n == 8, (i, n)                     # both full pages hit
        alloc.free(shared)
    assert cache.stats()["hits"] == 8
    for _, pages in chains:
        alloc.free(pages)


def test_prefix_key_none_bypasses():
    alloc = PageAllocator(num_pages=16)
    cache = PrefixCache(alloc, page_size=2)
    p = alloc.alloc(2)
    cache.store(None, [1, 2, 3, 4], p)
    assert cache.stats()["pages"] == 0
    n, shared = cache.lookup(None, [1, 2, 3, 4, 5])
    assert n == 0 and shared == []
    alloc.free(p)


# --- report-lane participation (round-5 fix): every report-pipeline call
# must carry the session key, so draft retries / review rounds / profile
# regenerates reuse the evidence-pack head's pages instead of
# re-prefilling from zero (VERDICT r4 weak #1; reference prompt cache
# web/server.py:4920-5012) ---------------------------------------------------

def test_report_pipeline_threads_session_key_into_every_call():
    from deepvision_tpu.web.runtime import report_v3

    contexts = []

    class RecordingGateway:
        def call_model(self, prompt, call_type="question", context=None,
                       **kw):
            contexts.append((call_type, dict(context or {})))
            if call_type == "report_draft":
                import json
                return json.dumps({
                    "overview": "概述" * 30,
                    "needs": [{"title": "需求", "detail": "细节",
                               "refs": ["Q1"], "priority": "高"}],
                    "pain_points": [{"title": "痛点", "refs": ["Q1"]}],
                    "recommendations": [{"title": "建议", "refs": ["Q1"]}],
                }, ensure_ascii=False)
            # review lane: flag an issue without a patch so the pipeline
            # exercises the repair-reprompt (a third distinct call site)
            return ('{"pass": false, "quality_score": 0.4, '
                    '"issues": [{"type": "x", "severity": "low", '
                    '"message": "m", "target": "overview"}], "patch": {}}')

    session = {
        "session_id": "sess-report-key",
        "topic": "测试主题",
        "interview_log": [
            {"question": f"问题{i}", "answer": "回答内容足够长" * 3}
            for i in range(4)
        ],
    }
    report_v3.generate_report_v3(RecordingGateway(), session)
    assert contexts, "pipeline made no model calls"
    call_types = {ct for ct, _ in contexts}
    assert "report_draft" in call_types
    for call_type, ctx in contexts:
        assert ctx.get("session_id") == "sess-report-key", (
            f"{call_type} call lost the prefix/session key: {ctx}")


def test_report_retry_hits_prefix_cache(engine):
    """A slimmed-facts re-draft (the degrading-retry / regenerate shape)
    shares the evidence-pack head through the radix cache."""
    from deepvision_tpu.web.runtime import prompt_formats

    facts = [(f"Q{k}", f"关于维度{k}的现状？", "存在断点，期望自动化。" * 2)
             for k in range(1, 9)]
    full = prompt_formats.report_draft_prompt("主题共享头部测试", facts)
    slim = prompt_formats.report_draft_prompt("主题共享头部测试", facts[:6])
    assert full.startswith(slim)  # retry prompt is a strict head-prefix

    engine.generate_text(full, max_tokens=4, temperature=0.0,
                         timeout=300, prefix_key="report-sess")
    stats0 = engine.scheduler.prefix_cache.stats()
    t_warm, _ = engine.generate_text(slim, max_tokens=4, temperature=0.0,
                                     timeout=300, prefix_key="report-sess")
    stats1 = engine.scheduler.prefix_cache.stats()
    assert stats1["hits"] > stats0["hits"]
    assert stats1["tokens_saved"] > stats0["tokens_saved"]

    t_ref, _ = engine.generate_text(slim, max_tokens=4, temperature=0.0,
                                    timeout=300, prefix_key=None)
    assert t_warm == t_ref
