"""Batched embedding pipeline (CPU/interpret)."""

import numpy as np

from deepvision_tpu.engine.config import TINY_TEST
from deepvision_tpu.engine.embedding import DocumentEmbedder


def test_embed_batch_shapes_and_norms():
    emb = DocumentEmbedder(TINY_TEST, batch_size=4)
    texts = ["客户管理流程", "数据报表", "hello world", "x" * 300]
    out = emb.embed_texts(texts)
    assert out.shape == (4, TINY_TEST.d_model)
    norms = np.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-3)


def test_embed_deterministic_and_order_invariant():
    emb = DocumentEmbedder(TINY_TEST, batch_size=2)
    texts = ["短文本", "这是一段明显更长的文本内容，用于跨桶测试。" * 5,
             "中等长度的文本内容"]
    a = emb.embed_texts(texts)
    b = emb.embed_texts(list(reversed(texts)))[::-1]
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_rank_chunks_prefers_matching_text():
    emb = DocumentEmbedder(TINY_TEST, batch_size=4)
    chunks = ["完全无关的内容 abc", "客户管理系统的报表功能说明",
              "另一段无关内容 xyz"]
    top = emb.rank_chunks(chunks, "客户管理系统的报表功能说明", top_k=1)
    assert top[0] == 1  # exact-match chunk ranks first under cosine


# ---------------------------------------------------------------------------
# Hybrid retrieval wiring (round 4: engine/embedding.py -> production)
# ---------------------------------------------------------------------------

def test_hybrid_retrieval_finds_paraphrase_keyword_misses():
    """A paraphrased query shares no 2+-char keyword with the relevant
    chunk; keyword-only retrieval falls back to chunks[:1], while the
    semantic path ranks the related chunk first."""
    from deepvision_tpu.web.runtime.documents import select_chunks_for_query

    chunks = ["完全无关的天气记录 foo", "门店补货决策依赖人工经验",
              "另一段无关的排班说明 bar"]
    query = "仓库进货怎样自动化"

    # deterministic fake embedder: axis-aligned similarity
    def fake_embed(texts):
        vecs = []
        for t in texts:
            if ("补货" in t) or ("进货" in t):
                vecs.append([1.0, 0.0])
            else:
                vecs.append([0.0, 1.0])
        return np.asarray(vecs, np.float32)

    kw_only = select_chunks_for_query(chunks, query, top_k=1)
    hybrid = select_chunks_for_query(chunks, query, top_k=1,
                                     embed_fn=fake_embed)
    assert kw_only == [chunks[0]]          # keyword path is blind here
    assert hybrid == [chunks[1]]           # semantic path recovers it


def test_hybrid_retrieval_degrades_on_embedder_failure():
    from deepvision_tpu.web.runtime.documents import select_chunks_for_query

    def broken(texts):
        raise RuntimeError("device busy")

    chunks = ["补货流程说明", "无关内容"]
    out = select_chunks_for_query(chunks, "补货", top_k=1, embed_fn=broken)
    assert out == ["补货流程说明"]          # keyword fallback


def test_engine_embed_texts_on_serving_params():
    """LLMEngine.embed_texts: the serving checkpoint doubles as the
    encoder (production wiring for gateway.embed_texts)."""
    from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

    eng = LLMEngine(EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=2,
        num_pages=64, page_size=16, max_pages_per_seq=8,
        interpret=True, seed=0))
    try:
        out = eng.embed_texts(["门店补货", "天气记录"])
        assert out is not None and out.shape == (2, 128)
        norms = np.linalg.norm(out, axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-3)
    finally:
        eng.shutdown()


def test_gateway_embed_texts_none_without_engine_support():
    from deepvision_tpu.engine.client import ModelGateway

    gw = ModelGateway(engines={})          # template-only deployment
    assert gw.embed_texts(["x"]) is None


def test_gateway_embed_cache_skips_reembedding():
    """Chunk embeddings are cached by text: a second ranking call over
    the same chunks embeds only the novel query."""
    from deepvision_tpu.engine.client import ModelGateway

    calls = []

    class FakeEngine:
        def embed_texts(self, texts):
            calls.append(list(texts))
            return np.asarray([[1.0, 0.0]] * len(texts), np.float32)

    gw = ModelGateway(engines={"e": FakeEngine()})
    out1 = gw.embed_texts(["块一", "块二", "查询A"])
    assert out1.shape == (3, 2)
    assert calls == [["块一", "块二", "查询A"]]
    out2 = gw.embed_texts(["块一", "块二", "查询B"])
    assert out2.shape == (3, 2)
    assert calls[1] == ["查询B"]          # only the novel text embedded


def test_quantize_rows_passes_through_already_int8():
    """The sub-128-head-dim decode fallback hands pre-quantized rows to
    write_decode_token — re-quantizing them (or touching a None scale)
    was a crash+corruption path (round-4 review finding)."""
    import jax.numpy as jnp

    from deepvision_tpu.engine.kv_cache import quantize_rows

    q = jnp.asarray([[1, -2], [3, 4]], jnp.int8)
    out = quantize_rows(q, None, 0)       # None scale must be untouched
    assert out.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(out), np.asarray(q))
