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
