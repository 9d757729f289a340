"""Smart-summary subsystem tests (SURVEY §2.3 "Smart summary system"):
hash-keyed doc-summary cache with the >1400-char threshold, the
sha256-keyed converted-doc cache, and the sliding-window interview
history.  Reference: summarize_document web/server.py:18210, caches
:18127-18208 + :6973-7037, CONTEXT_WINDOW_SIZE/SUMMARY_THRESHOLD
web/config.py:71,73."""

import os
import tempfile

import pytest

from deepvision_tpu.web.meta_index import MetaIndex
from deepvision_tpu.web.runtime.documents import DocumentPipeline
from deepvision_tpu.web.runtime.interview import (
    build_doc_context,
    build_history_window,
)


class CountingGateway:
    def __init__(self, reply="要点摘要：流程断点、预算受限、期望自动化。"):
        self.calls = []
        self.reply = reply
        self.fail = False

    def call_model(self, prompt, call_type=None, context=None, **kw):
        self.calls.append((call_type, (context or {}).get("doc_name")))
        if self.fail:
            raise RuntimeError("lane down")
        return self.reply


@pytest.fixture()
def pipe():
    tmp = tempfile.TemporaryDirectory()
    meta = MetaIndex(os.path.join(tmp.name, "meta.sqlite3"))
    gw = CountingGateway()
    p = DocumentPipeline(meta, gw)
    p._tmp = tmp
    p._gw = gw
    yield p
    tmp.cleanup()


LONG_DOC = ("业务流程现状说明：跨部门协作效率低，数据分散在多个系统，"
            "报表手工汇总耗时超过两天，管理层缺乏实时视图。" * 40)


# ---------------------------------------------------------------------------
# doc summary cache
# ---------------------------------------------------------------------------

def test_short_docs_are_not_summarized(pipe):
    assert len(LONG_DOC) > 1400
    out = pipe.summarize_cached("short.docx", "短文档内容")
    assert out is None
    assert pipe._gw.calls == []


def test_threshold_is_exclusive_at_min_chars(pipe):
    exactly = "字" * pipe.summary_min_chars
    assert pipe.summarize_cached("edge.docx", exactly) is None
    just_over = "字" * (pipe.summary_min_chars + 1)
    assert pipe.summarize_cached("edge.docx", just_over) is not None


def test_summary_cached_by_content_hash(pipe):
    s1 = pipe.summarize_cached("a.docx", LONG_DOC)
    assert s1 and len(pipe._gw.calls) == 1
    # same content, DIFFERENT filename: still a cache hit (content-keyed)
    s2 = pipe.summarize_cached("renamed.docx", LONG_DOC)
    assert s2 == s1
    assert len(pipe._gw.calls) == 1
    # different content misses
    pipe.summarize_cached("b.docx", LONG_DOC + "结尾不同")
    assert len(pipe._gw.calls) == 2


def test_summary_failure_returns_none_and_is_not_cached(pipe):
    pipe._gw.fail = True
    assert pipe.summarize_cached("c.docx", LONG_DOC) is None
    pipe._gw.fail = False
    # recovers on the next call — the failure was not cached
    assert pipe.summarize_cached("c.docx", LONG_DOC)


def test_summary_cache_survives_pipeline_restart(pipe):
    pipe.summarize_cached("persist.docx", LONG_DOC)
    gw2 = CountingGateway()
    pipe2 = DocumentPipeline(pipe.meta, gw2)
    assert pipe2.summarize_cached("persist.docx", LONG_DOC)
    assert gw2.calls == []  # served from the store


# ---------------------------------------------------------------------------
# converted-doc cache (sha256)
# ---------------------------------------------------------------------------

def _docx(text):
    import io
    import zipfile

    xml = ('<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
           'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
           f"<w:p><w:r><w:t>{text}</w:t></w:r></w:p>"
           "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", xml)
    return buf.getvalue()


def test_convert_cached_roundtrip_and_hit(pipe):
    data = _docx("转换缓存测试内容")
    md1 = pipe.convert_cached("x.docx", data)
    assert "转换缓存测试内容" in md1
    md2 = pipe.convert_cached("y.docx", data)  # same bytes, any name
    assert md2 == md1
    row = pipe.meta.query_one(
        "SELECT COUNT(*) AS n FROM converted_cache_store", ())
    assert row["n"] == 1


# ---------------------------------------------------------------------------
# sliding-window history
# ---------------------------------------------------------------------------

def _log(n):
    return [{"question": f"问题{i}", "answer": f"回答{i}"}
            for i in range(n)]


def test_history_window_keeps_last_n():
    text, needs = build_history_window(_log(7), window=5)
    assert "问题2" in text and "问题6" in text
    assert "问题0" not in text and "问题1" not in text
    assert needs is False  # 7 < threshold 8


def test_history_summary_due_at_threshold():
    _, needs = build_history_window(_log(8))
    assert needs is True


def test_history_prepends_summary_block():
    text, _ = build_history_window(
        _log(10), summary="此前讨论了预算与排期。")
    assert text.startswith("【历史摘要】此前讨论了预算与排期。")
    assert "问题9" in text


# ---------------------------------------------------------------------------
# doc context budgets
# ---------------------------------------------------------------------------

def test_doc_context_prefers_summary_and_truncates():
    docs = [
        {"name": "a", "summary": "摘要A" * 10, "content": "原文A" * 2000},
        {"name": "b", "content": "原文B" * 2000},
    ]
    ctx = build_doc_context(docs, max_doc_chars=100, max_total_chars=250)
    assert "摘要A" in ctx
    assert "原文A" not in ctx          # summary wins over raw content
    assert len(ctx) <= 260             # total budget (+ separators)


def test_doc_context_total_budget_stops_iteration():
    docs = [{"name": str(i), "content": "内容" * 200} for i in range(10)]
    ctx = build_doc_context(docs, max_doc_chars=400, max_total_chars=900)
    assert len(ctx) <= 1000
    assert ctx.count("参考文档") <= 3
