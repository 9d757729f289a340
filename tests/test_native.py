"""Native C++ helpers: build, correctness vs Python fallbacks."""

import numpy as np
import pytest

from deepvision_tpu.native import (
    chunk_markdown_native,
    encode_batch,
    get_lib,
    native_available,
)


def test_native_builds():
    assert native_available(), "g++ build of dv_native.cpp failed"


def test_encode_batch_matches_python():
    texts = ["hello", "中文测试", "", "mixed 中英 text"]
    native = encode_batch(texts, add_bos=True)
    for t, ids in zip(texts, native):
        expect = [256] + list(t.encode("utf-8"))
        assert ids == expect, t


def test_decode_roundtrip():
    import ctypes

    lib = get_lib()
    text = "你好 world"
    ids = np.asarray([256] + list(text.encode("utf-8")), dtype=np.int32)
    buf = ctypes.create_string_buffer(256)
    n = lib.dv_decode(
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ids),
        buf, 256,
    )
    assert buf.raw[:n].decode("utf-8") == text


def test_bpe_encode_merges():
    import ctypes

    lib = get_lib()
    # merge rule: 'a'(97)+'b'(98) -> 259; then 259+'c'(99) -> 260
    merges = np.asarray([[97, 98], [259, 99]], dtype=np.int32)
    out = np.zeros(64, dtype=np.int32)
    n = lib.dv_bpe_encode(
        b"abcabd", merges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        2, 0, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 64,
    )
    assert out[:n].tolist() == [260, 259, 100]  # abc->260, ab->259, d


def test_chunk_markdown_native():
    text = "\n\n".join(f"第{i}段落。" + "内容" * 50 for i in range(10))
    chunks = chunk_markdown_native(text, chunk_chars=200)
    assert chunks is not None and len(chunks) > 1
    # chunks must re-join to cover the text (modulo stripped whitespace)
    joined = "".join(chunks)
    assert "第0段落" in joined and "第9段落" in joined
    # every chunk decodes cleanly (UTF-8 boundary safety)
    for ch in chunks:
        assert "�" not in ch
