"""Native C++ helpers, loaded via ctypes with transparent Python fallback.

Builds ``libdvnative.so`` from :file:`dv_native.cpp` on first use (g++ is in
the image; pybind11 is not, hence the plain C ABI).  Every entry point has a
pure-Python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dv_native.cpp")
_LIB = os.path.join(_HERE, "libdvnative.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.isfile(_LIB) or (
            os.path.isfile(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.dv_encode_batch.restype = ctypes.c_int
        lib.dv_decode.restype = ctypes.c_int
        lib.dv_bpe_encode.restype = ctypes.c_int
        lib.dv_chunk_markdown.restype = ctypes.c_int
        lib.dv_keyword_score.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# High-level wrappers
# ---------------------------------------------------------------------------

def encode_batch(texts: List[str], add_bos: bool = True,
                 max_len: int = 8192) -> List[List[int]]:
    lib = get_lib()
    if lib is None:
        out = []
        for t in texts:
            ids = ([256] if add_bos else []) + list(t.encode("utf-8"))
            out.append(ids[:max_len])
        return out
    n = len(texts)
    raw = [t.encode("utf-8") for t in texts]
    arr = (ctypes.c_char_p * n)(*raw)
    out = np.zeros((n, max_len), dtype=np.int32)
    lens = np.zeros(n, dtype=np.int32)
    lib.dv_encode_batch(
        arr, n, int(add_bos),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_len,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return [out[i, : lens[i]].tolist() for i in range(n)]


def chunk_markdown_native(text: str, chunk_chars: int = 800,
                          max_chunks: int = 256) -> Optional[List[str]]:
    lib = get_lib()
    if lib is None:
        return None
    data = text.encode("utf-8")
    starts = np.zeros(max_chunks, dtype=np.int32)
    ends = np.zeros(max_chunks, dtype=np.int32)
    n = lib.dv_chunk_markdown(
        data, len(data), chunk_chars,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_chunks,
    )
    if n < 0:
        return None
    return [
        data[starts[i]:ends[i]].decode("utf-8", "replace") for i in range(n)
    ]
