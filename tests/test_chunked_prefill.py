"""Chunked prefill must be equivalent to bucketed prefill, and decoding
must continue identically afterwards."""

import numpy as np

from deepvision_tpu.engine.config import TINY_TEST
from deepvision_tpu.engine.kv_cache import CacheConfig, PageAllocator
from deepvision_tpu.engine.runner import ModelRunner
from deepvision_tpu.engine.weights import init_params

CACHE = CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8)


def _run(chunked: bool, prompt, n_decode=4):
    params = init_params(TINY_TEST, seed=0)
    r = ModelRunner(
        TINY_TEST, CACHE, params, max_slots=2, interpret=True,
        chunked_prefill=chunked, prefill_chunk_size=8,
    )
    alloc = PageAllocator(CACHE.num_pages)
    pages = alloc.alloc(6)
    first = r.prefill(prompt, pages, temperature=0.0)
    seq = list(prompt) + [first]
    bt = np.zeros((2, CACHE.max_pages_per_seq), np.int32)
    bt[0, : len(pages)] = pages
    toks = np.zeros(2, np.int32)
    lens = np.ones(2, np.int32)
    z = np.zeros(2, np.float32)
    ones = np.ones(2, np.float32)
    zi = np.zeros(2, np.int32)
    out = [first]
    for _ in range(n_decode):
        toks[0] = seq[-1]
        lens[0] = len(seq)
        nt = r.decode(toks, lens, bt, z, zi, ones)[0]
        seq.append(int(nt[0]))
        out.append(int(nt[0]))
    return out


def test_chunked_equals_bucketed():
    rng = np.random.RandomState(0)
    # 23 tokens: 2 full chunks of 8 + partial chunk of 7
    prompt = rng.randint(1, TINY_TEST.vocab_size, size=23).tolist()
    assert _run(False, prompt) == _run(True, prompt)


def test_chunked_single_chunk_prompt():
    rng = np.random.RandomState(1)
    prompt = rng.randint(1, TINY_TEST.vocab_size, size=5).tolist()
    assert _run(False, prompt) == _run(True, prompt)


def test_chunked_exact_chunk_boundary():
    rng = np.random.RandomState(2)
    prompt = rng.randint(1, TINY_TEST.vocab_size, size=16).tolist()
    assert _run(False, prompt) == _run(True, prompt)
