"""Model correctness: prefill+decode through the paged cache must reproduce
the dense full-sequence forward, token for token."""

import jax
import jax.numpy as jnp
import numpy as np

from deepvision_tpu.engine.config import TINY_TEST
from deepvision_tpu.engine.kv_cache import CacheConfig, PageAllocator, init_cache
from deepvision_tpu.engine import model as model_lib
from deepvision_tpu.engine.weights import init_params, count_params

CFG = TINY_TEST
CACHE = CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8)


def test_param_count_reasonable():
    params = init_params(CFG, seed=0)
    n = count_params(params)
    assert n > CFG.vocab_size * CFG.d_model  # at least the embedding


def test_prefill_decode_matches_dense_forward():
    params = init_params(CFG, seed=0)
    cache = init_cache(CFG, CACHE)
    alloc = PageAllocator(CACHE.num_pages)

    rng = np.random.RandomState(0)
    prompt = rng.randint(1, CFG.vocab_size, size=11).tolist()
    n_decode = 5

    # --- paged path: prefill then stepwise decode, greedy ---
    S_pad = 32  # multiple of page_size
    pages = alloc.alloc(S_pad // CACHE.page_size + 2)
    toks = np.zeros((1, S_pad), np.int32)
    toks[0, : len(prompt)] = prompt
    prefill_pages = np.zeros((1, S_pad // CACHE.page_size), np.int32)
    prefill_pages[0] = pages[: S_pad // CACHE.page_size]
    logits, cache = model_lib.forward_prefill(
        params, cache, jnp.asarray(toks),
        jnp.asarray([len(prompt)], jnp.int32),
        jnp.asarray(prefill_pages), cfg=CFG, interpret=True,
    )
    seq = list(prompt)
    paged_tokens = []
    next_tok = int(jnp.argmax(logits[0]))
    paged_tokens.append(next_tok)
    seq.append(next_tok)

    bt = np.zeros((1, CACHE.max_pages_per_seq), np.int32)
    bt[0, : len(pages)] = pages
    for _ in range(n_decode - 1):
        logits, cache = model_lib.forward_decode(
            params, cache, jnp.asarray([seq[-1]], jnp.int32),
            jnp.asarray([len(seq)], jnp.int32), jnp.asarray(bt),
            cfg=CFG, interpret=True,
        )
        next_tok = int(jnp.argmax(logits[0]))
        paged_tokens.append(next_tok)
        seq.append(next_tok)

    # --- dense path: greedy continuation via full forward each step ---
    seq2 = list(prompt)
    dense_tokens = []
    for _ in range(n_decode):
        logits_all = model_lib.forward_train(
            params, jnp.asarray([seq2], jnp.int32), cfg=CFG
        )
        next_tok = int(jnp.argmax(logits_all[0, -1]))
        dense_tokens.append(next_tok)
        seq2.append(next_tok)

    assert paged_tokens == dense_tokens, (paged_tokens, dense_tokens)


def test_prefill_logits_match_dense_forward_numerically():
    params = init_params(CFG, seed=1)
    cache = init_cache(CFG, CACHE)
    alloc = PageAllocator(CACHE.num_pages)
    rng = np.random.RandomState(1)
    n = 9
    prompt = rng.randint(1, CFG.vocab_size, size=n)

    S_pad = 16
    pages = alloc.alloc(S_pad // CACHE.page_size)
    toks = np.zeros((1, S_pad), np.int32)
    toks[0, :n] = prompt
    prefill_pages = np.asarray([pages], np.int32)
    logits, _ = model_lib.forward_prefill(
        params, cache, jnp.asarray(toks), jnp.asarray([n], jnp.int32),
        jnp.asarray(prefill_pages), cfg=CFG, interpret=True,
    )
    dense = model_lib.forward_train(
        params, jnp.asarray([prompt], jnp.int32), cfg=CFG
    )
    np.testing.assert_allclose(
        np.asarray(logits[0]), np.asarray(dense[0, -1]), rtol=3e-2, atol=3e-2
    )


def test_batched_decode_independent_sequences():
    """Two sequences decoded in one batch must match batch=1 decoding."""
    params = init_params(CFG, seed=2)
    rng = np.random.RandomState(2)
    prompts = [rng.randint(1, CFG.vocab_size, size=7).tolist(),
               rng.randint(1, CFG.vocab_size, size=13).tolist()]

    def run(prompt_set):
        cache = init_cache(CFG, CACHE)
        alloc = PageAllocator(CACHE.num_pages)
        B = len(prompt_set)
        state = []
        for i, p in enumerate(prompt_set):
            S_pad = 16
            pages = alloc.alloc(S_pad // CACHE.page_size + 1)
            toks = np.zeros((1, S_pad), np.int32)
            toks[0, : len(p)] = p
            pp = np.asarray([pages[: S_pad // CACHE.page_size]], np.int32)
            logits, cache = model_lib.forward_prefill(
                params, cache, jnp.asarray(toks),
                jnp.asarray([len(p)], jnp.int32), jnp.asarray(pp),
                cfg=CFG, interpret=True,
            )
            state.append({
                "seq": list(p) + [int(jnp.argmax(logits[0]))],
                "pages": pages,
            })
        outs = [[s["seq"][-1]] for s in state]
        for _ in range(3):
            bt = np.zeros((B, CACHE.max_pages_per_seq), np.int32)
            for i, s in enumerate(state):
                bt[i, : len(s["pages"])] = s["pages"]
            tokens = np.asarray([s["seq"][-1] for s in state], np.int32)
            lens = np.asarray([len(s["seq"]) for s in state], np.int32)
            logits, cache_new = model_lib.forward_decode(
                params, cache, jnp.asarray(tokens), jnp.asarray(lens),
                jnp.asarray(bt), cfg=CFG, interpret=True,
            )
            cache = cache_new
            for i, s in enumerate(state):
                t = int(jnp.argmax(logits[i]))
                s["seq"].append(t)
                outs[i].append(t)
        return outs

    batched = run(prompts)
    solo0 = run(prompts[:1])
    assert batched[0] == solo0[0]
