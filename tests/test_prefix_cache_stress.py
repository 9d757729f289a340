"""Randomized oracle-checked stress of the radix prefix cache.

The directed tests (tests/test_prefix_cache.py) pin known shapes; this
suite drives thousands of random store/lookup/evict/free operations
against a brute-force ORACLE — a plain chunk-trie — and checks after
every step:

  * lookup maximality: n_shared equals the longest page-aligned stored
    prefix (capped one page below the prompt) — a regression to the
    round-4 first-token-keyed branching bug (chains diverging mid-first-
    page could not coexist) shows up here as a non-maximal hit;
  * page identity: the pages returned are exactly the oracle's pages
    for those chunks (dedupe: first writer wins);
  * refcount conservation: once all lookup references are freed and the
    tree is cleared, every page returns to the free list;
  * cap enforcement: cached pages never exceed max_pages.

Reference match: prompt-cache semantics web/server.py:4920-5012 (the
reference caches at string level; the page-radix design is the
TPU-native equivalent over KV pages).
"""

import random

from deepvision_tpu.engine.kv_cache import PageAllocator
from deepvision_tpu.engine.prefix_cache import PrefixCache

PS = 4  # small pages make page-boundary logic dense


class ChunkTrieOracle:
    """First-writer-wins trie over token chunks of size PS."""

    def __init__(self):
        self.trie = {}   # chunk-path tuple -> page id

    def store(self, tokens, pages):
        n_full = len(tokens) // PS
        path = ()
        for i in range(n_full):
            chunk = tuple(tokens[i * PS:(i + 1) * PS])
            path = path + (chunk,)
            if path not in self.trie:
                self.trie[path] = pages[i]

    def lookup(self, tokens):
        limit = ((len(tokens) - 1) // PS) * PS
        path, pages = (), []
        for i in range(limit // PS):
            chunk = tuple(tokens[i * PS:(i + 1) * PS])
            path = path + (chunk,)
            if path not in self.trie:
                break
            pages.append(self.trie[path])
        return len(pages) * PS, pages


def _mk_prompt(rng, pool):
    """Prompts built from a tiny alphabet with heavy shared heads."""
    head = rng.choice(pool)
    tail_len = rng.randint(1, 3 * PS)
    tail = [rng.randint(0, 5) for _ in range(tail_len)]
    return list(head) + tail


def test_randomized_against_oracle():
    rng = random.Random(20260821)
    alloc = PageAllocator(num_pages=512)
    cache = PrefixCache(alloc, PS, max_pages=400)
    oracle = ChunkTrieOracle()
    # shared heads: a few fixed stems of 1-4 pages
    pool = [tuple(rng.randint(0, 5) for _ in range(PS * rng.randint(1, 4)))
            for _ in range(6)]
    outstanding = []  # (pages-to-free) from lookups and stores

    for step in range(2000):
        op = rng.random()
        prompt = _mk_prompt(rng, pool)
        if op < 0.45:
            # admission: lookup, then alloc the rest, then store
            n, shared = cache.lookup("k", prompt)
            en, epages = oracle.lookup(prompt)
            assert n == en, (step, n, en, prompt)
            assert shared == epages, (step, shared, epages)
            assert n % PS == 0 and n < len(prompt)
            need = (len(prompt) + PS - 1) // PS - len(shared)
            fresh = alloc.try_alloc(need)
            if fresh is None:
                alloc.free(shared)
                continue
            pages = shared + fresh
            n_full = len(prompt) // PS
            cache.store("k", prompt, pages[:n_full])
            oracle.store(prompt, pages[:n_full])
            outstanding.append(pages)
        elif op < 0.75:
            # pure lookup (e.g. a request that later got cancelled)
            n, shared = cache.lookup("k", prompt)
            en, epages = oracle.lookup(prompt)
            assert (n, shared) == (en, epages), (step, n, en)
            if shared:
                alloc.free(shared)
        elif op < 0.9 and outstanding:
            # a sequence retires
            alloc.free(outstanding.pop(rng.randrange(len(outstanding))))
        else:
            # memory pressure: evict some cold entries; the oracle cannot
            # track WHICH leaves die, so rebuild it from the tree
            cache.evict_lru(rng.randint(1, 30))
            oracle = ChunkTrieOracle()
            stack = [((), cache._root)]
            while stack:
                path, node = stack.pop()
                for child in node.children.values():
                    ctoks = tuple(child.tokens)
                    cpages = list(child.pages)
                    full = path + tuple(
                        ctoks[i * PS:(i + 1) * PS]
                        for i in range(len(ctoks) // PS))
                    # replay into the oracle trie
                    p = path
                    for i in range(len(ctoks) // PS):
                        p = p + (tuple(ctoks[i * PS:(i + 1) * PS]),)
                        oracle.trie[p] = cpages[i]
                    stack.append((full, child))
        # cap invariant
        assert cache._cached_pages <= cache.max_pages

    # conservation: free everything and the pool must be whole again
    for pages in outstanding:
        alloc.free(pages)
    cache.clear()
    assert alloc.available() == alloc.num_pages - 1  # page 0 reserved
    assert cache._cached_pages == 0


def test_store_lookup_roundtrip_every_length():
    """Every prompt length from 1 to 6 pages round-trips: store then
    lookup shares exactly ((len-1)//PS) pages."""
    for n_tok in range(1, 6 * PS + 1):
        alloc = PageAllocator(num_pages=64)
        cache = PrefixCache(alloc, PS)
        prompt = list(range(100, 100 + n_tok))
        pages = alloc.alloc((n_tok + PS - 1) // PS)
        cache.store("k", prompt, pages[: n_tok // PS])
        n, shared = cache.lookup("k", prompt)
        assert n == ((n_tok - 1) // PS) * PS, (n_tok, n)
        assert shared == pages[: n // PS]
        alloc.free(shared)


def test_interleaved_keys_do_not_interfere():
    """The cache is content-addressed; per-key state must not leak
    between tenants with disjoint token spaces."""
    alloc = PageAllocator(num_pages=128)
    cache = PrefixCache(alloc, PS)
    a = list(range(0, 3 * PS + 1))
    b = list(range(1000, 1000 + 3 * PS + 1))
    pa = alloc.alloc(4)
    pb = alloc.alloc(4)
    cache.store("tenant-a", a, pa[:3])
    cache.store("tenant-b", b, pb[:3])
    na, sa = cache.lookup("tenant-b", a)   # content decides, key gates None
    nb, sb = cache.lookup("tenant-a", b)
    assert sa == pa[:3] and sb == pb[:3]
    assert na == nb == 3 * PS
    alloc.free(sa)
    alloc.free(sb)
