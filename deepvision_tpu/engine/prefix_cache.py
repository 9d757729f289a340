"""Prefix cache: share fully-written KV pages across requests.

The interview flow resends a mostly-stable prompt head every next-question
call (role + topic + docs + early history — the reference cached prompt
*text* per session signature, web/server.py:4920; here the cached artifact
is the prefix's KV pages on device).  With chunked prefill, a request whose
prompt shares a page-aligned prefix with the cached entry skips straight to
the first divergent page.

Safety invariants:
* only FULL pages are ever shared (the partial tail page is rewritten by
  the new request's own prefill, and decode's in-place RMW only touches
  pages past the prompt) — shared pages are immutable by construction;
* pages are refcounted in the allocator; the cache holds one reference,
  every active sequence holds another.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

from deepvision_tpu.engine.kv_cache import PageAllocator


def _common_prefix_len(a: Sequence[int], b: Sequence[int]) -> int:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return n


class PrefixCache:
    def __init__(self, allocator: PageAllocator, page_size: int,
                 max_entries: int = 64):
        self.alloc = allocator
        self.page_size = page_size
        self.max_entries = max_entries
        self._lock = threading.Lock()
        self._entries: Dict[str, dict] = {}
        self.hits = 0
        self.misses = 0
        self.tokens_saved = 0

    def lookup(self, key: Optional[str],
               prompt_tokens: Sequence[int]) -> Tuple[int, List[int]]:
        """Returns ``(n_shared_tokens, shared_pages)``; takes a reference
        on the returned pages.  ``n_shared_tokens`` is page-aligned and
        strictly less than ``len(prompt_tokens)`` (the final token must be
        re-run to produce logits)."""
        if not key:
            return 0, []
        with self._lock:
            entry = self._entries.get(key)
            if entry is None:
                self.misses += 1
                return 0, []
            common = _common_prefix_len(entry["tokens"], prompt_tokens)
            common = min(common, len(prompt_tokens) - 1)
            n = (common // self.page_size) * self.page_size
            if n <= 0:
                self.misses += 1
                return 0, []
            pages = entry["pages"][: n // self.page_size]
            self.alloc.share(pages)
            entry["last_used"] = time.monotonic()
            self.hits += 1
            self.tokens_saved += n
            return n, list(pages)

    def store(self, key: Optional[str], prompt_tokens: Sequence[int],
              pages: Sequence[int]) -> None:
        """Cache the prompt's full pages (cache takes its own reference)."""
        if not key:
            return
        n_full = len(prompt_tokens) // self.page_size
        if n_full <= 0:
            return
        keep = list(pages[:n_full])
        with self._lock:
            old = self._entries.pop(key, None)
            if old is not None:
                self.alloc.free(old["pages"])
            if len(self._entries) >= self.max_entries:
                lru_key = min(
                    self._entries, key=lambda k:
                    self._entries[k]["last_used"],
                )
                evicted = self._entries.pop(lru_key)
                self.alloc.free(evicted["pages"])
            self.alloc.share(keep)
            self._entries[key] = {
                "tokens": tuple(prompt_tokens[: n_full * self.page_size]),
                "pages": keep,
                "last_used": time.monotonic(),
            }

    def evict_lru(self, n_pages: int) -> int:
        """Release least-recently-used entries until roughly ``n_pages``
        of cache-held pages have been dropped (admission back-pressure:
        a cold cache must never starve live requests of KV memory).
        Returns the number of pages released."""
        released = 0
        with self._lock:
            while self._entries and released < n_pages:
                lru_key = min(
                    self._entries,
                    key=lambda k: self._entries[k]["last_used"],
                )
                entry = self._entries.pop(lru_key)
                self.alloc.free(entry["pages"])
                released += len(entry["pages"])
        return released

    def evict(self, key: str) -> None:
        with self._lock:
            entry = self._entries.pop(key, None)
            if entry is not None:
                self.alloc.free(entry["pages"])

    def clear(self) -> None:
        with self._lock:
            for entry in self._entries.values():
                self.alloc.free(entry["pages"])
            self._entries.clear()

    def stats(self) -> dict:
        with self._lock:
            return {
                "entries": len(self._entries),
                "hits": self.hits,
                "misses": self.misses,
                "tokens_saved": self.tokens_saved,
            }
