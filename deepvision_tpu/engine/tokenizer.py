"""Tokenizers for the serving engine.

Default is a dependency-free byte-level tokenizer (any UTF-8 text round-trips
exactly — important for the Chinese-language interview app).  Real BPE vocabs
load through HuggingFace ``tokenizers`` when a ``tokenizer.json`` is
configured.  A C++ batched fast path (``deepvision_tpu/native``) accelerates
bulk document ingest when built; these Python classes are the reference
implementation and fallback.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence


class ByteTokenizer:
    """Byte-level tokenizer: ids 0..255 are raw bytes, then specials."""

    BOS = 256
    EOS = 257
    PAD = 258

    vocab_size = 259
    special_ids = frozenset({256, 257, 258})

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = list(text.encode("utf-8"))
        return ([self.BOS] if add_bos else []) + ids

    def encode_batch(
        self, texts: Sequence[str], add_bos: bool = True
    ) -> List[List[int]]:
        try:
            from deepvision_tpu import native

            if native.native_available():
                return native.encode_batch(list(texts), add_bos)
        except Exception:
            pass
        return [self.encode(t, add_bos) for t in texts]

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="replace")

    @property
    def eos_id(self) -> int:
        return self.EOS


class HFTokenizer:
    """Wraps a HuggingFace ``tokenizer.json`` BPE/unigram vocab."""

    def __init__(self, path: str):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(path)
        self.vocab_size = self._tok.get_vocab_size()
        try:
            self.special_ids = frozenset(
                self._tok.get_added_tokens_decoder().keys())
        except Exception:
            self.special_ids = frozenset()
        eos = None
        for cand in ("<|eot|>", "</s>", "<eos>", "<|endoftext|>",
                     "<|eot_id|>"):
            tid = self._tok.token_to_id(cand)
            if tid is not None:
                eos = tid
                break
        self._eos = eos if eos is not None else 0

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        return self._tok.encode(text).ids

    def encode_batch(
        self, texts: Sequence[str], add_bos: bool = True
    ) -> List[List[int]]:
        return [e.ids for e in self._tok.encode_batch(list(texts))]

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids))

    @property
    def eos_id(self) -> int:
        return self._eos


def get_tokenizer(spec: Optional[str] = None):
    """``spec``: None/"byte" for the byte tokenizer, else a tokenizer.json path."""
    if not spec or spec == "byte":
        return ByteTokenizer()
    if os.path.isfile(spec):
        return HFTokenizer(spec)
    raise FileNotFoundError(f"tokenizer spec {spec!r} not found")
