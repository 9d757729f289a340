"""Batched text embedding on TPU — the doc-ingest hot path.

The reference shells out per-document to a conversion subprocess and calls a
remote summary API (SURVEY.md §3.4); here the ingest pipeline's compute —
tokenize (C++ batch) -> transformer encode -> mean-pool — is one fused XLA
program over padded length buckets, sized for the "doc-ingest pages/sec"
target (BASELINE.md).

The encoder reuses the serving transformer (forward hidden states, no LM
head); any loaded checkpoint doubles as the embedder.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deepvision_tpu.engine import model as model_lib
from deepvision_tpu.engine.config import ModelConfig, get_model_config
from deepvision_tpu.engine.tokenizer import get_tokenizer
from deepvision_tpu.engine.weights import init_params

EMBED_BUCKETS = (128, 256, 512, 1024)


def _encode_hidden(params, tokens, seq_lens, *, cfg: ModelConfig):
    """Forward through the transformer blocks, mean-pool valid positions."""
    B, S = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0).astype(jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))

    def layer(x, blk):
        h = model_lib.rms_norm(x, blk["ln1"], cfg.rms_eps)
        q = jnp.dot(h, blk["wq"], preferred_element_type=jnp.bfloat16)
        k = jnp.dot(h, blk["wk"], preferred_element_type=jnp.bfloat16)
        v = jnp.dot(h, blk["wv"], preferred_element_type=jnp.bfloat16)
        nh = q.shape[-1] // cfg.head_dim
        nkv = k.shape[-1] // cfg.head_dim
        q = model_lib.apply_rope(
            q.reshape(B, S, nh, cfg.head_dim), positions, cfg.rope_theta
        )
        k = model_lib.apply_rope(
            k.reshape(B, S, nkv, cfg.head_dim), positions, cfg.rope_theta
        )
        v = v.reshape(B, S, nkv, cfg.head_dim)
        from deepvision_tpu.engine.kernels.flash_attention import (
            flash_attention,
        )

        attn = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), seq_lens,
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nh * cfg.head_dim)
        out = jnp.dot(attn, blk["wo"], preferred_element_type=jnp.float32)
        x = x + out.astype(x.dtype)
        h2 = model_lib.rms_norm(x, blk["ln2"], cfg.rms_eps)
        x = x + model_lib._mlp(h2, blk, None)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["blocks"])
    x = model_lib.rms_norm(x, params["final_norm"], cfg.rms_eps)
    mask = (
        jnp.arange(S)[None, :] < seq_lens[:, None]
    ).astype(jnp.float32)[..., None]
    pooled = jnp.sum(x.astype(jnp.float32) * mask, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1.0
    )
    return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)


class DocumentEmbedder:
    """Batched embedder with per-(batch,bucket) compiled programs."""

    def __init__(self, cfg_or_name="dv-smoke", params=None,
                 tokenizer_spec: Optional[str] = "byte",
                 batch_size: int = 16, tokenizer=None):
        self.cfg = (
            cfg_or_name if isinstance(cfg_or_name, ModelConfig)
            else get_model_config(cfg_or_name)
        )
        self.params = params if params is not None else init_params(
            self.cfg, seed=7)
        # a live tokenizer instance (e.g. the serving engine's) wins over
        # the spec string, so the embedder shares the engine's vocab
        self.tokenizer = (tokenizer if tokenizer is not None
                          else get_tokenizer(tokenizer_spec))
        self.batch_size = batch_size
        self._fns = {}

    def _fn(self, bucket: int):
        if bucket not in self._fns:
            self._fns[bucket] = jax.jit(
                functools.partial(_encode_hidden, cfg=self.cfg)
            )
        return self._fns[bucket]

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Returns [N, d_model] float32 unit vectors."""
        if not texts:
            return np.zeros((0, self.cfg.d_model), np.float32)
        token_lists = self.tokenizer.encode_batch(list(texts))
        out = np.zeros((len(texts), self.cfg.d_model), np.float32)
        order = sorted(range(len(texts)), key=lambda i: len(token_lists[i]))
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            max_len = max(len(token_lists[i]) for i in idx)
            bucket = next(
                (b for b in EMBED_BUCKETS if max_len <= b), EMBED_BUCKETS[-1]
            )
            B = len(idx)
            toks = np.zeros((B, bucket), np.int32)
            lens = np.zeros(B, np.int32)
            for row, i in enumerate(idx):
                ids = token_lists[i][:bucket]
                toks[row, : len(ids)] = ids
                lens[row] = max(1, len(ids))
            emb = self._fn(bucket)(
                self.params, jnp.asarray(toks), jnp.asarray(lens)
            )
            emb_np = np.asarray(emb)
            for row, i in enumerate(idx):
                out[i] = emb_np[row]
        return out

    def rank_chunks(self, chunks: Sequence[str], query: str,
                    top_k: int = 3) -> List[int]:
        """Semantic chunk retrieval: cosine ranking against the query."""
        if not chunks:
            return []
        embs = self.embed_texts(list(chunks) + [query])
        scores = embs[:-1] @ embs[-1]
        return list(np.argsort(-scores)[:top_k])
