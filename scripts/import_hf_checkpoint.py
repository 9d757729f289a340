#!/usr/bin/env python
"""Convert a HuggingFace Llama/Gemma checkpoint into an engine orbax
checkpoint directory for ENGINE_CHECKPOINT_DIR."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="HF -> engine checkpoint")
    p.add_argument("hf_model", help="HF model dir or hub id")
    p.add_argument("out_dir", help="orbax checkpoint output dir")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args()

    import numpy as np

    from deepvision_tpu.engine.hf_import import load_hf_model
    from deepvision_tpu.engine.weights import save_checkpoint

    dtype = (np.dtype("bfloat16") if args.dtype == "bfloat16"
             else np.float32)
    try:
        import ml_dtypes  # noqa: F401 — numpy bfloat16 support
    except ImportError:
        if args.dtype == "bfloat16":
            print("ml_dtypes missing; falling back to float32",
                  file=sys.stderr)
            dtype = np.float32

    cfg, params = load_hf_model(args.hf_model, dtype=dtype)
    print(f"converted {cfg.name}: {cfg.n_layers} layers, "
          f"d_model={cfg.d_model}, vocab={cfg.vocab_size}")
    save_checkpoint(args.out_dir, params)
    import json

    with open(os.path.join(args.out_dir, "model_config.json"), "w") as fh:
        json.dump({
            "vocab_size": cfg.vocab_size, "d_model": cfg.d_model,
            "n_layers": cfg.n_layers, "n_heads": cfg.n_heads,
            "n_kv_heads": cfg.n_kv_heads, "d_ff": cfg.d_ff,
            "head_dim": cfg.head_dim, "rope_theta": cfg.rope_theta,
            "rms_eps": cfg.rms_eps, "tie_embeddings": cfg.tie_embeddings,
            "scale_embeddings": cfg.scale_embeddings,
        }, fh, indent=1)
    print(f"saved to {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
