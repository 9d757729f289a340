#!/usr/bin/env python
"""Train dv-mini from scratch on the TPU (thin wrapper over train_model.py).

Kept for compatibility with round-1 docs/CI; the general trainer now lives
in scripts/train_model.py (any preset, periodic saves, val loss, resume).

Usage:
  python scripts/train_dv_mini.py --corpus data/corpus/dv_corpus.txt \
      --steps 3000 --batch 16 --seq 512 \
      --out resources/checkpoints/dv-mini.npz
"""

from __future__ import annotations

import sys

import train_model


def main():
    defaults = {
        "--model": "dv-mini",
        "--tokenizer": "resources/tokenizer/dv_bpe_8k.json",
        "--out": "resources/checkpoints/dv-mini.npz",
        "--steps": "3000",
        "--batch": "16",
        "--seq": "512",
    }
    argv = sys.argv[1:]
    for flag, value in defaults.items():
        if flag not in argv:
            argv += [flag, value]
    sys.argv = [sys.argv[0]] + argv
    train_model.main()


if __name__ == "__main__":
    main()
