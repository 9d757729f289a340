#!/usr/bin/env python
"""Static dependency-direction guardrails (reference
scripts/agent_static_guardrails.py): enforce the layer rules from
ARCHITECTURE.md at source level.

Rules:
  1. engine/ must not import web/ (the engine is app-agnostic).
  2. web/ modules must not import scripts/ (business code never depends on
     ops tooling; reference ARCHITECTURE.md:189).
  3. engine/kernels/ must not import torch (TPU compute path is JAX-only).
  4. web/runtime must not construct LLMEngine directly — model access goes
     through the gateway (single seam for tests + metrics).
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "deepvision_tpu")


def iter_py(subdir):
    for dirpath, _dirs, files in os.walk(os.path.join(PKG, subdir)):
        for name in files:
            if name.endswith(".py"):
                yield os.path.join(dirpath, name)


def main():
    violations = []

    for path in iter_py("engine"):
        src = open(path, encoding="utf-8").read()
        if re.search(r"^\s*(from|import)\s+deepvision_tpu\.web", src, re.M):
            violations.append(f"{path}: engine imports web layer")

    for path in iter_py("web"):
        src = open(path, encoding="utf-8").read()
        if re.search(r"^\s*(from|import)\s+scripts\b", src, re.M):
            violations.append(f"{path}: web imports scripts/")

    for path in iter_py(os.path.join("engine", "kernels")):
        src = open(path, encoding="utf-8").read()
        if re.search(r"^\s*(from|import)\s+torch\b", src, re.M):
            violations.append(f"{path}: kernel imports torch")

    for path in iter_py(os.path.join("web", "runtime")):
        src = open(path, encoding="utf-8").read()
        if "LLMEngine(" in src:
            violations.append(
                f"{path}: runtime constructs LLMEngine directly "
                "(use the gateway)"
            )

    if violations:
        print(f"{len(violations)} guardrail violations:")
        for v in violations:
            print(" -", os.path.relpath(v, ROOT))
        return 1
    print("static guardrails OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
