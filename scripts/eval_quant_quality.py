"""A/B quality eval: dv-base int8 weight-only quantization vs bf16.

Decides whether ``ENGINE_QUANTIZE=int8`` is safe for the TRAINED serving
lanes (quant.py's perf case is the dv-1b-class scale datum; the trained
22-92M models are dispatch-bound, so for them int8 must merely not hurt).
Greedy decoding on prompts rendered through the app's own builders
(bench.py round-3 lesson: handwritten prompt variants are
out-of-distribution for the from-scratch checkpoints), one engine at a
time — two TPU processes corrupt each other through the tunnel.

Usage:  python scripts/eval_quant_quality.py [--model dv-base] [--n 4]
Prints one JSON line: token agreement, draft-length and JSON-validity
deltas.  Run on the real chip; CPU interpret mode would take hours at
900-token drafts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_prompts(n: int):
    import bench

    return [bench.report_prompt(i) for i in range(n)]


def run_lane(model: str, quantize: str, prompts, max_tokens: int):
    from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(root, "resources", "checkpoints", f"{model}.npz")
    tok = os.path.join(root, "resources", "tokenizer",
                       "dv_bpe_16k.json" if model != "dv-mini"
                       else "dv_bpe_8k.json")
    eng = LLMEngine(EngineConfig(
        model=model, tokenizer=tok, checkpoint_dir=ckpt,
        max_slots=4, num_pages=1024, page_size=64, max_pages_per_seq=32,
        decode_steps_per_call=16, chunked_prefill=True,
        quantize=quantize, warmup=False,
    ))
    eng.start()
    outs = []
    for p in prompts:
        text, meta = eng.generate_text(
            p, max_tokens=max_tokens, temperature=0.0, json_mode=True,
            timeout=900)
        outs.append({"text": text, "tokens": meta["completion_tokens"]})
    eng.shutdown()
    return outs


def json_ok(s: str) -> bool:
    try:
        json.loads(s)
        return True
    except Exception:  # noqa: BLE001
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dv-base")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--max-tokens", type=int, default=1200)
    args = ap.parse_args()

    prompts = build_prompts(args.n)
    base = run_lane(args.model, "", prompts, args.max_tokens)
    q8 = run_lane(args.model, "int8", prompts, args.max_tokens)

    # char-level prefix agreement of the greedy streams: weight rounding
    # shifts logits, so streams may diverge at some position — what
    # matters is that int8 output stays long, valid JSON of similar shape
    agrees = []
    for a, b in zip(base, q8):
        n = min(len(a["text"]), len(b["text"]))
        same = next(
            (i for i in range(n) if a["text"][i] != b["text"][i]), n)
        agrees.append(same / max(n, 1))
    print(json.dumps({
        "model": args.model,
        "n_prompts": args.n,
        "bf16_tokens": [o["tokens"] for o in base],
        "int8_tokens": [o["tokens"] for o in q8],
        "bf16_json_ok": sum(json_ok(o["text"]) for o in base),
        "int8_json_ok": sum(json_ok(o["text"]) for o in q8),
        "greedy_prefix_agreement": [round(a, 3) for a in agrees],
    }, ensure_ascii=False))


if __name__ == "__main__":
    main()
