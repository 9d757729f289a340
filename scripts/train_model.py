#!/usr/bin/env python
"""Train a dv model preset from scratch on the TPU.

The reference rents model quality over HTTPS; this framework owns it:
corpus (scripts/build_corpus.py) -> BPE tokenizer (train_tokenizer.py) ->
this script -> a real served checkpoint behind AI_MODE=engine.

Round-2 trainer: any preset (--model), Pallas flash-attention forward with
the dense-recompute VJP so seq-2048 training fits HBM, periodic checkpoint
saves (--save-every, interruption-safe), held-out validation loss
(--val-frac), and --resume from a saved npz.

Single-chip by default; pass --dp/--tp to shard over a mesh (same GSPMD
train step the driver's multichip dryrun exercises).

Usage:
  python scripts/train_model.py --model dv-base \
      --corpus data/corpus/dv_corpus.txt \
      --tokenizer resources/tokenizer/dv_bpe_16k.json \
      --steps 20000 --batch 8 --seq 2048 \
      --out resources/checkpoints/dv-base.npz
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_tokens(corpus_path: str, tokenizer_path: str):
    import numpy as np
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(tokenizer_path)
    eot = tok.token_to_id("<|eot|>")
    with open(corpus_path, encoding="utf-8") as fh:
        text = fh.read()
    docs = [d for d in text.split("<|eot|>") if d.strip()]
    ids = []
    # encode in batches (Rust-parallel)
    B = 2048
    for i in range(0, len(docs), B):
        for enc in tok.encode_batch(docs[i:i + B]):
            ids.extend(enc.ids)
            ids.append(eot)
    return np.asarray(ids, dtype=np.int32), tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dv-base")
    ap.add_argument("--corpus", default="data/corpus/dv_corpus.txt")
    ap.add_argument("--tokenizer",
                    default="resources/tokenizer/dv_bpe_16k.json")
    ap.add_argument("--out", default="resources/checkpoints/dv-base.npz")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--save-every", type=int, default=2000,
                    help="write the checkpoint every N steps (0 = only at end)")
    ap.add_argument("--val-frac", type=float, default=0.005,
                    help="tail fraction of the corpus held out for val loss")
    ap.add_argument("--resume", default="",
                    help="npz checkpoint to initialize from")
    ap.add_argument("--early-stop", type=int, default=0,
                    help="stop after N consecutive val evals without "
                         "improvement (0 = run all steps)")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline-parallel stages (GPipe over a 'pipe' "
                         "mesh axis; requires n_layers %% pp == 0 and "
                         ">= pp devices)")
    ap.add_argument("--pp-micro", type=int, default=4,
                    help="microbatches per PP step (batch %% micro == 0)")
    ap.add_argument("--dense-attn", action="store_true",
                    help="use the dense XLA attention path (CPU/debug)")
    args = ap.parse_args()

    import numpy as np

    t0 = time.time()
    tokens, tok = load_tokens(args.corpus, args.tokenizer)
    print(f"corpus: {len(tokens)/1e6:.1f}M tokens "
          f"(tokenized in {time.time()-t0:.1f}s)", flush=True)

    import jax
    import optax

    # reuse the serving engine's persistent XLA compile cache so train-step
    # recompiles (resume runs, config sweeps) skip the remote helper
    from deepvision_tpu.engine.engine import _enable_persistent_compile_cache

    _enable_persistent_compile_cache()

    from deepvision_tpu.engine.config import get_model_config
    from deepvision_tpu.engine.training import (
        Trainer, cross_entropy_loss, make_train_step,  # noqa: F401
    )
    from deepvision_tpu.engine import model as model_lib
    from deepvision_tpu.engine.weights import (
        count_params, load_npz, save_npz,
    )

    cfg = get_model_config(args.model)
    assert tok.get_vocab_size() <= cfg.vocab_size, (
        tok.get_vocab_size(), cfg.vocab_size)
    assert args.seq <= cfg.max_seq_len, (args.seq, cfg.max_seq_len)

    n_val = max(args.seq + 2, int(len(tokens) * args.val_frac))
    train_tokens, val_tokens = tokens[:-n_val], tokens[-n_val:]

    warmup = min(args.warmup, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, max(args.steps, warmup + 1),
        end_value=args.lr * 0.05)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=0.01),
    )
    use_kernel = not args.dense_attn and jax.default_backend() != "cpu"
    init = None
    if args.resume:
        init = jax.tree.map(
            lambda x: x.astype(jax.numpy.float32), load_npz(args.resume))
        print(f"resumed params from {args.resume}", flush=True)
    pp_step = None
    if args.pp > 1:
        # GPipe pipeline parallelism: the layer stack shards over a
        # 'pipe' mesh axis (pipeline_parallel.py); dense attention only
        # (the schedule differentiates through ppermute hops)
        from deepvision_tpu.engine.pipeline_parallel import (
            make_pp_mesh, make_pp_train_step, place_pp_params,
            pp_stage_layers,
        )
        from deepvision_tpu.engine.weights import init_params

        assert args.batch % args.pp_micro == 0, (args.batch, args.pp_micro)
        pp_stage_layers(cfg, args.pp)
        pp_mesh = make_pp_mesh(args.pp)
        params0 = init if init is not None else init_params(
            cfg, args.seed, dtype=jax.numpy.float32)
        trainer = None
        pp_params = place_pp_params(params0, pp_mesh, cfg)
        pp_opt = jax.jit(tx.init)(pp_params)
        pp_step = make_pp_train_step(cfg, tx, pp_mesh, args.pp_micro)

        class _PPTrainer:
            """Minimal Trainer facade over the PP step."""

            def __init__(self):
                self.params = pp_params
                self.opt_state = pp_opt
                self.step_count = 0

            def train_step_async(self, batch):
                self.params, self.opt_state, loss = pp_step(
                    self.params, self.opt_state,
                    jax.numpy.asarray(batch))
                self.step_count += 1
                return loss

            def train_step(self, batch):
                return float(self.train_step_async(batch))

        trainer = _PPTrainer()
        print(f"pipeline parallel: {args.pp} stages x "
              f"{cfg.n_layers // args.pp} layers, "
              f"{args.pp_micro} microbatches", flush=True)
    else:
        trainer = Trainer(cfg, tx=tx, seed=args.seed,
                          param_dtype=jax.numpy.float32,
                          use_kernel=use_kernel, init=init)
    print(f"{args.model}: {count_params(trainer.params)/1e6:.1f}M params, "
          f"backend={jax.default_backend()}, "
          f"attn={'pallas' if use_kernel else 'dense'}", flush=True)

    @jax.jit
    def eval_step(params, batch):
        logits = model_lib.forward_train(params, batch[:, :-1], cfg=cfg)
        return cross_entropy_loss(logits, batch[:, 1:])

    def val_loss(params, n_batches=8):
        rng_v = np.random.RandomState(1234)
        row = args.seq + 1
        hi = len(val_tokens) - row - 1
        if hi <= 0:
            return float("nan")
        losses = []
        for _ in range(n_batches):
            starts = rng_v.randint(0, hi, size=args.batch)
            batch = np.stack([val_tokens[s:s + row] for s in starts])
            losses.append(float(eval_step(params, batch)))
        return float(np.mean(losses))

    def save(path):
        params_bf16 = jax.tree.map(
            lambda x: x.astype(jax.numpy.bfloat16), trainer.params)
        tmp = path + ".tmp"
        save_npz(tmp, params_bf16)
        os.replace(tmp, path)

    # fixed-shape batches; contiguous chunks sampled at random offsets
    rng = np.random.RandomState(args.seed)
    row = args.seq + 1
    max_start = len(train_tokens) - row - 1
    best_val, stale = float("inf"), 0
    best_path = args.out + ".best"
    losses = []
    t_start = time.time()
    for step in range(1, args.steps + 1):
        starts = rng.randint(0, max_start, size=args.batch)
        batch = np.stack([train_tokens[s:s + row] for s in starts])
        losses.append(trainer.train_step_async(batch))
        if step % args.log_every == 0 or step == args.steps:
            dt = time.time() - t_start
            recent = [float(x) for x in losses[-args.log_every:]]
            print(f"step {step}/{args.steps} "
                  f"loss={np.mean(recent):.4f} "
                  f"({dt/step*1e3:.0f} ms/step, "
                  f"{args.batch*args.seq*step/dt/1e3:.0f} ktok/s)",
                  flush=True)
        if args.save_every and step % args.save_every == 0:
            save(args.out)
            vl = val_loss(trainer.params)
            if vl < best_val:
                best_val, stale = vl, 0
                shutil.copyfile(args.out, best_path)
                tag = " [best]"
            else:
                stale += 1
                tag = f" (best {best_val:.4f}, stale {stale})"
            print(f"step {step}: val_loss={vl:.4f}{tag} "
                  f"(checkpoint -> {args.out})", flush=True)
            if args.early_stop and stale >= args.early_stop:
                print(f"early stop at step {step}: no val improvement in "
                      f"{stale} evals", flush=True)
                break

    save(args.out)
    size = os.path.getsize(args.out) / 1e6
    print(f"saved {args.out} ({size:.1f} MB), "
          f"final val_loss={val_loss(trainer.params):.4f}; "
          f"best val_loss={best_val:.4f} -> {best_path}", flush=True)

    # quick greedy sample as a sanity check — never let it tank a finished
    # training run (the checkpoint is already on disk at this point)
    try:
        from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

        eng = LLMEngine(EngineConfig(
            model=args.model, tokenizer=args.tokenizer,
            checkpoint_dir=args.out,
            max_slots=2, num_pages=256, page_size=64, max_pages_per_seq=32,
        ))
        prompt = (
            "你是一名资深需求访谈顾问，正在进行结构化访谈。\n\n"
            "访谈主题：电商平台会员体系升级\n\n"
            "当前维度：目标价值（关注要点：核心目标、期望价值）\n\n"
            "请生成下一个访谈问题，输出 JSON："
        )
        text, meta = eng.generate_text(
            prompt, max_tokens=120, temperature=0.0, timeout=600)
        print("--- sample ---")
        print(text[:500])
        eng.shutdown()
    except Exception as e:  # noqa: BLE001
        print(f"[sample skipped: {type(e).__name__}: {e}]")


if __name__ == "__main__":
    main()
