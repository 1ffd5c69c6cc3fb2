"""Train a (main, draft) model pair on the permutation-chain corpus and
export both to safetensors — the honest workload for model-based
speculative decoding (VERDICT r4 task 3).

The corpus: sequences walk a fixed permutation pi over the first CSIZE
token ids (seed 1234 — the same chain `cli.py serve-bench
--corpus chain:CSIZE` generates prompts from). Learning it means
memorizing 'next = pi(cur)': quick for both a 1B-class main model and a
tiny draft, but INVISIBLE to n-gram prompt lookup — with a chain period
of CSIZE, a prompt+generation window never repeats a bigram, so lookup
drafts score ~0% while a trained draft model carries the global
next-token function.

Usage (on the TPU):
    PYTHONPATH=. python scripts/train_spec_pair.py \
        --out-main /tmp/spec_main.safetensors \
        --out-draft /tmp/spec_draft.safetensors
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from flash_attention_tpu.models.llama import LlamaConfig
from flash_attention_tpu.models.trainer import Trainer
from flash_attention_tpu.utils.bench import device_sync
from flash_attention_tpu.utils.safetensors import params_to_safetensors

CSIZE = 4096
SEED = 1234


def batches(rng, n_batch, seq):
    perm = np.random.default_rng(SEED).permutation(CSIZE)
    while True:
        starts = rng.integers(0, CSIZE, n_batch)
        out = np.empty((n_batch, seq), np.int32)
        for b, t in enumerate(starts):
            for j in range(seq):
                out[b, j] = t
                t = perm[t]
        yield jnp.asarray(out)


def train(name, cfg, opt, *, steps, batch, seq, target_loss, seed=0):
    tr = Trainer(cfg, opt, seed=seed)
    gen = batches(np.random.default_rng(7 + seed), batch, seq)
    t0 = time.perf_counter()
    loss = float("inf")
    for i in range(steps):
        loss_dev = tr.train_step(next(gen))
        if i % 25 == 0 or i == steps - 1:
            device_sync(loss_dev)
            loss = float(loss_dev)
            print(f"[{name}] step {i:4d}  loss {loss:.4f}  "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
            if loss < target_loss:
                break
    return tr, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--main-preset", default="llama3_1b")
    ap.add_argument("--out-main", default="/tmp/spec_main.safetensors")
    ap.add_argument("--out-draft", default="/tmp/spec_draft.safetensors")
    ap.add_argument("--main-steps", type=int, default=800)
    ap.add_argument("--draft-steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=129)
    ap.add_argument("--target-loss", type=float, default=0.15)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")

    # Draft: tiny 4-layer model, AdamW (cheap).
    draft_cfg = LlamaConfig(
        vocab_size=128256, dim=512, n_layers=4, n_heads=8,
        n_kv_heads=8, ffn_dim=2048, dtype=jnp.bfloat16)
    trd, dloss = train("draft", draft_cfg, optax.adamw(2e-3),
                       steps=args.draft_steps, batch=args.batch,
                       seq=args.seq, target_loss=args.target_loss,
                       seed=2)
    params_to_safetensors(args.out_draft, trd.params, draft_cfg,
                          layout="hf")
    del trd

    # Main: 1B-class, SGD+momentum (AdamW's fp32 moments would put a
    # 1B model's optimizer state at ~10 GB next to the params).
    main_cfg = getattr(LlamaConfig, args.main_preset)(dtype=jnp.bfloat16)
    trm, mloss = train(
        "main", main_cfg,
        optax.sgd(0.3, momentum=0.9),
        steps=args.main_steps, batch=args.batch, seq=args.seq,
        target_loss=args.target_loss, seed=3)
    params_to_safetensors(args.out_main, trm.params, main_cfg,
                          layout="hf")
    print(f"done: draft loss {dloss:.4f} -> {args.out_draft}; "
          f"main loss {mloss:.4f} -> {args.out_main}")


if __name__ == "__main__":
    main()
