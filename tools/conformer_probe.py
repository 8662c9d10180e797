"""Conformer-plateau discriminator: fixed-SET overfit with varying shapes.

Round-4/5 facts: the 16-block Conformer plateaus at ~2 nats/char on the
synthetic-language corpus under fresh-compositions-every-step, while (a)
the SAME config overfits one fixed batch (fixed shapes) to ~0, and (b)
QuartzNet converges on the same stream. Round-5 probes eliminated the
speed-perturbation-ambiguity hypothesis (no-speed run plateaus at the
same level, work/logs/probe_nospeed.log).

This probe separates the two remaining hypotheses:

- Train on a FIXED finite set (e.g. 8 batches, 256 utterances, varying
  lengths/buckets, augmentation drawn ONCE) for N steps. If the model
  cannot overfit THIS — a task strictly easier than generalization —
  the problem is a varying-shape training defect (per-bucket retrace,
  BN-over-padding, mask handling), not learning dynamics.
- If it overfits the fixed set but still plateaus on the dynamic
  stream, the wall is generalization dynamics (architecture/schedule),
  and the levers are depth/width/steps, not bug hunting.

Usage:
    python tools/conformer_probe.py [--steps 1500] [--n-batches 8]
        [--config configs/conformer_ctc_vi_stack.yaml] [--sig v2]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.synth_lang_run import (SynthDynamicDataset, heldout_sequences,
                                  make_bank)


class CachedDataset:
    """First read composes+augments; later reads replay the SAME item —
    turns the dynamic stream into a fixed finite corpus with the exact
    same length/bucket distribution."""

    def __init__(self, inner):
        self.inner = inner
        self.cache = {}
        self.entries = inner.entries
        self.sample_rate = inner.sample_rate
        self.num_dropped = 0

    def __len__(self):
        return len(self.inner)

    def max_token_len(self):
        return self.inner.max_token_len()

    def __getitem__(self, i):
        if i not in self.cache:
            self.cache[i] = self.inner[i]
        return self.cache[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/conformer_ctc_vi_stack.yaml")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--sig", default="v2")
    ap.add_argument("--out", default="work/logs/conformer_fixedset.jsonl")
    args = ap.parse_args()

    from vietasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()

    import jax

    from vietasr_tpu.audio import BucketBatcher, CharTokenizer
    from vietasr_tpu.config import load_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.train import (TrainState, Trainer, make_optimizer,
                                   make_schedule)

    cfg = load_config(args.config)
    tok = CharTokenizer(cfg.labels)
    bank = make_bank(cfg.labels, args.sig)
    exclude = set(heldout_sequences(bank, 64))
    ds = CachedDataset(SynthDynamicDataset(
        bank, tok, seed=7, size=args.batch_size * args.n_batches,
        exclude=exclude))
    batcher = BucketBatcher(ds, args.batch_size, max_duration=7.0,
                            bucket_margin=1.12)
    spe = max(batcher.steps_per_epoch(), 1)
    epochs = max(args.steps // spe, 1)
    schedule = make_schedule("CosineAnnealing", args.lr, epochs * spe,
                             warmup_steps=args.steps // 10)
    opt = make_optimizer("adamw", schedule, weight_decay=0.001,
                         grad_clip_norm=5.0)
    state = TrainState.create(model_init(jax.random.PRNGKey(0), cfg), opt)
    trainer = Trainer(cfg=cfg, optimizer=opt, lr_schedule=schedule,
                      log_every=50, compute_dtype="bfloat16",
                      use_specaug=False)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    def log(tr, m):
        line = json.dumps(m)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    trainer.callbacks.append(log)
    state = trainer.fit(state, batcher, num_epochs=epochs)
    print(json.dumps({"done_step": int(state.step),
                      "n_items": len(ds), "spe": spe}))


if __name__ == "__main__":
    main()
