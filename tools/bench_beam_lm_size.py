"""Measure beam-search decode cost vs word-LM table size N.

Produces the N curve behind ops/device_beam.PALLAS_WLM_MAX_ROWS: the
fused Pallas kernel's dense chunked match is O(N) VPU work per step,
while the XLA scan path's open-addressing probe gathers are
N-independent. This script synthesizes real ARPA models at increasing N
(random word corpora over the Vietnamese label alphabet), builds both
table forms, and times one full decode (B=16, T=500 frames, V=91,
W=16) per path per N on the attached TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_beam_lm_size.py
"""
import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp


def make_corpus(rng, n_words, n_lines, line_len, chars):
    vocab = ["".join(rng.choice(chars, size=rng.randint(2, 7)))
             for _ in range(n_words)]
    return [" ".join(rng.choice(vocab, size=line_len))
            for _ in range(n_lines)]


def timeit(fn, *args, iters=3, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        # pull a scalar: block_until_ready alone is unreliable over the
        # tunnel backend (ROUND_NOTES gotcha)
        np.asarray(out[1])[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from vietasr_tpu.config import load_config
    from vietasr_tpu.ops.device_beam import device_beam_search
    from vietasr_tpu.ops.lm import NGramLM, train_ngram_arpa, word_lm_tables
    from vietasr_tpu.ops.pallas_beam import (_pick_lm_chunk,
                                             dense_lm_from_tables,
                                             pallas_beam_search)

    cfg = load_config("/root/reference/configs/quartznet12x1_vi.yaml")
    labels = cfg.labels
    space = labels.index(" ")
    chars = [c for c in labels if c.isalpha()][:40]
    rng = np.random.RandomState(0)

    B, T, V1, W = 16, 200, cfg.num_classes + 1, 16
    logits = rng.randn(B, T, V1).astype(np.float32) * 2.0
    lp = jnp.asarray(logits - np.log(
        np.exp(logits).sum(-1, keepdims=True)))
    lens = jnp.asarray(np.full((B,), T, np.int32))
    audio_s = B * T * 0.02  # 20 ms per encoder frame (stride-2 @10ms hop)

    # corpus sizes tuned to land near the target row counts
    settings = [(150, 60, 8), (350, 200, 10), (700, 450, 10),
                (1200, 900, 12), (2500, 2200, 14)]
    print(f"{'N rows':>8} {'chunk':>6} {'pallas ms':>10} {'xla ms':>8} "
          f"{'pallas a-s/s':>13} {'xla a-s/s':>10}")
    for n_words, n_lines, line_len in settings:
        corpus = make_corpus(rng, n_words, n_lines, line_len, chars)
        arpa = os.path.join(tempfile.mkdtemp(), "lm.arpa")
        train_ngram_arpa(corpus, arpa, order=3, char_level=False)
        print(f"# arpa built ({n_words} words)", flush=True)
        tables, probes = word_lm_tables(NGramLM(arpa), labels)
        print("# tables built", flush=True)
        unk = float(np.asarray(tables.unk_logp))
        dense = dense_lm_from_tables(tables, unk)
        n = int(dense.key1.shape[0])
        chunk = _pick_lm_chunk(n, W, B)

        def pall(lp, lens):
            return pallas_beam_search(
                lp, lens, beam_width=W, blank=cfg.num_classes,
                dense_lm=dense, unk_logp=unk, space=space,
                alpha=0.5, beta=1.5, cutoff_top_n=8)

        def xla(lp, lens):
            return device_beam_search(
                lp, lens, beam_width=W, blank=cfg.num_classes,
                word_lm=tables, wlm_probes=probes, space=space,
                alpha=0.5, beta=1.5, cutoff_top_n=8)

        try:
            tp = timeit(pall, lp, lens)
            pcol = f"{tp*1e3:>10.1f}", f"{audio_s/tp:>13.0f}"
        except Exception as e:
            pcol = f"{'FAIL':>10}", f"{type(e).__name__:>13}"
        tx = timeit(xla, lp, lens)
        print(f"{n:>8} {chunk:>6} {pcol[0]} {tx*1e3:>8.1f} "
              f"{pcol[1]} {audio_s/tx:>10.0f}", flush=True)


if __name__ == "__main__":
    main()
