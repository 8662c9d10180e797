"""Measure the fused Pallas beam kernel vs the XLA scan across widths.

Round-3 evidence for VERDICT item 1 (wide-beam coverage): runs the decode
stage alone (posterior precomputed) at the reference's deploy widths
(W=50 web, W=100 CLI) plus the W=16 serving default, kernel vs XLA scan,
and cross-checks transcripts for equality on the real chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_wide_beam.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import SECONDS, SR, VI_CORPUS, _timeit, wait_for_quiet_chip
from vietasr_tpu.config import load_config
from vietasr_tpu.ops.device_beam import device_beam_search
from vietasr_tpu.ops.lm import NGramLM, train_ngram_arpa, word_lm_tables
from vietasr_tpu.ops.pallas_beam import dense_lm_from_tables, \
    pallas_beam_search


def main():
    batch = int(os.environ.get("BEAM_BATCH", "128"))
    cfg = load_config("/root/reference/configs/quartznet12x1_vi.yaml")
    arpa = os.path.join(tempfile.mkdtemp(), "vi_word.arpa")
    train_ngram_arpa(VI_CORPUS, arpa, order=3, char_level=False)
    tables, probes = word_lm_tables(NGramLM(arpa), cfg.labels)
    unk = float(np.asarray(tables.unk_logp))
    dense = dense_lm_from_tables(tables, unk)
    space = cfg.labels.index(" ")
    v1 = cfg.num_classes + 1
    t_frames = (SECONDS * SR // 160 + 1) // 2    # after stride-2 encoder

    rng = np.random.RandomState(0)
    logits = rng.randn(batch, t_frames, v1).astype(np.float32) * 2.0
    lp = jnp.asarray(logits - np.log(
        np.exp(logits).sum(-1, keepdims=True)))
    lens = jnp.asarray(np.full((batch,), t_frames, np.int32))
    audio_s = batch * SECONDS

    canary = wait_for_quiet_chip()
    print(json.dumps({"canary_tfs": round(canary, 1),
                      "batch": batch, "t": t_frames,
                      "lm_rows": int(dense.key1.shape[0])}), flush=True)

    for w in [16, 50, 100]:
        kw = dict(blank=cfg.num_classes, beam_width=w, cutoff_top_n=8,
                  space=space, alpha=0.5, beta=1.5)

        def pal(lp, lens):
            return pallas_beam_search(lp, lens, dense_lm=dense,
                                      unk_logp=unk, **kw)

        def xla(lp, lens):
            return device_beam_search(lp, lens, word_lm=tables,
                                      wlm_probes=probes, **kw)

        t0 = time.time()
        ids_p, len_p = jax.tree.map(np.asarray, pal(lp, lens))
        compile_s = time.time() - t0
        ids_x, len_x = jax.tree.map(np.asarray, xla(lp, lens))
        same = bool((len_p == len_x).all()) and all(
            (ids_p[b, :len_p[b]] == ids_x[b, :len_x[b]]).all()
            for b in range(batch))
        dt_p = _timeit(pal, lp, lens, iters=4)
        dt_x = _timeit(xla, lp, lens, iters=4)
        print(json.dumps({
            "beam_width": w,
            "pallas_audio_s_per_s": round(audio_s / dt_p, 1),
            "xla_audio_s_per_s": round(audio_s / dt_x, 1),
            "pallas_us_per_step": round(dt_p / t_frames * 1e6, 2),
            "xla_us_per_step": round(dt_x / t_frames * 1e6, 2),
            "identical_to_xla": same,
            "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
