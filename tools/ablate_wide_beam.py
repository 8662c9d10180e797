"""Per-section timing of the wide-beam kernel via compile-time ablations.

Each variant compiles the kernel with one section stubbed (semantics
intentionally broken — timing only); baseline minus variant = section
cost. Drives the W=100 optimization work (VERDICT r3 item 1).
"""
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bench import SECONDS, SR, VI_CORPUS, _timeit, wait_for_quiet_chip
from vietasr_tpu.config import load_config
from vietasr_tpu.ops.lm import NGramLM, train_ngram_arpa, word_lm_tables
from vietasr_tpu.ops.pallas_beam import dense_lm_from_tables, \
    pallas_beam_search


def main():
    from vietasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    w = int(os.environ.get("BEAM_W", "100"))
    batch = 128
    cfg = load_config("/root/reference/configs/quartznet12x1_vi.yaml")
    arpa = os.path.join(tempfile.mkdtemp(), "vi_word.arpa")
    train_ngram_arpa(VI_CORPUS, arpa, order=3, char_level=False)
    tables, _ = word_lm_tables(NGramLM(arpa), cfg.labels)
    unk = float(np.asarray(tables.unk_logp))
    dense = dense_lm_from_tables(tables, unk)
    space = cfg.labels.index(" ")
    v1 = cfg.num_classes + 1
    t_frames = (SECONDS * SR // 160 + 1) // 2

    rng = np.random.RandomState(0)
    logits = rng.randn(batch, t_frames, v1).astype(np.float32) * 2.0
    lp = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
    lens = jnp.asarray(np.full((batch,), t_frames, np.int32))

    canary = wait_for_quiet_chip()
    print(json.dumps({"canary_tfs": round(canary, 1), "w": w}), flush=True)

    base = None
    for ablate in [v.replace("+", ",") for v in
                   os.environ.get("ABLATE_LIST",
                                  "|merge|thresh|psel|lm|body").split("|")]:
        def run(lp, lens, a=ablate):
            return pallas_beam_search(
                lp, lens, blank=cfg.num_classes, beam_width=w,
                cutoff_top_n=8, space=space, alpha=0.5, beta=1.5,
                dense_lm=dense, unk_logp=unk, ablate=a)

        dt = _timeit(run, lp, lens, iters=4)
        us = dt / t_frames * 1e6
        if ablate == "":
            base = us
        print(json.dumps({"ablate": ablate or "(none)",
                          "us_per_step": round(us, 1),
                          "section_cost_us": round(base - us, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
