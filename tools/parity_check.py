"""WER/log-prob parity harness vs the reference PyTorch stack.

Usage:
  python tools/parity_check.py --config <yaml> \
      --encoder-checkpoint JasperEncoder-STEP-N.pt \
      --decoder-checkpoint JasperDecoderForCTC-STEP-N.pt \
      [--audio-dir /root/reference/audio_samples] [--golden golden.json]

What it does (BASELINE.md "WER parity" target — the tooling exists even
though the reference's encoder checkpoint was stripped upstream):

1. Converts the reference .pt checkpoints (models/convert.py) and runs OUR
   featurizer+encoder+head on each wav.
2. Rebuilds the SAME network in plain PyTorch from the identical state_dict
   (the reference-semantics oracle used across tests/) and runs it on the
   identically-preprocessed features.
3. Reports per-file max |delta log-prob|, argmax agreement, and greedy
   transcripts from both stacks; optionally checks transcripts against a
   golden JSON {filename: text} and prints corpus WER/CER.

Exit code 1 if any |delta| exceeds --tol or transcripts disagree.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--encoder-checkpoint", required=True)
    ap.add_argument("--decoder-checkpoint", required=True)
    ap.add_argument("--audio-dir", default="/root/reference/audio_samples")
    ap.add_argument("--golden", help="JSON {filename: reference transcript}")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import jax.numpy as jnp

    from vietasr_tpu.audio.io import read_audio
    from vietasr_tpu.config import load_config
    from vietasr_tpu.frontend.features import make_featurizer
    from vietasr_tpu.models.convert import (load_torch_state_dict,
                                            variables_from_checkpoints)
    from vietasr_tpu.models.quartznet import quartznet_apply
    from vietasr_tpu.ops.greedy import greedy_transcripts
    from vietasr_tpu.train.metrics import word_error_rate

    import dataclasses
    import importlib.util

    cfg = load_config(args.config)
    variables = variables_from_checkpoints(
        args.encoder_checkpoint, args.decoder_checkpoint, cfg.encoder)
    featurize = jax.jit(make_featurizer(
        dataclasses.replace(cfg.featurizer, dither=0.0)))

    # torch oracle built from the SAME state_dict (reference semantics);
    # reuse the tested builder from the test suite
    spec = importlib.util.spec_from_file_location(
        "tconv", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "test_convert.py"))
    tconv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tconv)
    build_torch_encoder, torch_forward = (tconv.build_torch_encoder,
                                          tconv.torch_forward)

    enc_sd = load_torch_state_dict(args.encoder_checkpoint)
    dec_sd = load_torch_state_dict(args.decoder_checkpoint)
    tmodel = build_torch_encoder(cfg.encoder.blocks, cfg.encoder.feat_in)
    tmodel.load_state_dict(
        {k: torch.tensor(v) for k, v in enc_sd.items()
         if "num_batches" not in k}, strict=False)
    dec_w = dec_sd["decoder_layers.0.weight"][:, :, 0].T
    dec_b = dec_sd["decoder_layers.0.bias"]

    wavs = sorted(glob.glob(os.path.join(args.audio_dir, "*.wav")))
    golden = json.load(open(args.golden)) if args.golden else None
    failures = 0
    ours_txt, ref_txt, gold_txt = [], [], []
    for path in wavs:
        samples, _ = read_audio(path, target_sr=cfg.featurizer.sample_rate)
        sig = jnp.asarray(samples[None])
        lens = jnp.asarray(np.array([len(samples)], np.int32))
        feats, flens = featurize(sig, lens)
        lp, el, _ = quartznet_apply(variables, feats, flens,
                                    cfg=cfg.encoder)
        ours = np.asarray(lp[0, : int(el[0])])
        # torch path on identical features
        enc_out, t_lens = torch_forward(
            tmodel, cfg.encoder.blocks, np.asarray(feats),
            np.asarray(flens, np.int64))
        logits = enc_out[0, : int(t_lens[0])] @ dec_w + dec_b
        want = torch.log_softmax(torch.tensor(logits), -1).numpy()

        n = min(len(ours), len(want))
        delta = float(np.abs(ours[:n] - want[:n]).max())
        agree = float((ours[:n].argmax(-1) == want[:n].argmax(-1)).mean())
        our_text = greedy_transcripts(lp, el, cfg.labels)[0]
        ref_text = "".join(
            cfg.labels[i] for i in _collapse(want.argmax(-1),
                                             cfg.num_classes))
        status = "OK" if delta <= args.tol and our_text == ref_text else "FAIL"
        if status == "FAIL":
            failures += 1
        print(json.dumps({
            "file": os.path.basename(path), "max_delta": round(delta, 6),
            "argmax_agree": round(agree, 4), "ours": our_text,
            "torch_ref": ref_text, "status": status,
        }, ensure_ascii=False))
        ours_txt.append(our_text)
        ref_txt.append(ref_text)
        if golden is not None:
            gold_txt.append(golden.get(os.path.basename(path), ""))

    if golden is not None:
        print(json.dumps({
            "wer_vs_golden": word_error_rate(ours_txt, gold_txt),
            "cer_vs_golden": word_error_rate(ours_txt, gold_txt,
                                             use_cer=True),
        }, ensure_ascii=False))
    print(f"# {len(wavs) - failures}/{len(wavs)} files within tol",
          file=sys.stderr)
    return 1 if failures else 0


def _collapse(ids, blank):
    out, prev = [], None
    for i in ids:
        if i != prev and i != blank:
            out.append(int(i))
        prev = i
    return out


if __name__ == "__main__":
    sys.exit(main())
