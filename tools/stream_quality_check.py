"""Verify a TRAINED chunked-causal streaming Conformer end to end.

Closes the round-2 gap "trained streaming-conformer quality": after
`tools/real_speech_run.py --config configs/conformer_ctc_vi_streaming.yaml
--work-dir work/real_speech_streaming`
has trained the streaming model on the 13 bundled real wavs, this drives
the REAL-TIME runtime (streaming_conformer.ConformerOnlineTranscriber:
stateful featurizer with causal running-stats normalization + exact
chunk-at-a-time encoder) over each wav, greedy-decodes the streamed
log-probs, and reports streaming WER/CER against the training labels,
side by side with the offline batch decode of the same checkpoint.

The reference has no streaming encoder at all (its demo buffers whole
utterances, /root/reference/app.py:58-69); this shows the full
train -> checkpoint -> real-time-serve path working on real speech.

Usage:
    python tools/stream_quality_check.py \
        [--work-dir work/real_speech_streaming] \
        [--config configs/conformer_ctc_vi_streaming.yaml]

Prints one JSON summary line.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="work/real_speech_streaming")
    ap.add_argument("--config",
                    default="configs/conformer_ctc_vi_streaming.yaml")
    args = ap.parse_args()

    import jax

    from vietasr_tpu.audio.io import read_audio
    from vietasr_tpu.config import load_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.ops.greedy import collapse_batch, greedy_decode, \
        ids_to_text
    from vietasr_tpu.pipeline import Transcriber
    from vietasr_tpu.streaming_conformer import ConformerOnlineTranscriber
    from vietasr_tpu.train import CheckpointManager
    from vietasr_tpu.train.metrics import word_error_rate

    manifest = os.path.join(args.work_dir, "real_speech_manifest.json")
    if not os.path.exists(manifest):
        raise FileNotFoundError(
            f"{manifest} not found — train first with "
            f"tools/real_speech_run.py --config {args.config} "
            f"--work-dir {args.work_dir}")
    with open(manifest, encoding="utf-8") as f:
        entries = [json.loads(l) for l in f]

    cfg = load_config(args.config)
    template = model_init(jax.random.PRNGKey(0), cfg)
    variables = CheckpointManager(args.work_dir).restore_variables(template)
    if variables is None:
        raise FileNotFoundError(f"no checkpoints in {args.work_dir}")

    # real-time path: causal normalization (production serving semantics)
    ot = ConformerOnlineTranscriber(cfg, variables)
    cs = ot.required_chunk_samples

    refs, stream_hyps = [], []
    for e in entries:
        audio, _ = read_audio(e["audio_filepath"],
                              target_sr=cfg.featurizer.sample_rate)
        pad = (-len(audio)) % cs
        padded = np.concatenate([audio, np.zeros(pad, np.float32)])
        chunks = [padded[i:i + cs] for i in range(0, len(padded), cs)]
        lp = ot.stream(chunks)                      # (T_out, V+1)
        preds, keep = greedy_decode(
            lp[None], np.array([lp.shape[0]], np.int32),
            blank=len(cfg.labels))
        ids = collapse_batch(np.asarray(preds), np.asarray(keep))[0]
        stream_hyps.append(ids_to_text(ids, cfg.labels).strip())
        refs.append(e["text"])

    # offline batch path, same checkpoint (exactness vs streaming is
    # unit-tested; this is the trained-model end-to-end cross-check)
    t = Transcriber(args.config, variables=variables)
    offline_hyps = [t.transcribe(read_audio(
        e["audio_filepath"], target_sr=cfg.featurizer.sample_rate)[0]).strip()
        for e in entries]

    summary = {
        "num_utts": len(entries),
        "streaming_wer": round(word_error_rate(stream_hyps, refs), 4),
        "streaming_cer": round(word_error_rate(stream_hyps, refs,
                                               use_cer=True), 4),
        "streaming_exact": sum(h == r for h, r in zip(stream_hyps, refs)),
        "offline_wer": round(word_error_rate(offline_hyps, refs), 4),
        "offline_exact": sum(h == r for h, r in zip(offline_hyps, refs)),
        "chunk_seconds": cs / cfg.featurizer.sample_rate,
    }
    print(json.dumps(summary, ensure_ascii=False))
    for r, s in zip(refs, stream_hyps):
        if r != s:
            print(json.dumps({"ref": r, "stream": s}, ensure_ascii=False))


if __name__ == "__main__":
    main()
