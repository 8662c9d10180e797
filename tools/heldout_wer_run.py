"""Held-out WER: prove the training stack GENERALIZES, not memorizes.

Round-2's real-speech evidence was a memorization check (13 wavs, WER 0
on the training set — docs/real_speech_training.md). The reference is a
system trained on ~100 h that generalizes (/root/reference/README.md:21).
No corpus ships in this image, so this tool manufactures one from the 13
bundled REAL Vietnamese wavs, the way VERDICT r2 item 4 prescribes:

1. `align`  — train QuartzNet12x1_vi to memorization on the 13 wavs
   (pseudo-transcripts, tools/real_speech_run.py), then greedy-decode
   each wav with the trained model and cut WORD-level audio segments at
   the model's own emission boundaries (CTC alignment; encoder frame =
   2 x 10 ms). Memorization is exactly what makes the alignments usable.
2. `corpus` — recombine the word cuts into NOVEL utterances (3-8 words,
   30-80 ms silence gaps): disjoint TRAIN (default 240, with speed/gain/
   white-noise perturbations via audio/augment.py) and HELD-OUT (default
   48, clean, word sequences never seen in training) manifests. Every
   word token appears in training; every held-out SEQUENCE (and its
   co-articulation/padding context) is new.
3. `train`  — train a model FROM SCRATCH on the synthetic train split
   (any config: quartznet, conformer conv2d/stack, streaming conformer).
4. `eval`   — held-out WER/CER through the offline batch pipeline, and,
   for chunked-causal configs, through the REAL-TIME streaming runtime
   (ConformerOnlineTranscriber) — the offline-vs-streaming quality gap
   on a trained model.

Match: reference trained-system claim README.md:21; eval aggregation
helpers.py:175-204. Usage (each phase resumable, TPU recommended):

    python tools/heldout_wer_run.py --phase align
    python tools/heldout_wer_run.py --phase corpus
    python tools/heldout_wer_run.py --phase train --config <yaml> --tag conv2d
    python tools/heldout_wer_run.py --phase eval  --config <yaml> --tag conv2d
"""

import argparse
import glob
import json
import os
import struct
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIO_DIR = "/root/reference/audio_samples"
QN_CONFIG = "/root/reference/configs/quartznet12x1_vi.yaml"
SR = 16000


def _write_wav(path: str, sig: np.ndarray) -> None:
    pcm = np.clip(sig * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())


# ---------------------------------------------------------------------------
# phase: align — memorize the 13 wavs, cut word segments at CTC emissions


def phase_align(work_dir: str, epochs: int) -> None:
    from tools.real_speech_run import build_manifest
    from vietasr_tpu.cli import main as cli_main

    align_dir = os.path.join(work_dir, "align")
    manifest = build_manifest(align_dir)
    # --augment is LOAD-BEARING for alignment quality: a model that fits
    # the 13 wavs under random per-read time-warps (speed 0.9-1.1x) must
    # anchor its CTC emissions to LOCAL acoustics — a clean-input
    # memorizer's emission timing is arbitrary (nothing constrains WHERE
    # a memorized transcript is emitted), which made round-3/4 word cuts
    # acoustically meaningless (the align model recognized 0/24 of its
    # own cuts; every downstream model degenerated to the prior word).
    rc = cli_main([
        "train", "--config", QN_CONFIG,
        "--train-manifest", manifest, "--eval-manifest", manifest,
        "--work-dir", align_dir, "--batch-size", "13",
        "--num-epochs", str(epochs), "--optimizer", "novograd",
        "--lr", "0.02", "--lr-policy", "CosineAnnealing",
        "--warmup-steps", str(epochs // 10),
        "--augment", "speed,gain,noise",
        "--compute-dtype", "bfloat16", "--log-every", "50",
        "--eval-every", str(max(epochs // 4, 1)),
        "--checkpoint-every", str(max(epochs // 2, 1)),
    ])
    if rc:
        sys.exit(rc)
    cut_words(work_dir)


def _frame_chars(trained, sig):
    """Greedy per-frame char ids (blank = -1) from the trained model."""
    lp, lens = trained.log_probs(sig)
    ids = np.argmax(lp[0, : int(lens[0])], axis=-1)
    blank = trained.cfg.num_classes
    return np.where(ids == blank, -1, ids)


def _load_transcriber(config: str, run_dir: str):
    """Transcriber from a work-dir checkpoint (CheckpointManager layout)."""
    import jax

    from vietasr_tpu.config import load_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions
    from vietasr_tpu.train import CheckpointManager

    cfg = load_config(config)
    template = model_init(jax.random.PRNGKey(0), cfg)
    variables = CheckpointManager(run_dir).restore_variables(template)
    if variables is None:
        raise FileNotFoundError(f"no checkpoints in {run_dir}")
    return Transcriber(config, variables=variables,
                       options=TranscriberOptions(compute_dtype=None))


def cut_words(work_dir: str) -> None:
    """Cut word audio segments at the memorized model's emission bounds."""
    from vietasr_tpu.audio.io import read_audio

    align_dir = os.path.join(work_dir, "align")
    manifest = os.path.join(align_dir, "real_speech_manifest.json")
    with open(manifest, encoding="utf-8") as f:
        entries = [json.loads(l) for l in f]
    t = _load_transcriber(QN_CONFIG, align_dir)
    space = t.cfg.labels.index(" ")
    samples_per_frame = 160 * 2          # hop x encoder stride

    bank = []                            # list of {text, wav, lo, hi}
    for e in entries:
        sig, _ = read_audio(e["audio_filepath"], target_sr=SR)
        chars = _frame_chars(t, sig)
        # word spans: frames of non-space emissions between space/None
        words = e["text"].split()
        spans, cur = [], []
        for f, c in enumerate(chars):
            if c < 0:
                continue
            if c == space:
                if cur:
                    spans.append((cur[0], cur[-1]))
                    cur = []
            else:
                cur.append(f)
        if cur:
            spans.append((cur[0], cur[-1]))
        if len(spans) != len(words):
            print(json.dumps({"skip_wav": e["audio_filepath"],
                              "words": len(words), "spans": len(spans)}))
            continue
        # CTC emissions LAG acoustics (the first char of a word spikes
        # well after its acoustic onset), so cutting at the emission
        # span itself clips every onset — round 4 verified even the
        # memorized align model recognizes 0/24 such cuts in isolation.
        # Cut instead at the MIDPOINTS between adjacent emission spans:
        # word i owns [mid(prev_end, start_i), mid(end_i, next_start)),
        # which keeps the full acoustic extent of each word.
        n_frames = len(chars)
        for k, (wtext, (f0, f1)) in enumerate(zip(words, spans)):
            lo_f = 0 if k == 0 else (spans[k - 1][1] + 1 + f0) / 2
            hi_f = n_frames if k == len(spans) - 1 \
                else (f1 + 1 + spans[k + 1][0]) / 2
            lo = max(0, int(lo_f * samples_per_frame))
            hi = min(len(sig), int(hi_f * samples_per_frame))
            bank.append({"text": wtext,
                         "wav": e["audio_filepath"],
                         "lo": int(lo), "hi": int(hi)})
    out = os.path.join(work_dir, "word_bank.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(bank, f, ensure_ascii=False)
    print(json.dumps({"word_bank": out, "n_words": len(bank),
                      "n_distinct": len({b['text'] for b in bank})},
                     ensure_ascii=False))


# ---------------------------------------------------------------------------
# phase: corpus — novel utterances from word cuts, train/heldout split


def phase_corpus(work_dir: str, n_train: int, n_heldout: int,
                 seed: int = 0) -> None:
    from vietasr_tpu.audio.io import read_audio

    with open(os.path.join(work_dir, "word_bank.json"),
              encoding="utf-8") as f:
        bank = json.load(f)
    wav_cache = {}

    def seg(b):
        if b["wav"] not in wav_cache:
            wav_cache[b["wav"]] = read_audio(b["wav"], target_sr=SR)[0]
        return wav_cache[b["wav"]][b["lo"] : b["hi"]]

    rng = np.random.RandomState(seed)
    # Both splits are written CLEAN. Round 3 baked one fixed augmented
    # waveform per train utterance into the files; 60 epochs over 1,440
    # FIXED waveforms let the 3M-param model memorize utterance-level
    # acoustics (diagnosed round 4: train WER 0.000, held-out WER 1.000).
    # Augmentation now happens ON THE FLY in the data layer
    # (cli train --augment speed,gain,noise), a fresh perturbation per
    # read, so no two epochs ever see the same waveform and the model has
    # to key on the word cuts themselves.

    seen = set()

    def make_utt():
        while True:
            n = rng.randint(3, 9)
            idx = rng.randint(0, len(bank), size=n)
            key = tuple(int(i) for i in idx)
            if key not in seen:
                seen.add(key)
                break
        parts, words = [], []
        for i in idx:
            parts.append(seg(bank[i]))
            parts.append(np.zeros(rng.randint(480, 1280), np.float32))
            words.append(bank[i]["text"])
        sig = np.concatenate(parts[:-1])
        text = " ".join(words)
        # CTC feasibility at 4x subsampling (conformer): the label string
        # needs >= L + adjacent-repeats output frames; pad tail silence
        # so every architecture can emit it (without this, short cuts
        # made whole batches infeasible for the 4x models and per-sample
        # masking threw those samples away). The 1.12 margin keeps the
        # utterance feasible even after an on-the-fly 1.1x speed-UP
        # shortens it.
        need = len(text) + sum(a == b for a, b in zip(text, text[1:])) + 8
        need_samples = int(need * 4 * 160 * 1.12)
        if len(sig) < need_samples:
            sig = np.concatenate(
                [sig, np.zeros(need_samples - len(sig), np.float32)])
        return sig, text

    for split, count in [("train", n_train), ("heldout", n_heldout)]:
        d = os.path.join(work_dir, split)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(work_dir, f"{split}_manifest.json")
        with open(path, "w", encoding="utf-8") as f:
            for i in range(count):
                sig, text = make_utt()
                wav = os.path.join(d, f"utt{i:04d}.wav")
                _write_wav(wav, sig)
                f.write(json.dumps(
                    {"audio_filepath": wav,
                     "duration": round(len(sig) / SR, 3),
                     "text": text}, ensure_ascii=False) + "\n")
        print(json.dumps({"manifest": path, "utts": count}))


# ---------------------------------------------------------------------------
# phase: train-dyn — fresh compositions EVERY read (nothing to memorize)


class DynamicCompositionDataset:
    """Duck-typed AudioTextDataset whose __getitem__ composes a FRESH
    word-cut utterance per read (new word sequence, gaps, speed/gain/
    noise). Utterance-level memorization becomes impossible — the only
    signal that predicts the transcript is the cut->word mapping, which
    is exactly what generalization to the held-out compositions needs.
    (The fixed-composition corpus lets a model key on the 1,440 known
    sequences; round 4's first run learned word COUNTS but no identity.)

    Bucketing contract (audio/dataset.py BucketBatcher): each index has a
    FIXED length budget; composition stops while the post-augmentation
    worst case still fits, so the static bucket shape never crops audio
    against its transcript."""

    def __init__(self, bank, tokenizer, *, seed: int, size: int,
                 sample_rate: int = SR):
        from vietasr_tpu.audio.augment import (AudioAugmentor,
                                               GainPerturbation,
                                               SpeedPerturbation,
                                               WhiteNoisePerturbation)
        from vietasr_tpu.audio.io import read_audio
        from vietasr_tpu.audio.manifest import ManifestEntry

        self.bank = bank
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.rng = np.random.RandomState(seed)
        self.augment = AudioAugmentor(perturbations=[
            (1.0, SpeedPerturbation(0.9, 1.1, rng=self.rng)),
            (0.7, GainPerturbation(-6, 6, rng=self.rng)),
            (0.7, WhiteNoisePerturbation(-60, -38, rng=self.rng)),
        ], rng=self.rng)
        self._wav = {}
        self._read_audio = read_audio
        # fixed per-index length budgets spread over ~2-7s so buckets mix
        budgets = self.rng.uniform(2.0, 7.0, size=size)
        self.entries = [ManifestEntry("synthetic://dyn", float(b), "dyn")
                        for b in budgets]
        self.num_dropped = 0

    def __len__(self):
        return len(self.entries)

    def max_token_len(self):
        # worst case: budget filled with the shortest word's chars
        return 160

    def _seg(self, b):
        if b["wav"] not in self._wav:
            self._wav[b["wav"]] = self._read_audio(
                b["wav"], target_sr=self.sample_rate)[0]
        return self._wav[b["wav"]][b["lo"]: b["hi"]]

    def __getitem__(self, i):
        budget = int(self.entries[i].duration * self.sample_rate)
        parts, words, used = [], [], 0
        text = ""
        while True:
            j = self.rng.randint(0, len(self.bank))
            seg = self._seg(self.bank[j])
            gap = int(self.rng.randint(480, 1280))
            cand_text = (text + " " if text else "") + self.bank[j]["text"]
            need = (len(cand_text)
                    + sum(a == b for a, b in zip(cand_text, cand_text[1:]))
                    + 8) * 4 * 160
            # worst case after 0.9x speed slowdown must fit the budget,
            # including the CTC-feasibility tail pad
            cand_len = used + (gap if parts else 0) + len(seg)
            if max(cand_len, need) * 1.12 > budget:
                if words:
                    break
                continue        # budget too small for this word, redraw
            if parts:
                parts.append(np.zeros(gap, np.float32))
                used += gap
            parts.append(seg)
            used += len(seg)
            words.append(self.bank[j]["text"])
            text = cand_text
            if len(words) >= 8:
                break
        sig = np.concatenate(parts)
        sig = self.augment(sig, self.sample_rate).astype(np.float32)
        need = (len(text) + sum(a == b for a, b in zip(text, text[1:]))
                + 8) * 4 * 160
        if len(sig) < need:
            sig = np.concatenate([sig,
                                  np.zeros(need - len(sig), np.float32)])
        ids = self.tokenizer.encode(text)
        return sig, ids


def phase_train_dyn(work_dir: str, config: str, tag: str, steps: int,
                    batch_size: int, lr: float) -> None:
    """From-scratch training on the dynamic composer (fresh utterances
    every read; `steps` total optimizer steps)."""
    import jax

    from vietasr_tpu.audio import BucketBatcher, CharTokenizer
    from vietasr_tpu.config import load_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.train import (CheckpointManager, TrainState, Trainer,
                                   make_optimizer, make_schedule)

    with open(os.path.join(work_dir, "word_bank.json"),
              encoding="utf-8") as f:
        bank = json.load(f)
    cfg = load_config(config)
    tok = CharTokenizer(cfg.labels)
    ds = DynamicCompositionDataset(bank, tok, seed=0, size=batch_size * 64)
    batcher = BucketBatcher(ds, batch_size, max_duration=8.0,
                            bucket_margin=1.12)
    steps_per_epoch = max(batcher.steps_per_epoch(), 1)
    epochs = max(steps // steps_per_epoch, 1)
    schedule = make_schedule("CosineAnnealing", lr,
                             epochs * steps_per_epoch,
                             warmup_steps=steps // 20)
    opt = make_optimizer("novograd", schedule, weight_decay=0.001)
    state = TrainState.create(
        model_init(jax.random.PRNGKey(0), cfg), opt)
    run_dir = os.path.join(work_dir, f"run_{tag}")
    cm = CheckpointManager(run_dir, keep=4)
    restored = cm.restore(state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")
    # NO SpecAugment here: the reference's rect masks (5 x up-to-120
    # frames = 1.2 s) are tuned for long utterances where language
    # context recovers a masked word; this corpus's word sequences are
    # RANDOM, so a masked word is fundamentally unpredictable and
    # training plateaus at the masking entropy floor (diagnosed round 4:
    # loss flat at ~60-80 while decodes degenerate to the prior word).
    # The per-read waveform augmentation is the regularizer instead.
    trainer = Trainer(cfg=cfg, optimizer=opt, lr_schedule=schedule,
                      log_every=50, checkpoint_manager=cm,
                      checkpoint_every=max(steps // 4, 1),
                      compute_dtype="bfloat16", use_specaug=False)
    trainer.callbacks.append(
        lambda tr, m: print(json.dumps(m, ensure_ascii=False), flush=True))
    state = trainer.fit(state, batcher, num_epochs=epochs)
    cm.save(state)
    print(f"done at step {int(state.step)}")


# ---------------------------------------------------------------------------
# phase: train / eval on the synthetic corpus


def phase_train(work_dir: str, config: str, tag: str, epochs: int,
                batch_size: int, lr: float) -> None:
    from vietasr_tpu.cli import main as cli_main

    run_dir = os.path.join(work_dir, f"run_{tag}")
    rc = cli_main([
        "train", "--config", config,
        "--train-manifest", os.path.join(work_dir, "train_manifest.json"),
        "--eval-manifest", os.path.join(work_dir, "heldout_manifest.json"),
        "--work-dir", run_dir, "--batch-size", str(batch_size),
        "--num-epochs", str(epochs), "--optimizer", "novograd",
        "--lr", str(lr), "--lr-policy", "CosineAnnealing",
        "--warmup-steps", str(epochs), "--compute-dtype", "bfloat16",
        "--augment", "speed,gain,noise",     # on the fly, per read
        "--log-every", "50",
        "--eval-every", str(max(epochs // 4, 1)),
        "--checkpoint-every", str(max(epochs // 4, 1)),
    ])
    if rc:
        sys.exit(rc)


def phase_eval(work_dir: str, config: str, tag: str) -> None:
    import jax

    from vietasr_tpu.audio.io import read_audio
    from vietasr_tpu.config import load_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.ops.greedy import collapse_batch, greedy_decode, \
        ids_to_text
    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions
    from vietasr_tpu.streaming_conformer import ConformerOnlineTranscriber
    from vietasr_tpu.train import CheckpointManager
    from vietasr_tpu.train.metrics import word_error_rate

    run_dir = os.path.join(work_dir, f"run_{tag}")
    manifest = os.path.join(work_dir, "heldout_manifest.json")
    with open(manifest, encoding="utf-8") as f:
        entries = [json.loads(l) for l in f]
    refs = [e["text"] for e in entries]
    sigs = [read_audio(e["audio_filepath"], target_sr=SR)[0]
            for e in entries]

    t = _load_transcriber(config, run_dir)
    hyps = [h.strip() for h in t.transcribe_batch(sigs)]
    out = {
        "tag": tag, "config": config, "heldout_utts": len(entries),
        "offline_wer": round(word_error_rate(hyps, refs), 4),
        "offline_cer": round(word_error_rate(hyps, refs, use_cer=True), 4),
    }

    # TRAIN-split WER on a sample (clean wavs, sequences seen in training):
    # separates "didn't converge" (both ~1.0) from "memorized but didn't
    # generalize" (train ~0, held-out ~1.0) — the round-3 study lacked
    # this and its failure mode was ambiguous
    with open(os.path.join(work_dir, "train_manifest.json"),
              encoding="utf-8") as f:
        tr_entries = [json.loads(l) for l in f][:64]
    tr_refs = [e["text"] for e in tr_entries]
    tr_sigs = [read_audio(e["audio_filepath"], target_sr=SR)[0]
               for e in tr_entries]
    tr_hyps = [h.strip() for h in t.transcribe_batch(tr_sigs)]
    out["train_wer"] = round(word_error_rate(tr_hyps, tr_refs), 4)

    cfg = load_config(config)
    is_streaming_conformer = (
        cfg.architecture == "conformer"
        and getattr(cfg.conformer, "chunk_size", 0))
    if is_streaming_conformer:
        template = model_init(jax.random.PRNGKey(0), cfg)
        variables = CheckpointManager(run_dir).restore_variables(template)
        ot = ConformerOnlineTranscriber(cfg, variables)
        cs = ot.required_chunk_samples
        s_hyps = []
        for sig in sigs:
            pad = (-len(sig)) % cs
            padded = np.concatenate([sig, np.zeros(pad, np.float32)])
            lp = ot.stream([padded[i:i + cs]
                            for i in range(0, len(padded), cs)])
            preds, keep = greedy_decode(
                lp[None], np.array([lp.shape[0]], np.int32),
                blank=len(cfg.labels))
            ids = collapse_batch(np.asarray(preds), np.asarray(keep))[0]
            s_hyps.append(ids_to_text(ids, cfg.labels).strip())
        out["streaming_wer"] = round(word_error_rate(s_hyps, refs), 4)
        out["streaming_cer"] = round(
            word_error_rate(s_hyps, refs, use_cer=True), 4)
    print(json.dumps(out, ensure_ascii=False))
    with open(os.path.join(work_dir, f"heldout_{tag}.json"), "w",
              encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False)


def main():
    from vietasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["align", "cut", "corpus", "train",
                             "train-dyn", "eval"])
    ap.add_argument("--steps", type=int, default=12000,
                    help="total optimizer steps for train-dyn")
    ap.add_argument("--work-dir", default="work/heldout")
    ap.add_argument("--config", default=QN_CONFIG)
    ap.add_argument("--tag", default="default")
    ap.add_argument("--align-epochs", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--n-train", type=int, default=1440)
    ap.add_argument("--n-heldout", type=int, default=64)
    args = ap.parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    if args.phase == "align":
        phase_align(args.work_dir, args.align_epochs)
    elif args.phase == "cut":
        cut_words(args.work_dir)
    elif args.phase == "corpus":
        phase_corpus(args.work_dir, args.n_train, args.n_heldout)
    elif args.phase == "train":
        phase_train(args.work_dir, args.config, args.tag, args.epochs,
                    args.batch_size, args.lr)
    elif args.phase == "train-dyn":
        phase_train_dyn(args.work_dir, args.config, args.tag, args.steps,
                        args.batch_size, args.lr)
    elif args.phase == "eval":
        phase_eval(args.work_dir, args.config, args.tag)


if __name__ == "__main__":
    main()
