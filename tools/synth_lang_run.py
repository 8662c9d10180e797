"""Synthetic-language generalization study: the controlled instrument.

WHY THIS EXISTS. The reference is a system trained on ~100 h that
transcribes unseen speech (/root/reference/README.md:21). This image
ships 13 supervised Vietnamese utterances and no corpus, so "train a
model that generalizes" must be manufactured. Rounds 3-4 tried
word-recombination corpora cut from the 13 wavs THREE ways (baked
augmentation; per-read augmentation; augmentation-anchored alignment
with midpoint cuts) — all failed, and the final diagnosis is
structural: any model trained on 13 utterances is an utterance-level
memorizer, so its CTC alignments never become word-anchored and the
word cuts are acoustically arbitrary (the align model replays its 13
memorized phrases for ANY input — docs/heldout_wer.md keeps the trail).

This tool removes the unobtainable ingredient (trustworthy alignments)
by synthesizing the audio itself: a LAWFUL acoustic code where each
character of the real Vietnamese label inventory maps to a fixed
formant-pair signature (92-way distinct), words are concatenations,
utterances are word sequences with silence gaps. The TRAINING STACK
UNDER TEST IS UNCHANGED — manifest/dynamic data layer, per-read
speed/gain/noise augmentation, featurizer, QuartzNet/Conformer, CTC,
Novograd + cosine, checkpointing, greedy/beam decode. Generalization is
real: training composes FRESH word sequences every read; evaluation is
64 fixed held-out sequences never seen in training. A stack that
cheats (leaks lengths, breaks masking, misaligns labels) fails this
study exactly like it would fail on speech.

Usage:
    python tools/synth_lang_run.py --phase corpus        # heldout wavs
    python tools/synth_lang_run.py --phase train --config <yaml> --tag t
    python tools/synth_lang_run.py --phase eval  --config <yaml> --tag t
"""

import argparse
import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QN_CONFIG = "/root/reference/configs/quartznet12x1_vi.yaml"
SR = 16000

# vocabulary: real Vietnamese words (chars all inside the 91-label
# inventory), same corpus the bench word-LM uses
WORDS = sorted(set(" ".join([
    "xin chào các bạn", "bản tin thời sự hôm nay", "chào mừng quý vị",
    "tin tức trong ngày", "cảm ơn các bạn đã lắng nghe",
    "thời tiết hà nội hôm nay", "chúc các bạn một ngày tốt lành",
    "đây là đài tiếng nói việt nam", "tin thể thao quốc tế",
    "giá xăng dầu trong nước", "tình hình giao thông buổi sáng",
    "xin kính chào quý vị và các bạn", "bản tin cuối ngày",
    "chương trình ca nhạc theo yêu cầu", "dự báo thời tiết ngày mai",
]).split()))


def _char_wave(ci: int, sr: int = SR) -> np.ndarray:
    """Deterministic formant-pair signature for label index `ci` (v1).

    Two sinusoids on an (F1, F2) grid + a weak octave harmonic, with an
    attack/decay envelope; durations vary 70-110 ms by a char hash so
    length alone cannot identify a character sequence's timing.

    KNOWN DEFECT (kept for the study record, round 5): the grids are
    LINEAR — f1 spacing 62 Hz up to 776 Hz, f2 spacing 135 Hz up to
    2570 Hz — so at the top of each grid the spacing is < 10% of the
    center frequency, while training applies ±10% SPEED perturbation
    which scales every frequency. Char identity is therefore absolutely
    ambiguous: char A at rate 1.1 lands on char B at rate 1.0, and
    identity is only recoverable from utterance-GLOBAL speed context
    (which a large-receptive-field conv stack learned, heldout WER
    0.035, but the conformer plateaued on — docs/heldout_wer.md)."""
    h = (ci * 2654435761) & 0xFFFFFFFF
    dur = 0.07 + 0.04 * ((h >> 8) % 7) / 6.0
    n = int(dur * sr)
    t = np.arange(n) / sr
    f1 = 280.0 + 62.0 * (ci % 9)
    f2 = 950.0 + 135.0 * ((ci // 9) % 13)
    env = np.minimum(np.minimum(t / 0.012, (dur - t) / 0.02), 1.0)
    x = (0.55 * np.sin(2 * np.pi * f1 * t)
         + 0.35 * np.sin(2 * np.pi * f2 * t)
         + 0.10 * np.sin(2 * np.pi * 2 * f1 * t))
    return (0.25 * x * np.clip(env, 0.0, 1.0)).astype(np.float32)


def _char_wave_v2(ci: int, sr: int = SR) -> np.ndarray:
    """Speed-robust broadband signature for label index `ci` (v2).

    v2 codes identity ONLY in attributes that survive the ±10% per-read
    speed perturbation (which scales all frequencies and durations):

      - f1, f2 on LOG grids with ratio-1.35 spacing — adjacent points
        stay disjoint under any rate pair in [0.9, 1.1] (non-overlap
        bound: 1.1/0.9 = 1.222 < 1.35)
      - chirp DIRECTION of f2 (down/flat/up, ±12% over the char) —
        sign is scale-invariant; the onset frequency stays on-grid
      - a char-gated NOISE BAND at 5.0-6.4 kHz (above the whole warped
        f2 range) — presence is scale-invariant and broadband

    5 × 5 × 3 × 2 = 150 ≥ 92 distinct codes. Envelope and hash-varied
    duration as v1."""
    h = (ci * 2654435761) & 0xFFFFFFFF
    dur = 0.07 + 0.04 * ((h >> 8) % 7) / 6.0
    n = int(dur * sr)
    t = np.arange(n) / sr
    i1 = ci % 5
    i2 = (ci // 5) % 5
    chirp = (ci // 25) % 3 - 1
    noise_on = (ci // 75) % 2
    f1 = 300.0 * 1.35 ** i1                      # 300 .. 997 Hz
    f2 = 1200.0 * 1.35 ** i2                     # 1200 .. 3986 Hz
    env = np.clip(np.minimum(np.minimum(t / 0.012, (dur - t) / 0.02),
                             1.0), 0.0, 1.0)
    # instantaneous f2 frequency: f2 * (1 + 0.12 * chirp * t / dur)
    phase2 = 2 * np.pi * f2 * (t + 0.12 * chirp * t * t / (2 * dur))
    x = (0.45 * np.sin(2 * np.pi * f1 * t)
         + 0.35 * np.sin(phase2)
         + 0.10 * np.sin(2 * np.pi * 2 * f1 * t))
    if noise_on:
        rng = np.random.RandomState((ci * 7919 + 13) & 0x7FFFFFFF)
        spec = np.fft.rfft(rng.randn(n))
        freqs = np.fft.rfftfreq(n, 1.0 / sr)
        spec[(freqs < 5000.0) | (freqs > 6400.0)] = 0.0
        band = np.fft.irfft(spec, n)
        band /= max(float(np.sqrt(np.mean(band ** 2))), 1e-9)
        x = x + 0.18 * band
    return (0.25 * x * env).astype(np.float32)


def make_bank(labels, sig: str = "v2"):
    """word -> waveform for every vocabulary word."""
    wave_fn = {"v1": _char_wave, "v2": _char_wave_v2}[sig]
    lab_idx = {c: i for i, c in enumerate(labels)}
    bank = {}
    for w in WORDS:
        if any(c not in lab_idx for c in w):
            continue
        bank[w] = np.concatenate([wave_fn(lab_idx[c]) for c in w])
    return bank


class SynthDynamicDataset:
    """Fresh word-sequence composition per read (the train-dyn pattern
    from tools/heldout_wer_run.py, over synthesized word audio), with
    per-read speed/gain/noise augmentation. `exclude` holds the held-out
    word sequences, which are never generated."""

    def __init__(self, bank, tokenizer, *, seed: int, size: int,
                 exclude=(), sample_rate: int = SR,
                 aug=("speed", "gain", "noise")):
        from vietasr_tpu.audio.augment import (AudioAugmentor,
                                               GainPerturbation,
                                               SpeedPerturbation,
                                               WhiteNoisePerturbation)
        from vietasr_tpu.audio.manifest import ManifestEntry

        self.words = sorted(bank)
        self.bank = bank
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.exclude = set(exclude)
        self.rng = np.random.RandomState(seed)
        perturbations = []
        if "speed" in aug:
            perturbations.append((1.0, SpeedPerturbation(0.9, 1.1,
                                                         rng=self.rng)))
        if "gain" in aug:
            perturbations.append((0.7, GainPerturbation(-6, 6,
                                                        rng=self.rng)))
        if "noise" in aug:
            perturbations.append((0.7, WhiteNoisePerturbation(-60, -38,
                                                              rng=self.rng)))
        self.augment = AudioAugmentor(perturbations=perturbations,
                                      rng=self.rng)
        budgets = self.rng.uniform(2.0, 6.0, size=size)
        self.entries = [ManifestEntry("synthetic://lang", float(b), "dyn")
                        for b in budgets]
        self.num_dropped = 0

    def __len__(self):
        return len(self.entries)

    def max_token_len(self):
        return 160

    def compose(self, budget_samples: int, rng):
        while True:
            parts, words, used = [], [], 0
            text = ""
            while True:
                w = self.words[rng.randint(0, len(self.words))]
                seg = self.bank[w]
                gap = int(rng.randint(480, 1280))
                cand = (text + " " if text else "") + w
                need = (len(cand)
                        + sum(a == b for a, b in zip(cand, cand[1:]))
                        + 8) * 4 * 160
                cand_len = used + (gap if parts else 0) + len(seg)
                if max(cand_len, need) * 1.12 > budget_samples:
                    if words:
                        break
                    continue
                if parts:
                    parts.append(np.zeros(gap, np.float32))
                    used += gap
                parts.append(seg)
                used += len(seg)
                words.append(w)
                text = cand
                if len(words) >= 8:
                    break
            if tuple(words) not in self.exclude:
                return np.concatenate(parts), text

    def __getitem__(self, i):
        budget = int(self.entries[i].duration * self.sample_rate)
        sig, text = self.compose(budget, self.rng)
        sig = self.augment(sig, self.sample_rate).astype(np.float32)
        need = (len(text) + sum(a == b for a, b in zip(text, text[1:]))
                + 8) * 4 * 160
        if len(sig) < need:
            sig = np.concatenate([sig,
                                  np.zeros(need - len(sig), np.float32)])
        ids = self.tokenizer.encode(text)
        return sig, ids


def _write_wav(path, sig):
    pcm = np.clip(sig * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())


def heldout_sequences(bank, n, seed=123):
    """Fixed held-out word sequences (clean, no augmentation)."""
    words = sorted(bank)
    rng = np.random.RandomState(seed)
    out = []
    seen = set()
    while len(out) < n:
        k = rng.randint(3, 8)
        seq = tuple(words[rng.randint(0, len(words))] for _ in range(k))
        if seq in seen:
            continue
        seen.add(seq)
        out.append(seq)
    return out


def phase_corpus(work_dir, n_heldout, labels, sig="v2"):
    bank = make_bank(labels, sig)
    seqs = heldout_sequences(bank, n_heldout)
    d = os.path.join(work_dir, "heldout")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(7)
    path = os.path.join(work_dir, "heldout_manifest.json")
    with open(path, "w", encoding="utf-8") as f:
        for i, seq in enumerate(seqs):
            parts = []
            for w in seq:
                parts.append(bank[w])
                parts.append(np.zeros(rng.randint(480, 1280), np.float32))
            text = " ".join(seq)
            wave_arr = np.concatenate(parts[:-1])
            need = (len(text) + sum(a == b for a, b in
                                    zip(text, text[1:])) + 8) * 4 * 160
            if len(wave_arr) < need:
                wave_arr = np.concatenate(
                    [wave_arr, np.zeros(need - len(wave_arr), np.float32)])
            wav = os.path.join(d, f"utt{i:04d}.wav")
            _write_wav(wav, wave_arr)
            f.write(json.dumps({"audio_filepath": wav,
                                "duration": round(len(wave_arr) / SR, 3),
                                "text": text}, ensure_ascii=False) + "\n")
    print(json.dumps({"manifest": path, "utts": len(seqs),
                      "vocab": len(bank), "signatures": sig}))


def _write_traindist(work_dir, bank, n, exclude):
    """64 CLEAN utterances drawn from the TRAIN distribution (fresh
    compositions, heldout sequences excluded, no augmentation): the
    'train-split WER' cell of the study matrix — under dynamic
    composition it separates didn't-converge from didn't-generalize."""
    path = os.path.join(work_dir, "traindist_manifest.json")
    if os.path.exists(path):
        return path
    d = os.path.join(work_dir, "traindist")
    os.makedirs(d, exist_ok=True)
    from vietasr_tpu.audio import CharTokenizer

    tok = CharTokenizer([c for c in sorted({c for w in bank for c in w})])
    ds = SynthDynamicDataset(bank, tok, seed=999, size=n, exclude=exclude,
                             aug=())
    rng = np.random.RandomState(999)
    with open(path, "w", encoding="utf-8") as f:
        for i in range(n):
            sig_arr, text = ds.compose(int(ds.entries[i].duration * SR),
                                       rng)
            wav = os.path.join(d, f"utt{i:04d}.wav")
            _write_wav(wav, sig_arr)
            f.write(json.dumps({"audio_filepath": wav,
                                "duration": round(len(sig_arr) / SR, 3),
                                "text": text}, ensure_ascii=False) + "\n")
    return path


def phase_train(work_dir, config, tag, steps, batch_size, lr,
                optimizer="novograd", warmup=None, dropout=None,
                aug=("speed", "gain", "noise"), sig="v2",
                normalize=None, num_blocks=None):
    import dataclasses

    import jax

    from vietasr_tpu.audio import BucketBatcher, CharTokenizer
    from vietasr_tpu.config import load_config, save_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.train import (CheckpointManager, TrainState, Trainer,
                                   make_optimizer, make_schedule)

    cfg = load_config(config)
    if dropout is not None and cfg.conformer is not None:
        cfg = dataclasses.replace(
            cfg, conformer=dataclasses.replace(cfg.conformer,
                                               dropout=dropout))
    if num_blocks is not None and cfg.conformer is not None:
        cfg = dataclasses.replace(
            cfg, conformer=dataclasses.replace(cfg.conformer,
                                               num_blocks=num_blocks))
    if normalize is not None:
        cfg = dataclasses.replace(
            cfg, featurizer=dataclasses.replace(cfg.featurizer,
                                                normalize=normalize))
    run_dir = os.path.join(work_dir, f"run_{tag}")
    os.makedirs(run_dir, exist_ok=True)
    if dropout is not None or normalize is not None \
            or num_blocks is not None:
        # emit the patched config so eval/serving read the SAME model
        config = os.path.join(run_dir, "config.yaml")
        save_config(cfg, config)
    with open(os.path.join(run_dir, "meta.json"), "w") as f:
        json.dump({"config": config, "tag": tag, "signatures": sig,
                   "aug": list(aug), "steps": steps, "lr": lr,
                   "optimizer": optimizer, "warmup": warmup,
                   "dropout": dropout, "normalize": normalize,
                   "num_blocks": num_blocks,
                   "batch_size": batch_size}, f)
    tok = CharTokenizer(cfg.labels)
    bank = make_bank(cfg.labels, sig)
    exclude = set(heldout_sequences(bank, 64))
    ds = SynthDynamicDataset(bank, tok, seed=0, size=batch_size * 64,
                             exclude=exclude, aug=aug)
    batcher = BucketBatcher(ds, batch_size, max_duration=7.0,
                            bucket_margin=1.12)
    steps_per_epoch = max(batcher.steps_per_epoch(), 1)
    epochs = max(steps // steps_per_epoch, 1)
    schedule = make_schedule("CosineAnnealing", lr,
                             epochs * steps_per_epoch,
                             warmup_steps=warmup or steps // 20)
    opt = make_optimizer(optimizer, schedule, weight_decay=0.001,
                         grad_clip_norm=5.0)
    state = TrainState.create(model_init(jax.random.PRNGKey(0), cfg), opt)
    cm = CheckpointManager(run_dir, keep=4)
    restored = cm.restore(state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")
    # SpecAugment off: random word sequences have no linguistic context
    # to recover a masked word from (see tools/heldout_wer_run.py)
    trainer = Trainer(cfg=cfg, optimizer=opt, lr_schedule=schedule,
                      log_every=50, checkpoint_manager=cm,
                      checkpoint_every=max(steps // 4, 1),
                      compute_dtype="bfloat16", use_specaug=False)
    log_path = os.path.join(run_dir, "train_log.jsonl")

    def _log_metric(tr, m):
        line = json.dumps(m, ensure_ascii=False)
        print(line, flush=True)
        with open(log_path, "a", encoding="utf-8") as lf:
            lf.write(line + "\n")

    trainer.callbacks.append(_log_metric)
    state = trainer.fit(state, batcher, num_epochs=epochs)
    cm.save(state)
    print(f"done at step {int(state.step)}")


def _greedy_text(lp, labels):
    from vietasr_tpu.ops.greedy import collapse_batch, greedy_decode, \
        ids_to_text

    preds, keep = greedy_decode(lp[None],
                                np.array([lp.shape[0]], np.int32),
                                blank=len(labels))
    ids = collapse_batch(np.asarray(preds), np.asarray(keep))[0]
    return ids_to_text(ids, labels).strip()


def _streaming_decode(cfg, run_dir, sigs):
    """Per-utterance transcripts through the REAL-TIME runtime for the
    checkpoint: chunked-causal attention for streaming Conformer configs,
    the ring-buffer streamer (causal per-frame norm) for QuartzNet."""
    import jax

    from vietasr_tpu.models import model_init
    from vietasr_tpu.train import CheckpointManager

    template = model_init(jax.random.PRNGKey(0), cfg)
    variables = CheckpointManager(run_dir).restore_variables(template)
    hyps = []
    if cfg.architecture == "conformer":
        if not getattr(cfg.conformer, "chunk_size", 0):
            return None
        from vietasr_tpu.streaming_conformer import \
            ConformerOnlineTranscriber

        ot = ConformerOnlineTranscriber(cfg, variables)
        cs = ot.required_chunk_samples
        for sig in sigs:
            pad = (-len(sig)) % cs
            padded = np.concatenate([sig, np.zeros(pad, np.float32)])
            lp = ot.stream([padded[i:i + cs]
                            for i in range(0, len(padded), cs)],
                           true_samples=len(sig))
            hyps.append(_greedy_text(lp, cfg.labels))
        return hyps
    from vietasr_tpu.models.quartznet import fold_batchnorm
    from vietasr_tpu.streaming_online import OnlineTranscriber

    ot = OnlineTranscriber(cfg, fold_batchnorm(variables, cfg.encoder),
                           causal_norm=True)
    cs = 3200                                # 0.2 s, multiple of 2*hop
    for sig in sigs:
        pad = (-len(sig)) % cs
        padded = np.concatenate([sig, np.zeros(pad, np.float32)])
        # true_samples: the reflect tail splices at the TRUE utterance
        # end; zero-feature pad steps drain the RF/2 lookahead (offline
        # padding semantics — wire padding fed as audio degrades WER,
        # docs/heldout_wer.md)
        lp = ot.stream([padded[i:i + cs]
                        for i in range(0, len(padded), cs)],
                       true_samples=len(sig))
        hyps.append(_greedy_text(lp, cfg.labels))
    return hyps


def phase_eval(work_dir, config, tag, sig="v2"):
    from tools.heldout_wer_run import _load_transcriber
    from vietasr_tpu.audio.io import read_audio
    from vietasr_tpu.config import load_config
    from vietasr_tpu.train.metrics import word_error_rate

    run_dir = os.path.join(work_dir, f"run_{tag}")
    meta = {}
    meta_path = os.path.join(run_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        config = meta.get("config", config)
        sig = meta.get("signatures", sig)
    cfg = load_config(config)

    bank = make_bank(cfg.labels, sig)
    exclude = set(heldout_sequences(bank, 64))
    traindist_manifest = _write_traindist(work_dir, bank, 64, exclude)

    out = {"tag": tag, "config": config, "signatures": sig, "meta": meta}
    t = _load_transcriber(config, run_dir)
    for split, manifest in (
            ("heldout", os.path.join(work_dir, "heldout_manifest.json")),
            ("traindist", traindist_manifest)):
        with open(manifest, encoding="utf-8") as f:
            entries = [json.loads(l) for l in f]
        refs = [e["text"] for e in entries]
        sigs = [read_audio(e["audio_filepath"], target_sr=SR)[0]
                for e in entries]
        hyps = [h.strip() for h in t.transcribe_batch(sigs)]
        out[f"{split}_utts"] = len(entries)
        out[f"{split}_offline_wer"] = round(word_error_rate(hyps, refs), 4)
        out[f"{split}_offline_cer"] = round(
            word_error_rate(hyps, refs, use_cer=True), 4)
        s_hyps = _streaming_decode(cfg, run_dir, sigs)
        if s_hyps is not None:
            out[f"{split}_streaming_wer"] = round(
                word_error_rate(s_hyps, refs), 4)
            out[f"{split}_streaming_cer"] = round(
                word_error_rate(s_hyps, refs, use_cer=True), 4)
    # back-compat aliases (round-4 artifact schema)
    out["offline_wer"] = out["heldout_offline_wer"]
    out["offline_cer"] = out["heldout_offline_cer"]
    print(json.dumps(out, ensure_ascii=False))
    art_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "study")
    os.makedirs(art_dir, exist_ok=True)
    for d in (work_dir, art_dir):
        with open(os.path.join(d, f"synth_{tag}.json"), "w",
                  encoding="utf-8") as f:
            json.dump(out, f, ensure_ascii=False, indent=1)
    # committed loss-curve artifact alongside the result row
    log_path = os.path.join(run_dir, "train_log.jsonl")
    if os.path.exists(log_path):
        import shutil

        shutil.copy(log_path, os.path.join(art_dir,
                                           f"train_{tag}.jsonl"))


def main():
    from vietasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["corpus", "train", "eval"])
    ap.add_argument("--work-dir", default="work/synthlang")
    ap.add_argument("--config", default=QN_CONFIG)
    ap.add_argument("--tag", default="qn")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--n-heldout", type=int, default=64)
    ap.add_argument("--optimizer", default="novograd")
    ap.add_argument("--warmup", type=int, default=None)
    ap.add_argument("--dropout", type=float, default=None)
    ap.add_argument("--aug", default="speed,gain,noise",
                    help="comma list of per-read perturbations "
                         "(subset of speed,gain,noise; empty = clean)")
    ap.add_argument("--sig", default="v2", choices=["v1", "v2"],
                    help="char signature family (v1 narrowband formant "
                         "pairs; v2 speed-robust broadband)")
    ap.add_argument("--normalize", default=None,
                    help="featurizer normalize override (e.g. "
                         "causal_per_feature for streaming-matched "
                         "training)")
    ap.add_argument("--num-blocks", type=int, default=None,
                    help="conformer depth override")
    args = ap.parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    if args.phase == "corpus":
        from vietasr_tpu.config import load_config

        phase_corpus(args.work_dir, args.n_heldout,
                     load_config(args.config).labels, args.sig)
    elif args.phase == "train":
        aug = tuple(a for a in args.aug.split(",") if a)
        phase_train(args.work_dir, args.config, args.tag, args.steps,
                    args.batch_size, args.lr, args.optimizer, args.warmup,
                    args.dropout, aug, args.sig, args.normalize,
                    args.num_blocks)
    elif args.phase == "eval":
        phase_eval(args.work_dir, args.config, args.tag, args.sig)


if __name__ == "__main__":
    main()
