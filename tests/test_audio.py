"""Audio I/O, manifest, dataset/bucketing tests on real bundled wavs."""

import glob
import json
import os

import numpy as np
import pytest

from vietasr_tpu.audio import (
    AudioSegment,
    AudioTextDataset,
    BucketBatcher,
    CharTokenizer,
    read_audio,
    read_manifest,
    resample,
    trim_silence,
)
from vietasr_tpu.audio.augment import (
    AudioAugmentor,
    GainPerturbation,
    ShiftPerturbation,
    SpeedPerturbation,
    WhiteNoisePerturbation,
)

SAMPLES = sorted(glob.glob("/root/reference/audio_samples/*.wav"))
LABELS = [' ', 'a', 'b', 'c', 'd', 'e', 'g', 'h', 'i', 'k', 'l', 'm', 'n',
          'o', 'p', 'q', 'r', 's', 't', 'u', 'v', 'x', 'y']


def test_read_real_wavs():
    for p in SAMPLES[:3]:
        samples, sr = read_audio(p)
        assert sr == 16000
        assert samples.dtype == np.float32
        assert -1.0 <= samples.min() and samples.max() <= 1.0
        assert len(samples) > 1000


def test_resample_preserves_tone():
    sr, target = 8000, 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    up = resample(tone, sr, target)
    assert abs(len(up) - 2 * sr) <= 2
    # dominant frequency must still be 440 Hz
    spec = np.abs(np.fft.rfft(up))
    peak_hz = np.argmax(spec) * target / len(up)
    assert abs(peak_hz - 440) < 2


def test_trim_silence():
    sr = 16000
    sig = np.zeros(sr, np.float32)
    sig[6000:10000] = np.random.RandomState(0).randn(4000).astype(np.float32)
    trimmed = trim_silence(sig, top_db=40)
    assert len(trimmed) < len(sig)
    assert len(trimmed) >= 4000


def test_mp3_garbage_raises_clear_error(tmp_path):
    # A 2-byte sync with no decodable frame: decode must fail loudly,
    # not return silence (full round-trip fidelity lives in test_mp3.py).
    p = tmp_path / "x.mp3"
    p.write_bytes(b"\xff\xfb")
    with pytest.raises((NotImplementedError, ValueError)):
        read_audio(str(p))


@pytest.fixture
def manifest(tmp_path):
    entries = []
    for i, p in enumerate(SAMPLES[:6]):
        samples, sr = read_audio(p)
        entries.append({"audio_filepath": p, "duration": len(samples) / sr,
                        "text": "xin chao" if i % 2 else "a b c"})
    mpath = tmp_path / "manifest.json"
    with open(mpath, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return str(mpath)


def test_manifest_roundtrip_and_filters(manifest):
    all_entries = read_manifest(manifest)
    assert len(all_entries) == 6
    short = read_manifest(manifest, max_duration=3.0)
    assert 0 < len(short) <= 6
    assert read_manifest.last_filtered_duration >= 0
    srt = read_manifest(manifest, sort_by_duration=True)
    durs = [e.duration for e in srt]
    assert durs == sorted(durs)


def test_dataset_and_bucket_batcher(manifest):
    tok = CharTokenizer(LABELS)
    entries = read_manifest(manifest)
    ds = AudioTextDataset(entries, tok, sample_rate=16000)
    assert len(ds) == 6
    batcher = BucketBatcher(ds, batch_size=2, max_duration=16.7, seed=0)
    batches = list(batcher)
    assert batches
    seen = 0
    for b in batches:
        assert b.signal.shape[0] <= 2
        assert b.signal.dtype == np.float32
        # bucket length is one of the fixed bucket sizes
        assert b.signal.shape[1] in batcher.buckets
        assert (b.signal_lens <= b.signal.shape[1]).all()
        assert (b.token_lens > 0).sum() == (b.signal_lens > 0).sum()
        seen += int((b.signal_lens > 0).sum())
    assert seen == 6
    # static shapes: few distinct (bucket, batch) shapes
    shapes = {b.signal.shape for b in batches}
    assert len(shapes) <= len(batcher.buckets) + 2


def test_batcher_steps_per_epoch_matches_iteration(manifest):
    # the analytic count must equal the real yield count (num_shards=1),
    # for both partial-batch modes — LR schedules are sized from it
    tok = CharTokenizer(LABELS)
    ds = AudioTextDataset(read_manifest(manifest), tok, sample_rate=16000)
    for drop_last in (False, True):
        b = BucketBatcher(ds, batch_size=2, max_duration=16.7, seed=3,
                          drop_last=drop_last)
        assert b.steps_per_epoch() == sum(1 for _ in b), drop_last
    # and it must exceed the naive len//batch_size when bucketing splits
    b13 = BucketBatcher(ds, batch_size=6, max_duration=16.7, seed=0)
    assert b13.steps_per_epoch() >= max(len(ds) // 6, 1)


def test_batcher_sharding(manifest):
    tok = CharTokenizer(LABELS)
    ds = AudioTextDataset(read_manifest(manifest), tok)
    n0 = sum(int((b.signal_lens > 0).sum()) for b in BucketBatcher(
        ds, 2, shard_id=0, num_shards=2, shuffle=False))
    n1 = sum(int((b.signal_lens > 0).sum()) for b in BucketBatcher(
        ds, 2, shard_id=1, num_shards=2, shuffle=False))
    assert n0 + n1 == 6


def test_dataset_drops_unmappable(manifest):
    tok = CharTokenizer(["a", "b"])   # most texts unmappable
    ds = AudioTextDataset(read_manifest(manifest), tok)
    assert ds.num_dropped > 0


def test_augmentor_pipeline():
    rng = np.random.RandomState(0)
    sig = rng.randn(16000).astype(np.float32) * 0.1
    aug = AudioAugmentor([
        (1.0, GainPerturbation(min_gain_dbfs=6, max_gain_dbfs=6)),
        (1.0, WhiteNoisePerturbation()),
        (1.0, ShiftPerturbation()),
    ])
    out = aug(sig.copy(), 16000)
    assert out.shape == sig.shape
    assert not np.allclose(out, sig)


def test_speed_perturbation_changes_length():
    sig = np.random.RandomState(1).randn(16000).astype(np.float32)
    sp = SpeedPerturbation(min_speed_rate=1.2, max_speed_rate=1.2)
    seg = AudioSegment(samples=sig, sample_rate=16000)
    sp.perturb(seg)
    assert abs(len(seg.samples) - 16000 / 1.2) < 100


def test_pitch_shift_moves_dominant_frequency():
    """+12 semitones doubles the dominant frequency of a pure tone while
    preserving duration (phase-vocoder stretch + resample — the reference
    README TODO 'pitch shift')."""
    from vietasr_tpu.audio.augment import PitchPerturbation, pitch_shift

    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    up = pitch_shift(tone, 12.0, sample_rate=sr)
    assert len(up) == len(tone)

    def dom_freq(x):
        spec = np.abs(np.fft.rfft(x[2000:-2000] * np.hanning(len(x) - 4000)))
        return np.argmax(spec) * sr / (len(x) - 4000)

    assert abs(dom_freq(tone) - 440.0) < 5
    assert abs(dom_freq(up) - 880.0) < 15

    # identity at 0 steps; registry pathway works
    same = pitch_shift(tone, 0.0, sample_rate=sr)
    np.testing.assert_allclose(same, tone, atol=1e-6)
    from vietasr_tpu.audio.augment import AudioAugmentor
    aug = AudioAugmentor.from_config(
        [{"aug_type": "pitch", "prob": 1.0,
          "cfg": {"min_steps": -1.0, "max_steps": 1.0}}])
    out = aug(tone, sr)
    assert out.shape == tone.shape and np.isfinite(out).all()
