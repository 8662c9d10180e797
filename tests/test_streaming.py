"""Chunked long-form inference: stitched log-probs must match the full-
utterance forward when the overlap covers the receptive field."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vietasr_tpu.config import (BlockConfig, DataConfig, EncoderConfig,
                                ModelConfig, SpecAugmentConfig)
from vietasr_tpu.frontend.features import FeaturizerConfig
from vietasr_tpu.streaming import (chunk_spans, encoder_stride,
                                   receptive_field_frames)


def test_receptive_field_vi_config():
    from vietasr_tpu.config import load_config

    cfg = load_config("/root/reference/configs/quartznet12x1_vi.yaml")
    rf = receptive_field_frames(cfg.encoder)
    # 33 + 2*(3*32 + 3*38 + 3*50 + 3*62 + 74) = 33 + 2*620 = 1273 mel frames
    assert rf == 1273
    assert encoder_stride(cfg.encoder) == 2


def test_chunk_spans_cover_everything():
    spans = chunk_spans(100_000, 32_000, 4_000)
    # kept regions tile [0, n) exactly, in order, without gaps
    covered = 0
    for start, stop, keep_from, keep_to in spans:
        assert start + keep_from == covered
        covered = start + keep_to
        assert stop - start <= 32_000
    assert covered == 100_000


def test_chunk_spans_short_audio_single_chunk():
    assert chunk_spans(5_000, 32_000, 4_000) == [(0, 5_000, 0, 5_000)]


class _FakeTranscriber:
    """Minimal stand-in with a tiny real model (small receptive field)."""

    def __init__(self):
        from vietasr_tpu.frontend.features import make_featurizer
        from vietasr_tpu.models import init_quartznet, quartznet_apply

        blocks = (
            BlockConfig(filters=16, repeat=1, kernel=9, stride=2,
                        residual=False, separable=True),
            BlockConfig(filters=16, repeat=1, kernel=7, residual=True,
                        separable=True),
            BlockConfig(filters=24, repeat=1, kernel=1, residual=False),
        )
        # no normalization -> chunking is exact given enough overlap
        feat = FeaturizerConfig(features=16, dither=0.0, normalize="",
                                pad_to=1)
        self.cfg = ModelConfig(
            name="t", labels=["a", "b", "c"], featurizer=feat,
            encoder=EncoderConfig(blocks=blocks, feat_in=16),
            spec_augment=SpecAugmentConfig(), data=DataConfig())
        self.variables = init_quartznet(jax.random.PRNGKey(0),
                                        self.cfg.encoder, 3)
        self._featurize = make_featurizer(feat)
        self._apply = quartznet_apply
        self._decoder = None

    class opts:
        max_batch = 4

    def log_probs(self, signal, lengths=None, *, as_numpy=True):
        if signal.ndim == 1:
            signal = signal[None]
        if lengths is None:
            lengths = np.full((signal.shape[0],), signal.shape[1], np.int32)
        feats, flens = self._featurize(
            jnp.asarray(signal),
            jnp.asarray(np.asarray(lengths, np.int32)))
        lp, el, _ = self._apply(self.variables, feats, flens,
                                cfg=self.cfg.encoder)
        return np.asarray(lp), np.asarray(el)


def test_chunked_log_probs_match_full():
    t = _FakeTranscriber()
    rf = receptive_field_frames(t.cfg.encoder)
    assert rf < 50   # tiny model: 9 + 6*2 = 21 mel frames

    rng = np.random.RandomState(0)
    sr = 16000
    signal = (rng.randn(sr * 6) * 0.1).astype(np.float32)

    full_lp, full_len = t.log_probs(signal)
    full = full_lp[0, : int(full_len[0])]

    from vietasr_tpu.streaming import long_form_log_probs

    stitched, total = long_form_log_probs(
        t, signal, chunk_seconds=2.0, overlap_seconds=0.5)
    assert abs(total - full.shape[0]) <= 1
    n = min(total, full.shape[0])
    # interior frames must match closely (boundary effects only at stitch
    # points, which the overlap absorbs for this small receptive field)
    diff = np.abs(stitched[:n] - full[:n]).max()
    assert diff < 1e-3, diff


def test_8khz_longform_call_center_path(tmp_path):
    """BASELINE config 4: 8 kHz call-center audio -> resample -> chunked
    long-form transcription, end to end through the pipeline."""
    from vietasr_tpu.audio.io import resample
    from vietasr_tpu.pipeline import Transcriber

    t = Transcriber("/root/reference/configs/quartznet12x1_vi.yaml")
    rng = np.random.RandomState(3)
    sig_8k = (rng.randn(8000 * 25) * 0.05).astype(np.float32)  # 25 s @ 8 kHz
    sig = resample(sig_8k, 8000, 16000)
    assert abs(len(sig) - 16000 * 25) < 10
    out = t.transcribe_long(sig, chunk_seconds=10.0, overlap_seconds=1.0)
    assert isinstance(out, str)


def test_transcribe_long_through_pipeline(tmp_path):
    """End-to-end: Transcriber.transcribe_long on 40 s of audio (beyond the
    largest bucket) runs and returns a string."""
    import dataclasses

    from vietasr_tpu.pipeline import Transcriber

    t = Transcriber("/root/reference/configs/quartznet12x1_vi.yaml")
    rng = np.random.RandomState(1)
    long_sig = (rng.randn(16000 * 40) * 0.05).astype(np.float32)
    out = t.transcribe_long(long_sig, chunk_seconds=10.0,
                            overlap_seconds=1.0)
    assert isinstance(out, str)


def test_fused_longform_matches_grouped():
    """The single-dispatch fused program must produce the same stitched
    posterior (and frame count) as the grouped multi-dispatch path."""
    from vietasr_tpu.streaming import (_longform_grid, _longform_program,
                                       chunk_spans, long_form_log_probs)

    t = _FakeTranscriber()
    rng = np.random.RandomState(4)
    signal = (rng.randn(16000 * 7) * 0.1).astype(np.float32)

    want, want_total = long_form_log_probs(
        t, signal, chunk_seconds=2.0, overlap_seconds=0.5)

    chunk, overlap, _ = _longform_grid(t, 2.0, 0.5)
    spans = chunk_spans(len(signal), chunk, overlap)
    assert len(spans) > 2
    step = chunk - 2 * overlap
    n_pad = (len(spans) - 1) * step + chunk
    flat = np.zeros((n_pad,), np.float32)
    flat[: len(signal)] = signal
    last_len = len(signal) - (len(spans) - 1) * step
    fn = _longform_program(t, len(spans), chunk, overlap, want_lp=True)
    got, got_total = fn(t.variables, jnp.asarray(flat), jnp.int32(last_len))
    got = np.asarray(got)
    assert int(got_total) == want_total
    np.testing.assert_allclose(got[:want_total], want[:want_total],
                               rtol=0, atol=2e-5)


def test_fused_longform_transcribe_equals_grouped_decode():
    """Transcriber.transcribe_long (fused branch) == greedy decode of the
    grouped stitched posterior, end to end on the real vi config."""
    from vietasr_tpu.ops.greedy import ctc_collapse, ids_to_text
    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions
    from vietasr_tpu.streaming import long_form_log_probs

    t = Transcriber(
        "/root/reference/configs/quartznet12x1_vi.yaml",
        options=TranscriberOptions(compute_dtype=None))
    rng = np.random.RandomState(6)
    sig = (rng.randn(16000 * 23) * 0.05).astype(np.float32)
    got = t.transcribe_long(sig, chunk_seconds=10.0, overlap_seconds=1.0)

    lp, total = long_form_log_probs(t, sig, chunk_seconds=10.0,
                                    overlap_seconds=1.0)
    ids = ctc_collapse(np.argmax(lp[:total], -1),
                       blank=t.cfg.num_classes)
    assert got == ids_to_text(ids, t.cfg.labels)


@pytest.mark.slow
def test_transcribe_long_batch_matches_individual():
    """Pipelined batch API must return exactly what per-utterance calls do
    (incl. the fallback for a short single-chunk utterance)."""
    from vietasr_tpu.pipeline import Transcriber

    t = Transcriber("/root/reference/configs/quartznet12x1_vi.yaml")
    rng = np.random.RandomState(8)
    sigs = [(rng.randn(16000 * s) * 0.05).astype(np.float32)
            for s in (23, 31, 5)]
    got = t.transcribe_long_batch(sigs, chunk_seconds=10.0,
                                  overlap_seconds=1.0)
    want = [t.transcribe_long(s, chunk_seconds=10.0, overlap_seconds=1.0)
            for s in sigs]
    assert got == want


def test_fused_longform_native_rate_int16_matches_host_path():
    """8 kHz int16 PCM through the fused device resample+convert path must
    match host-side resample-to-float then transcribe_long."""
    from vietasr_tpu.audio.io import resample
    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions

    t = Transcriber(
        "/root/reference/configs/quartznet12x1_vi.yaml",
        options=TranscriberOptions(compute_dtype=None))
    rng = np.random.RandomState(12)
    pcm = (rng.randn(8000 * 23) * 1500).astype(np.int16)
    got = t.transcribe_long(pcm, chunk_seconds=10.0, overlap_seconds=1.0,
                            signal_sr=8000)
    host = resample(pcm.astype(np.float32) / 32768.0, 8000, 16000)
    want = t.transcribe_long(host, chunk_seconds=10.0, overlap_seconds=1.0)
    assert got == want

    # batch API, mixed rates/dtypes in one call
    batch = t.transcribe_long_batch([pcm, pcm], signal_sr=8000,
                                    chunk_seconds=10.0, overlap_seconds=1.0)
    assert batch == [want, want]
