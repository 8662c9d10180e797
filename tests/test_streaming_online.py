"""Stateful online streaming: emitted log-probs must EXACTLY match the
offline forward of the zero-context-prefixed signal (normalize disabled so
the only legitimate deviation — causal running norm — is out of the way)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vietasr_tpu.config import (BlockConfig, DataConfig, EncoderConfig,
                                ModelConfig, SpecAugmentConfig)
from vietasr_tpu.frontend.features import FeaturizerConfig, make_featurizer
from vietasr_tpu.models import fold_batchnorm, init_quartznet, quartznet_apply
from vietasr_tpu.streaming_online import OnlineTranscriber


def small_model(normalize="", labels=("a", "b", "c")):
    blocks = (
        BlockConfig(filters=16, repeat=1, kernel=9, stride=2, residual=False,
                    separable=True),
        BlockConfig(filters=16, repeat=1, kernel=7, residual=True,
                    separable=True),
        BlockConfig(filters=24, repeat=1, kernel=5, residual=True,
                    separable=True),
        BlockConfig(filters=32, repeat=1, kernel=1, residual=False),
    )
    feat = FeaturizerConfig(features=16, dither=0.0, normalize=normalize,
                            pad_to=1)
    cfg = ModelConfig(
        name="s", labels=list(labels), featurizer=feat,
        encoder=EncoderConfig(blocks=blocks, feat_in=16),
        spec_augment=SpecAugmentConfig(), data=DataConfig())
    variables = fold_batchnorm(
        init_quartznet(jax.random.PRNGKey(0), cfg.encoder, len(labels)),
        cfg.encoder)
    return cfg, variables


def offline_log_probs(cfg, variables, signal):
    featurize = make_featurizer(cfg.featurizer)
    feats, flens = featurize(
        jnp.asarray(signal[None]),
        jnp.asarray(np.array([len(signal)], np.int32)))
    lp, el, _ = quartznet_apply(variables, feats, flens, cfg=cfg.encoder)
    return np.asarray(lp[0, : int(el[0])])


def test_online_matches_offline_exactly():
    """Round-5 contract UPGRADE: the streamed output (prefix dropped,
    flush=True) equals the offline forward of THE AUDIO ITSELF — not of
    a zero-prefixed surrogate. Three mechanisms make this exact: the
    reflect-filled audio carry (boundary frame values), per-layer
    masking of pre-audio/pad-step positions (offline conv_mask
    semantics), and the zero-feature flush (offline right padding)."""
    cfg, variables = small_model(normalize="")
    ot = OnlineTranscriber(cfg, variables, causal_norm=False)

    rng = np.random.RandomState(0)
    sr = 16000
    signal = (rng.randn(sr * 3) * 0.1).astype(np.float32)

    chunk = 3200
    chunks = [signal[i:i + chunk] for i in range(0, len(signal), chunk)]
    stream_lp = ot.stream(chunks, flush=True)

    want = offline_log_probs(cfg, variables, signal)
    m = min(len(stream_lp), len(want))
    assert m >= len(want) - 1          # flush drains ~all offline frames
    err = np.abs(stream_lp[:m] - want[:m]).max()
    assert err < 1e-4, err

    # without flush: the emitted frames still match offline's prefix
    nf = ot.stream(chunks)
    m2 = min(len(nf), len(want))
    assert np.abs(nf[:m2] - want[:m2]).max() < 1e-4


def test_online_causal_matches_offline_causal():
    """Same contract WITH normalization: causal_per_feature offline ==
    causal streamer (matched stats, the serving configuration the synth
    study trains)."""
    cfg, variables = small_model(normalize="causal_per_feature")
    ot = OnlineTranscriber(cfg, variables, causal_norm=True)
    rng = np.random.RandomState(5)
    signal = (rng.randn(16000 * 2) * 0.1).astype(np.float32)
    chunks = [signal[i:i + 3200] for i in range(0, len(signal), 3200)]
    stream_lp = ot.stream(chunks, flush=True)
    want = offline_log_probs(cfg, variables, signal)
    m = min(len(stream_lp), len(want))
    assert m >= len(want) - 1
    err = np.abs(stream_lp[:m] - want[:m]).max()
    assert err < 5e-4, err


def test_online_prefix_formula():
    cfg, variables = small_model()
    ot = OnlineTranscriber(cfg, variables)
    # featurizer junk (ceil fencepost, round-5 fix) + the
    # ceil((j+half)/stride) cascade
    j = -(-(ot._audio_carry - 256) // 160)
    for b in cfg.encoder.blocks:
        j = -(-(j + (b.effective_kernel - 1) // 2) // b.stride)
    assert ot.prefix_frames == j
    assert ot.prefix_frames > 0


def test_online_causal_norm_stable():
    cfg, variables = small_model(normalize="per_feature")
    ot = OnlineTranscriber(cfg, variables, causal_norm=True)
    rng = np.random.RandomState(1)
    signal = (rng.randn(16000) * 0.1).astype(np.float32)
    chunks = [signal[i:i + 3200] for i in range(0, len(signal), 3200)]
    lp = ot.stream(chunks)
    assert np.isfinite(lp).all()


def test_online_full_vi_model_runs():
    """The real 15-block config streams (smoke, 1 s of audio)."""
    from vietasr_tpu.config import load_config

    cfg = load_config("/root/reference/configs/quartznet12x1_vi.yaml")
    variables = fold_batchnorm(
        init_quartznet(jax.random.PRNGKey(0), cfg.encoder, cfg.num_classes),
        cfg.encoder)
    ot = OnlineTranscriber(cfg, variables)
    assert ot.prefix_frames == pytest.approx(319, abs=2)
    rng = np.random.RandomState(2)
    signal = (rng.randn(16000) * 0.1).astype(np.float32)
    chunks = [signal[i:i + 3200] for i in range(0, 16000, 3200)]
    lp = ot.stream(chunks, drop_prefix=False)
    assert lp.shape[1] == 91
    assert np.isfinite(lp).all()


def test_causal_norm_offline_matches_streaming_formula():
    """normalize="causal_per_feature" (offline, features._normalize) and
    the StreamingFeaturizer causal path compute IDENTICAL statistics on
    identical frame sequences: run the streamer with causal_norm=False,
    normalize its raw emitted frames through the offline mode, and
    compare against the causal_norm=True streamer output."""
    import jax.numpy as jnp

    from vietasr_tpu.config import load_config
    from vietasr_tpu.frontend.features import _normalize
    from vietasr_tpu.streaming_online import StreamingFeaturizer

    fc = load_config("/root/reference/configs/quartznet12x1_vi.yaml") \
        .featurizer
    rng = np.random.RandomState(3)
    signal = (rng.randn(3 * 3200) * 0.1).astype(np.float32)
    chunks = [signal[i:i + 3200] for i in range(0, len(signal), 3200)]

    def run(causal):
        sf = StreamingFeaturizer(fc, causal_norm=causal)
        fields = sf.init_fields()
        outs = []
        for c in chunks:
            fields, out = sf.step(fields, jnp.asarray(c))
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=0)

    raw = run(False)
    streamed = run(True)
    # the streamer EXCLUDES its first junk_frames (zero-carry outliers)
    # from the running stats, so streamed[j + t] is normalized over raw
    # frames j..j+t — i.e. the offline causal normalization of the
    # post-junk subsequence
    j = StreamingFeaturizer(fc, causal_norm=False).junk_frames
    offline = np.asarray(_normalize(
        jnp.asarray(raw[j:])[None],
        jnp.asarray([raw.shape[0] - j], np.int32),
        "causal_per_feature"))[0]
    np.testing.assert_allclose(streamed[j:], offline, rtol=1e-4, atol=1e-4)


def test_causal_per_feature_numpy_reference():
    """Offline causal mode == per-frame loop over prefix stats."""
    import jax.numpy as jnp

    from vietasr_tpu.frontend.features import CAUSAL_STD_GUARD, _normalize

    rng = np.random.RandomState(4)
    x = rng.randn(2, 9, 5).astype(np.float32) * 3.0 + 1.0
    lens = np.array([9, 6], np.int32)
    got = np.asarray(_normalize(jnp.asarray(x), jnp.asarray(lens),
                                "causal_per_feature"))
    for b in range(2):
        for t in range(lens[b]):
            pre = x[b, : t + 1]
            mean = pre.mean(axis=0)
            var = pre.var(axis=0) * ((t + 1) / max(t, 1))
            std = np.sqrt(var) + CAUSAL_STD_GUARD
            np.testing.assert_allclose(got[b, t], (x[b, t] - mean) / std,
                                       rtol=2e-4, atol=2e-4)


def test_true_samples_matches_offline_midchunk_end():
    """Utterances ending mid-chunk: stream(..., true_samples=N) equals
    the offline forward of the UNPADDED audio — the reflect tail splices
    at the true end instead of treating wire padding as audio (which
    measurably degrades decodes, docs/heldout_wer.md)."""
    cfg, variables = small_model(normalize="causal_per_feature")
    ot = OnlineTranscriber(cfg, variables, causal_norm=True)
    rng = np.random.RandomState(11)
    n_true = 16000 * 2 + 4487              # ends mid-chunk, off-grid
    signal = (rng.randn(n_true) * 0.1).astype(np.float32)
    cs = 3200
    pad = (-n_true) % cs
    padded = np.concatenate([signal, np.zeros(pad, np.float32)])
    chunks = [padded[i:i + cs] for i in range(0, len(padded), cs)]
    stream_lp = ot.stream(chunks, true_samples=n_true)
    want = offline_log_probs(cfg, variables, signal)
    m = min(len(stream_lp), len(want))
    assert m >= len(want) - 1
    err = np.abs(stream_lp[:m] - want[:m]).max()
    assert err < 5e-4, err
