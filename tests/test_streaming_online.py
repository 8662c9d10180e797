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
    cfg, variables = small_model(normalize="")
    ot = OnlineTranscriber(cfg, variables, causal_norm=False)

    rng = np.random.RandomState(0)
    sr = 16000
    signal = (rng.randn(sr * 3) * 0.1).astype(np.float32)

    # streaming over 0.2 s chunks (3200 samples, multiple of 2*hop)
    chunk = 3200
    chunks = [signal[i:i + chunk] for i in range(0, len(signal), chunk)]
    stream_lp = ot.stream(chunks, drop_prefix=False)

    # offline on the zero-context-prefixed signal (what streaming computes);
    # the prefix must be a hop multiple to keep the frame grid aligned
    hop = cfg.featurizer.hop_length
    z_len = -(-ot._audio_carry // hop) * hop
    want = offline_log_probs(
        cfg, variables,
        np.concatenate([np.zeros(z_len, np.float32), signal]))

    # Find the alignment on the steady-state tail (the first
    # `prefix_frames` differ by design: the zero carry stands in for
    # offline's silence-mel boundary values and those frames are dropped
    # by the public API), then require EXACT match beyond the prefix.
    best_off, best_err = None, np.inf
    for off in range(-16, 16):
        a = stream_lp[max(0, -off):]
        b = want[max(0, off):]
        m = min(len(a), len(b))
        if m < 60:
            continue
        err = np.abs(a[m - 50:m - 10] - b[m - 50:m - 10]).max()
        if err < best_err:
            best_off, best_err = off, err
    assert best_err < 1e-4, (best_off, best_err)
    a = stream_lp[max(0, -best_off):]
    b = want[max(0, best_off):]
    m = min(len(a), len(b))
    exact_from = ot.prefix_frames
    err_steady = np.abs(a[exact_from:m] - b[exact_from:m]).max()
    assert err_steady < 1e-4, err_steady

    # public API: prefix dropped -> aligns with audible content
    dropped = ot.stream(chunks)
    assert len(dropped) == len(stream_lp) - ot.prefix_frames


def test_online_prefix_formula():
    cfg, variables = small_model()
    ot = OnlineTranscriber(cfg, variables)
    # featurizer junk + ceil((j+half)/stride) cascade
    j = (ot._audio_carry - 256) // 160 + 1
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
    offline = np.asarray(_normalize(
        jnp.asarray(raw)[None], jnp.asarray([raw.shape[0]], np.int32),
        "causal_per_feature"))[0]
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-4)


def test_causal_per_feature_numpy_reference():
    """Offline causal mode == per-frame loop over prefix stats."""
    import jax.numpy as jnp

    from vietasr_tpu.frontend.features import STD_GUARD, _normalize

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
            std = np.sqrt(var) + STD_GUARD
            np.testing.assert_allclose(got[b, t], (x[b, t] - mean) / std,
                                       rtol=2e-4, atol=2e-4)
