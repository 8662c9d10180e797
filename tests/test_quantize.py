"""Int8 post-training quantization of the QuartzNet pointwise convs
(models/quantize.py). The reference has no quantized serving path
(torch 1.8 CPU fp32, /root/reference/infer.py) — this is the TPU-native
extension that doubles the MXU rate of the dominant 1x1 GEMMs.

Checks: per-channel weight round-trip error bound, calibration tag
coverage, int8-vs-float forward agreement (argmax + log-prob bound),
grouped-conv sites staying float, and the Transcriber wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vietasr_tpu.config import BlockConfig, EncoderConfig
from vietasr_tpu.models.quantize import (calibrate_activations, int8_pw_fn,
                                         quantize_quartznet, quantize_weight,
                                         quantized_apply_fn)
from vietasr_tpu.models.quartznet import (fold_batchnorm, init_quartznet,
                                          quartznet_apply)


def small_cfg(groups=1):
    blocks = (
        BlockConfig(filters=32, repeat=1, kernel=7, stride=2,
                    residual=False, separable=True),
        BlockConfig(filters=64, repeat=2, kernel=5, residual=True,
                    separable=True, groups=groups),
        BlockConfig(filters=96, repeat=1, kernel=3, residual=False,
                    separable=True),
    )
    return EncoderConfig(blocks=blocks, feat_in=16, activation="relu")


def make_model(cfg, num_classes=8, seed=0):
    variables = init_quartznet(jax.random.PRNGKey(seed), cfg, num_classes)
    return fold_batchnorm(variables, cfg)


def make_feats(cfg, b=3, t=40, seed=1):
    rng = np.random.RandomState(seed)
    feats = rng.randn(b, t, cfg.feat_in).astype(np.float32)
    lens = np.array([t, t - 7, t // 2][:b], np.int32)
    return jnp.asarray(feats), jnp.asarray(lens)


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(48, 32).astype(np.float32) * np.exp(
        rng.randn(32))   # very different per-channel magnitudes
    w_i8, scale = quantize_weight(jnp.asarray(w))
    assert w_i8.dtype == jnp.int8
    deq = np.asarray(w_i8, np.float32) * np.asarray(scale)
    # symmetric per-out-channel: error <= scale/2 per element
    assert np.all(np.abs(deq - w) <= np.asarray(scale)[None, :] * 0.5 + 1e-7)


def test_calibration_covers_every_pointwise_site():
    cfg = small_cfg()
    variables = make_model(cfg)
    feats, lens = make_feats(cfg)
    amax = calibrate_activations(variables, cfg, feats, lens,
                                 compute_dtype=None)
    want = {"enc0.sub0", "enc1.sub0", "enc1.sub1", "enc1.res0",
            "enc2.sub0", "dec"}
    assert set(amax) == want
    assert all(v > 0 for v in amax.values())
    tables = quantize_quartznet(variables, cfg, amax)
    assert set(tables) == want


def test_int8_forward_close_to_float():
    cfg = small_cfg()
    variables = make_model(cfg)
    feats, lens = make_feats(cfg, b=3, t=64)
    amax = calibrate_activations(variables, cfg, feats, lens,
                                 compute_dtype=None)
    tables = quantize_quartznet(variables, cfg, amax)

    lp_f, lens_f, _ = quartznet_apply(variables, feats, lens, cfg=cfg)
    lp_q, lens_q, _ = quartznet_apply(variables, feats, lens, cfg=cfg,
                                      pw_fn=int8_pw_fn(tables))
    np.testing.assert_array_equal(np.asarray(lens_f), np.asarray(lens_q))
    lp_f, lp_q = np.asarray(lp_f), np.asarray(lp_q)
    # int8 on a random-init model: argmax should agree nearly everywhere
    agree = (lp_f.argmax(-1) == lp_q.argmax(-1)).mean()
    assert agree > 0.95, agree
    assert np.max(np.abs(lp_f - lp_q)) < 0.35, np.max(np.abs(lp_f - lp_q))


def test_int8_jit_and_apply_fn():
    cfg = small_cfg()
    variables = make_model(cfg)
    feats, lens = make_feats(cfg)
    amax = calibrate_activations(variables, cfg, feats, lens,
                                 compute_dtype=jnp.bfloat16)
    tables = quantize_quartznet(variables, cfg, amax)
    fn = jax.jit(quantized_apply_fn(variables, cfg, tables))
    lp, out_lens = fn(feats, lens)
    assert lp.shape[-1] == 9
    assert np.all(np.isfinite(np.asarray(lp)))
    # log-softmax rows normalize
    np.testing.assert_allclose(
        np.exp(np.asarray(lp, np.float64)).sum(-1), 1.0, atol=1e-2)


def test_grouped_pointwise_stays_float():
    cfg = small_cfg(groups=2)
    variables = make_model(cfg)
    feats, lens = make_feats(cfg)
    amax = calibrate_activations(variables, cfg, feats, lens,
                                 compute_dtype=None)
    # block 1's grouped subs route through dense_conv1d -> never tagged
    assert "enc1.sub0" not in amax and "enc1.sub1" not in amax
    tables = quantize_quartznet(variables, cfg, amax)
    assert "enc1.sub0" not in tables
    # and the quantized forward still runs (float fallback at those sites)
    lp, _, _ = quartznet_apply(variables, feats, lens, cfg=cfg,
                               pw_fn=int8_pw_fn(tables))
    assert np.all(np.isfinite(np.asarray(lp)))


@pytest.mark.slow
def test_transcriber_calibrate_int8(tmp_path):
    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions

    tr = Transcriber(
        "/root/reference/configs/quartznet12x1_vi.yaml",
        options=TranscriberOptions(buckets_seconds=(1.0,), max_batch=2,
                                   compute_dtype=None))
    rng = np.random.RandomState(0)
    wave = (rng.randn(12000) * 0.1).astype(np.float32)
    lp_f, _ = tr.log_probs(wave)
    tr.calibrate_int8([wave])
    assert tr._q_tables, "calibration produced no tables"
    lp_q, _ = tr.log_probs(wave)
    # random-init logits are near-uniform so exact transcripts are
    # brittle; the contract is per-frame posterior agreement
    agree = (lp_f.argmax(-1) == lp_q.argmax(-1)).mean()
    assert agree > 0.9, agree
    assert isinstance(tr.transcribe(wave), str)
