"""Conformer-CTC tests: relative-shift correctness, forward shapes/lengths,
bf16 path, YAML dispatch, and synthetic-task training convergence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vietasr_tpu.config import ConformerConfig, load_config
from vietasr_tpu.models import model_apply, model_init
from vietasr_tpu.models.conformer import (_rel_pos_encoding, _rel_shift,
                                          conformer_apply, init_conformer)

CONFIG = "/root/repo/configs/conformer_ctc_vi.yaml"


def test_rel_shift_matches_gather():
    rng = np.random.RandomState(0)
    b, h, t = 2, 3, 7
    x = rng.randn(b, h, t, 2 * t - 1).astype(np.float32)
    got = np.asarray(_rel_shift(jnp.asarray(x)))
    # want[b,h,i,j] = x[b,h,i, (t-1) - i + j]  (offset r = i - j at index
    # l = t-1-r in the [t-1 ... -(t-1)] offset ordering)
    want = np.empty((b, h, t, t), np.float32)
    for i in range(t):
        for j in range(t):
            want[:, :, i, j] = x[:, :, i, (t - 1) - i + j]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rel_pos_encoding_shape():
    enc = _rel_pos_encoding(5, 8)
    assert enc.shape == (9, 8)
    # offset 0 row: sin(0)=0, cos(0)=1
    mid = enc[4]
    np.testing.assert_allclose(mid[0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(mid[1::2], 1.0, atol=1e-7)


def test_relpos_matmul_equals_shift_oracle():
    """The matmul-form relative-position term in _mhsa (angle-difference
    identity, no relayout) must equal the classic Transformer-XL
    einsum + rel_shift computation bit-for-bit up to fp32 rounding."""
    rng = np.random.RandomState(7)
    t, h, dh = 12, 2, 8
    d = h * dh
    qv = rng.randn(1, t, h, dh).astype(np.float32)
    wp = rng.randn(d, d).astype(np.float32)

    # oracle: project the (2T-1, D) sinusoid table, einsum, shift
    enc = _rel_pos_encoding(t, d)                        # (2T-1, D)
    p = (enc @ wp).reshape(-1, h, dh)
    raw = np.einsum("bthe,lhe->bhtl", qv, p)
    want = np.asarray(_rel_shift(jnp.asarray(raw)))      # (1, H, T, T)

    # matmul form (as in _mhsa)
    inv = np.exp(np.arange(0, d, 2, dtype=np.float64) * (-np.log(1e4) / d))
    ang = np.arange(t)[:, None] * inv[None, :]
    si, ci = np.sin(ang).astype(np.float32), np.cos(ang).astype(np.float32)
    ws = np.einsum("bthe,mhe->bthm", qv, wp[0::2].reshape(d // 2, h, dh))
    wc = np.einsum("bthe,mhe->bthm", qv, wp[1::2].reshape(d // 2, h, dh))
    sq, cq = si[None, :, None, :], ci[None, :, None, :]
    got = (np.einsum("bthm,sm->bhts", ws * sq + wc * cq, ci)
           + np.einsum("bthm,sm->bhts", wc * sq - ws * cq, si))

    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_cfg():
    return ConformerConfig(num_blocks=2, d_model=32, num_heads=4,
                           ff_expansion=2, conv_kernel=7,
                           subsampling_channels=16, dropout=0.0)


def test_conformer_forward_shapes(tiny_cfg):
    variables = init_conformer(jax.random.PRNGKey(0), tiny_cfg, feat_in=64,
                               num_classes=10)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64)
                        .astype(np.float32))
    lens = jnp.array([64, 33], jnp.int32)
    lp, out_lens, stats = conformer_apply(variables, feats, lens,
                                          cfg=tiny_cfg)
    assert lp.shape == (2, 16, 11)            # 4x subsampled, V+1
    np.testing.assert_array_equal(np.asarray(out_lens), [16, 9])
    s = np.exp(np.asarray(lp[0, 0])).sum()
    assert abs(s - 1.0) < 1e-4
    assert len(stats["blocks"]) == 2


def test_conformer_bf16_close_to_fp32(tiny_cfg):
    variables = init_conformer(jax.random.PRNGKey(1), tiny_cfg, feat_in=64,
                               num_classes=10)
    feats = jnp.asarray(np.random.RandomState(1).randn(1, 32, 64)
                        .astype(np.float32))
    lens = jnp.array([32], jnp.int32)
    lp32, _, _ = conformer_apply(variables, feats, lens, cfg=tiny_cfg)
    lp16, _, _ = conformer_apply(variables, feats, lens, cfg=tiny_cfg,
                                 compute_dtype=jnp.bfloat16)
    assert float(jnp.max(jnp.abs(lp32 - lp16))) < 0.15


@pytest.mark.slow
def test_scan_blocks_matches_unrolled(tiny_cfg):
    """lax.scan over the block stack is the default; its outputs must be
    bit-compatible with the Python unroll (same math, same dropout keys),
    in eval AND training mode (dropout + BN stat updates)."""
    import dataclasses

    cfg_scan = dataclasses.replace(tiny_cfg, scan_blocks=True, dropout=0.1)
    cfg_unroll = dataclasses.replace(tiny_cfg, scan_blocks=False,
                                     dropout=0.1)
    variables = init_conformer(jax.random.PRNGKey(2), cfg_scan, feat_in=64,
                               num_classes=10)
    feats = jnp.asarray(np.random.RandomState(2).randn(2, 48, 64)
                        .astype(np.float32))
    lens = jnp.array([48, 20], jnp.int32)
    for training in (False, True):
        rng = jax.random.PRNGKey(7)
        lp_s, len_s, st_s = conformer_apply(variables, feats, lens,
                                            cfg=cfg_scan, training=training,
                                            rng=rng)
        lp_u, len_u, st_u = conformer_apply(variables, feats, lens,
                                            cfg=cfg_unroll,
                                            training=training, rng=rng)
        np.testing.assert_array_equal(np.asarray(len_s), np.asarray(len_u))
        np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_u),
                                   atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(st_s),
                        jax.tree_util.tree_leaves(st_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


def test_yaml_dispatch_and_param_count():
    cfg = load_config(CONFIG)
    assert cfg.architecture == "conformer"
    assert cfg.conformer.num_blocks == 16
    variables = model_init(jax.random.PRNGKey(0), cfg)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 8e6 < n < 30e6, n        # small-conformer territory
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 64, 80)
                        .astype(np.float32))
    lp, lens, _ = model_apply(variables, feats, jnp.array([64], jnp.int32),
                              cfg=cfg)
    assert lp.shape[2] == 91


def test_stack_subsample_forward(tiny_cfg):
    """Frame-stacking subsampling: same output grid and lens as conv2d,
    no conv params, ragged T padded to a multiple of 4."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, subsampling_mode="stack")
    variables = init_conformer(jax.random.PRNGKey(0), cfg, feat_in=64,
                               num_classes=10)
    assert "sub1" not in variables["params"]
    assert variables["params"]["proj"]["w"].shape == (4 * 64, 32)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 62, 64)
                        .astype(np.float32))
    lens = jnp.array([62, 33], jnp.int32)
    lp, out_lens, _ = conformer_apply(variables, feats, lens, cfg=cfg)
    assert lp.shape == (2, 16, 11)
    np.testing.assert_array_equal(np.asarray(out_lens), [16, 9])
    s = np.exp(np.asarray(lp[0, 0])).sum()
    assert abs(s - 1.0) < 1e-4


@pytest.mark.parametrize("sub", [
    pytest.param("conv2d", marks=pytest.mark.slow),
    "stack",
])
def test_conformer_training_decreases_loss(tiny_cfg, sub):
    import dataclasses

    from vietasr_tpu.config import (DataConfig, EncoderConfig, ModelConfig,
                                    SpecAugmentConfig)
    from vietasr_tpu.frontend.features import FeaturizerConfig
    from vietasr_tpu.train import TrainState, make_optimizer, make_train_step
    from vietasr_tpu.train.loop import batch_to_arrays

    from test_train import SynthBatch

    cfg = ModelConfig(
        name="tiny-conf", labels=[" ", "a", "b", "c"],
        featurizer=FeaturizerConfig(features=16, dither=0.0, pad_to=8),
        encoder=EncoderConfig(blocks=(), feat_in=16),
        spec_augment=SpecAugmentConfig(), data=DataConfig(),
        architecture="conformer",
        conformer=dataclasses.replace(tiny_cfg, subsampling_channels=8,
                                      subsampling_mode=sub))
    variables = model_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer("adamw", 3e-3, weight_decay=1e-4,
                         grad_clip_norm=5.0)
    state = TrainState.create(variables, opt)
    step = jax.jit(make_train_step(cfg, opt, use_specaug=False))
    batch = batch_to_arrays(SynthBatch(np.random.RandomState(0)))
    losses = []
    key = jax.random.PRNGKey(2)
    for _ in range(25):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::5]
