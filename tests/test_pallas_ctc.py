"""Fused Pallas CTC (alpha fwd + analytic beta bwd) vs the lax.scan
implementation: values bit-close, gradients match autodiff-through-scan.
Runs the kernels in interpret mode on CPU (compiled path exercised on the
real chip by bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vietasr_tpu.ops.ctc_loss import ctc_loss

V, BLANK = 6, 5


def rand_case(rng, b=4, t=24, l=7, tmin=12):
    logits = rng.randn(b, t, V).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = jnp.asarray(rng.randint(0, V - 1, size=(b, l)), jnp.int32)
    ilens = jnp.asarray(rng.randint(tmin, t + 1, size=(b,)), jnp.int32)
    tlens = jnp.asarray(rng.randint(1, l + 1, size=(b,)), jnp.int32)
    return lp, targets, ilens, tlens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_scan_values_and_grads(seed):
    rng = np.random.RandomState(seed)
    lp, targets, ilens, tlens = rand_case(rng)

    def loss_of(impl):
        def f(lp_):
            return ctc_loss(lp_, targets, ilens, tlens, blank=BLANK,
                            reduction="mean_batch", impl=impl)
        return f

    scan_f = jax.jit(jax.value_and_grad(loss_of("scan")))
    pal_f = jax.jit(jax.value_and_grad(loss_of("pallas_interpret")))
    v_s, g_s = scan_f(lp)
    v_p, g_p = pal_f(lp)
    np.testing.assert_allclose(float(v_p), float(v_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s),
                               atol=2e-5, rtol=1e-4)


def test_pallas_edge_cases():
    """Repeated labels (skip gating), tl=0 row, frozen frames beyond
    input length, per-sample reduction."""
    rng = np.random.RandomState(3)
    b, t, l = 3, 20, 6
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(b, t, V).astype(np.float32)), axis=-1)
    targets = jnp.asarray([[1, 1, 2, 2, 1, 0],     # repeats force blanks
                           [3, 0, 0, 0, 0, 0],
                           [0, 0, 0, 0, 0, 0]], jnp.int32)
    ilens = jnp.asarray([20, 9, 15], jnp.int32)
    tlens = jnp.asarray([6, 1, 0], jnp.int32)

    per_s = ctc_loss(lp, targets, ilens, tlens, blank=BLANK,
                     reduction="none", impl="scan")
    per_p = ctc_loss(lp, targets, ilens, tlens, blank=BLANK,
                     reduction="none", impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(per_p)[:2], np.asarray(per_s)[:2],
                               rtol=1e-6)

    # grads beyond each row's input length must be exactly zero
    g = jax.grad(lambda x: jnp.sum(ctc_loss(
        x, targets, ilens, tlens, blank=BLANK, reduction="none",
        impl="pallas_interpret")[:2]))(lp)
    g = np.asarray(g)
    assert np.abs(g[1, 9:]).max() == 0.0
    assert np.abs(g[0]).sum() > 0


def test_pallas_infeasible_row_grad_is_zero():
    """T too short for the target (with required blanks) -> loss is the
    huge sentinel and the analytic gradient is gated to zero (the scan
    path's autodiff emits zeros there too)."""
    rng = np.random.RandomState(4)
    b, t, l = 2, 5, 4
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(b, t, V).astype(np.float32)), axis=-1)
    targets = jnp.asarray([[1, 1, 1, 1], [1, 2, 3, 0]], jnp.int32)
    ilens = jnp.asarray([5, 5], jnp.int32)
    tlens = jnp.asarray([4, 3], jnp.int32)   # row 0 needs >= 7 frames

    per = ctc_loss(lp, targets, ilens, tlens, blank=BLANK,
                   reduction="none", impl="pallas_interpret")
    assert float(per[0]) > 1e29 and float(per[1]) < 1e5
    g = jax.grad(lambda x: jnp.sum(ctc_loss(
        x, targets, ilens, tlens, blank=BLANK, reduction="none",
        impl="pallas_interpret")))(lp)
    assert np.abs(np.asarray(g)[0]).max() == 0.0
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_train_step_with_pallas_ctc_converges():
    """The full jitted train step with ctc_impl='pallas' decreases loss
    (interpret mode on CPU via a monkeypatched interpret default is not
    available, so this exercises the wiring with impl='scan' equivalence:
    the step builds and runs with the pallas flag under interpret)."""
    import dataclasses

    from vietasr_tpu.config import (ConformerConfig, DataConfig,
                                    EncoderConfig, ModelConfig,
                                    SpecAugmentConfig)
    from vietasr_tpu.frontend.features import FeaturizerConfig
    from vietasr_tpu.models import model_init
    from vietasr_tpu.train import TrainState, make_optimizer, make_train_step
    from vietasr_tpu.train.loop import batch_to_arrays

    from test_train import SynthBatch

    cfg = ModelConfig(
        name="tiny-conf", labels=[" ", "a", "b", "c"],
        featurizer=FeaturizerConfig(features=16, dither=0.0, pad_to=8),
        encoder=EncoderConfig(blocks=(), feat_in=16),
        spec_augment=SpecAugmentConfig(), data=DataConfig(),
        architecture="conformer",
        conformer=ConformerConfig(num_blocks=1, d_model=32, num_heads=4,
                                  ff_expansion=2, conv_kernel=7,
                                  subsampling_channels=8, dropout=0.0))
    variables = model_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer("adamw", 3e-3, weight_decay=1e-4,
                         grad_clip_norm=5.0)
    state = TrainState.create(variables, opt)
    step = jax.jit(make_train_step(cfg, opt, use_specaug=False,
                                   ctc_impl="pallas_interpret"))
    batch = batch_to_arrays(SynthBatch(np.random.RandomState(0)))
    losses = []
    key = jax.random.PRNGKey(2)
    for _ in range(12):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
