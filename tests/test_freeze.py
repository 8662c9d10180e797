"""Freeze / scheduled-unfreeze / value-schedule training capability
(train/freeze.py) — reference NeuralModule.freeze (nm.py:66-90),
UnfreezeCallback + ValueSetterCallback (nemo/core/callbacks.py:515-573).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_train import tiny_config
from vietasr_tpu.train import (TrainState, make_optimizer, make_train_step)
from vietasr_tpu.train.freeze import (freeze, make_value_schedule,
                                      unfreeze_schedule)
from vietasr_tpu.models import model_init


def _batch(cfg, b=2, s=4000, rng=None):
    rng = rng or np.random.RandomState(0)
    return {
        "signal": jnp.asarray(rng.randn(b, s).astype(np.float32) * 0.1),
        "signal_lens": jnp.asarray(np.full((b,), s, np.int32)),
        "tokens": jnp.asarray(rng.randint(0, 3, (b, 6)).astype(np.int32)),
        "token_lens": jnp.asarray(np.full((b,), 6, np.int32)),
    }


def _leaf_delta(a, b):
    return {
        k: float(sum(jnp.abs(x - y).sum()
                     for x, y in zip(jax.tree_util.tree_leaves(a[k]),
                                     jax.tree_util.tree_leaves(b[k]))))
        for k in a
    }


def test_freeze_encoder_only_decoder_trains():
    cfg = tiny_config()
    opt = freeze(make_optimizer("adamw", 1e-3), ["encoder"])
    state = TrainState.create(model_init(jax.random.PRNGKey(0), cfg), opt)
    step = jax.jit(make_train_step(cfg, opt))
    p0 = jax.tree_util.tree_map(lambda x: x.copy(), state.params)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, _batch(cfg), sub)
    d = _leaf_delta(p0, state.params)
    assert d["encoder"] == 0.0, "frozen encoder moved"
    assert d["decoder"] > 0.0, "decoder did not train"


def test_unfreeze_schedule_thaws_at_step():
    cfg = tiny_config()
    opt = unfreeze_schedule(make_optimizer("adamw", 1e-3), {"decoder": 3})
    state = TrainState.create(model_init(jax.random.PRNGKey(0), cfg), opt)
    step = jax.jit(make_train_step(cfg, opt))
    p0 = jax.tree_util.tree_map(lambda x: x.copy(), state.params)
    rng = jax.random.PRNGKey(1)
    for i in range(3):          # steps with count 0, 1, 2: frozen
        rng, sub = jax.random.split(rng)
        state, _ = step(state, _batch(cfg), sub)
    d = _leaf_delta(p0, state.params)
    assert d["decoder"] == 0.0, "decoder moved before unfreeze step"
    assert d["encoder"] > 0.0
    for i in range(3):          # counts 3, 4, 5: thawed
        rng, sub = jax.random.split(rng)
        state, _ = step(state, _batch(cfg), sub)
    d = _leaf_delta(p0, state.params)
    assert d["decoder"] > 0.0, "decoder never thawed"


def test_value_schedule_anneals_specaug_in_metrics():
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, spec_augment=dataclasses.replace(
            cfg.spec_augment, freq_masks=2, time_masks=2))
    opt = make_optimizer("adamw", 1e-3)
    sched = {"specaug_time_masks": make_value_schedule(
        "linear", 0.0, 2.0, total_steps=4)}
    state = TrainState.create(model_init(jax.random.PRNGKey(0), cfg), opt)
    step = jax.jit(make_train_step(cfg, opt, value_schedules=sched))
    rng = jax.random.PRNGKey(1)
    seen = []
    for i in range(5):
        rng, sub = jax.random.split(rng)
        state, m = step(state, _batch(cfg), sub)
        seen.append(float(m["specaug_time_masks"]))
    assert seen[0] == pytest.approx(0.0)
    assert seen[-1] == pytest.approx(2.0)
    assert all(b >= a for a, b in zip(seen, seen[1:]))


def test_band_mask_active_count_gates():
    from vietasr_tpu.ops.specaug import _band_mask

    rng = jax.random.PRNGKey(0)
    none_active = _band_mask(rng, 4, 32, 3, 8, active=jnp.asarray(0))
    assert not bool(none_active.any())
    all_active = _band_mask(rng, 4, 32, 3, 8, active=jnp.asarray(3))
    unlimited = _band_mask(rng, 4, 32, 3, 8)
    np.testing.assert_array_equal(np.asarray(all_active),
                                  np.asarray(unlimited))


def test_exp_value_schedule():
    fn = make_value_schedule("exp", 1.0, 0.01, total_steps=10)
    assert float(fn(jnp.asarray(0))) == pytest.approx(1.0)
    assert float(fn(jnp.asarray(10))) == pytest.approx(0.01, rel=1e-3)
    mid = float(fn(jnp.asarray(5)))
    assert 0.05 < mid < 0.2          # geometric midpoint = 0.1
