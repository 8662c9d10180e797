"""Training stack tests: novograd vs the reference torch implementation,
LR schedules vs reference formulas, train step convergence on a synthetic
task, NaN guard, grad accumulation, checkpoint round-trip."""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vietasr_tpu.config import (
    BlockConfig,
    DataConfig,
    EncoderConfig,
    ModelConfig,
    SpecAugmentConfig,
)
from vietasr_tpu.frontend.features import FeaturizerConfig
from vietasr_tpu.models import init_quartznet
from vietasr_tpu.train import (
    CheckpointManager,
    TrainState,
    make_optimizer,
    make_schedule,
    make_train_step,
    novograd,
)
from vietasr_tpu.train.loop import batch_to_arrays, make_eval_step


# --- novograd vs reference torch implementation --------------------------

class TorchNovograd(torch.optim.Optimizer):
    """Reference Novograd semantics (optimizers.py:122-239), minimal."""

    def __init__(self, params, lr, betas=(0.95, 0.98), eps=1e-8,
                 weight_decay=0.0):
        super().__init__(params, dict(lr=lr, betas=betas, eps=eps,
                                      weight_decay=weight_decay))

    @torch.no_grad()
    def step(self):
        for group in self.param_groups:
            for p in group["params"]:
                if p.grad is None:
                    continue
                grad = p.grad.data.clone()
                state = self.state[p]
                if not state:
                    state["exp_avg"] = torch.zeros_like(p.data)
                    state["exp_avg_sq"] = torch.zeros([])
                b1, b2 = group["betas"]
                norm = grad.norm().pow(2)
                if state["exp_avg_sq"] == 0:
                    state["exp_avg_sq"].copy_(norm)
                else:
                    state["exp_avg_sq"].mul_(b2).add_(norm, alpha=1 - b2)
                denom = state["exp_avg_sq"].sqrt().add_(group["eps"])
                grad.div_(denom)
                if group["weight_decay"] != 0:
                    grad.add_(p.data, alpha=group["weight_decay"])
                state["exp_avg"].mul_(b1).add_(grad)
                p.data.add_(state["exp_avg"], alpha=-group["lr"])


def test_novograd_matches_torch_reference():
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    grads_seq = [rng.randn(4, 3).astype(np.float32) for _ in range(5)]

    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt_t = TorchNovograd([wt], lr=0.01, weight_decay=0.05)
    for g in grads_seq:
        wt.grad = torch.tensor(g)
        opt_t.step()

    opt = novograd(0.01, weight_decay=0.05)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(jnp.add, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               wt.detach().numpy(), atol=1e-5)


def test_schedules_match_reference_formulas():
    s = make_schedule("CosineAnnealing", 0.02, 1000, warmup_steps=100)
    # warmup: lr * (step+1)/(warmup+1)
    assert abs(float(s(0)) - 0.02 * 1 / 101) < 1e-8
    assert abs(float(s(50)) - 0.02 * 51 / 101) < 1e-8
    # cosine tail
    want = 0.02 * 0.5 * (1 + math.cos(math.pi * 500 / 1000))
    assert abs(float(s(500)) - want) < 1e-7
    # past total: 0
    assert float(s(1500)) == 0.0

    p = make_schedule("PolynomialDecayAnnealing", 0.01, 100, power=2.0)
    assert abs(float(p(50)) - 0.01 * 0.25) < 1e-8


# --- tiny end-to-end training --------------------------------------------

TINY_LABELS = [" ", "a", "b", "c"]


def tiny_config():
    blocks = (
        BlockConfig(filters=16, repeat=1, kernel=9, stride=2, residual=False,
                    separable=True),
        BlockConfig(filters=16, repeat=1, kernel=7, residual=True,
                    separable=True),
        BlockConfig(filters=32, repeat=1, kernel=1, residual=False),
    )
    feat = FeaturizerConfig(features=16, dither=1e-5, pad_to=8)
    return ModelConfig(
        name="tiny",
        labels=TINY_LABELS,
        featurizer=feat,
        encoder=EncoderConfig(blocks=blocks, feat_in=16),
        spec_augment=SpecAugmentConfig(),
        data=DataConfig(),
    )


class SynthBatch:
    """ZerosDataLayer-equivalent synthetic batch (SURVEY.md §4): tones whose
    frequency encodes the target label sequence."""

    def __init__(self, rng, b=4, seconds=0.5, labels=3):
        sr = 16000
        n = int(seconds * sr)
        t = np.arange(n) / sr
        self.signal = np.zeros((b, n), np.float32)
        self.tokens = np.zeros((b, labels), np.int32)
        self.token_lens = np.full((b,), labels, np.int32)
        self.signal_lens = np.full((b,), n, np.int32)
        for i in range(b):
            ids = rng.randint(1, 4, size=labels)
            self.tokens[i] = ids
            seg = n // labels
            for j, lab in enumerate(ids):
                freq = 300 * int(lab)
                self.signal[i, j * seg:(j + 1) * seg] = \
                    0.3 * np.sin(2 * np.pi * freq * t[:seg])


def test_train_step_decreases_loss():
    cfg = tiny_config()
    opt = make_optimizer("novograd", 0.01, weight_decay=0.001,
                         grad_clip_norm=5.0)
    variables = init_quartznet(jax.random.PRNGKey(0), cfg.encoder,
                               cfg.num_classes)
    state = TrainState.create(variables, opt)
    step = jax.jit(make_train_step(cfg, opt, use_specaug=False))

    rng = np.random.RandomState(0)
    batch = batch_to_arrays(SynthBatch(rng))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[::6]
    assert int(state.step) == 30
    assert int(state.skipped_steps) == 0


def test_nan_guard_skips_update():
    cfg = tiny_config()
    opt = make_optimizer("sgd", 0.01)
    variables = init_quartznet(jax.random.PRNGKey(0), cfg.encoder,
                               cfg.num_classes)
    state = TrainState.create(variables, opt)
    step = jax.jit(make_train_step(cfg, opt, use_specaug=False))
    batch = batch_to_arrays(SynthBatch(np.random.RandomState(0)))
    bad = dict(batch)
    bad["signal"] = batch["signal"].at[0, 0].set(jnp.nan)
    p_before = state.params["encoder"][0]["sub"][0]["dw_w"]
    state, metrics = step(state, bad, jax.random.PRNGKey(0))
    # per-sample masking may leave the LOSS finite; the guard trips on
    # the NaN gradient (surfaced as grad_norm=inf) and skips the update
    assert not np.isfinite(float(metrics["grad_norm"]))
    assert int(state.skipped_steps) == 1
    np.testing.assert_array_equal(
        np.asarray(state.params["encoder"][0]["sub"][0]["dw_w"]),
        np.asarray(p_before))


def test_infeasible_sample_masked_not_step_skipped():
    """A CTC-infeasible row (labels longer than encoder frames) must be
    masked PER SAMPLE — torch CTCLoss(zero_infinity=True) semantics — so
    the rest of the batch still trains; the step must NOT be skipped."""
    cfg = tiny_config()
    opt = make_optimizer("sgd", 0.01)
    variables = init_quartznet(jax.random.PRNGKey(0), cfg.encoder,
                               cfg.num_classes)
    state = TrainState.create(variables, opt)
    step = jax.jit(make_train_step(cfg, opt, use_specaug=False))
    batch = dict(batch_to_arrays(SynthBatch(np.random.RandomState(0))))
    # make row 0 infeasible: full-length label string, 2-frame audio
    batch["signal_lens"] = batch["signal_lens"].at[0].set(320)
    batch["token_lens"] = batch["token_lens"].at[0].set(
        batch["tokens"].shape[1])
    p_before = np.asarray(state.params["encoder"][0]["sub"][0]["dw_w"])
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < 1e25
    assert int(state.skipped_steps) == 0
    assert not np.array_equal(
        np.asarray(state.params["encoder"][0]["sub"][0]["dw_w"]), p_before)


def test_grad_accum_matches_full_batch():
    """One step with grad_accum=2 over batch B must give ~the same update as
    one full-batch step when BN is frozen-ish (loss averaged)."""
    cfg = tiny_config()
    opt = make_optimizer("sgd", 0.05)
    variables = init_quartznet(jax.random.PRNGKey(0), cfg.encoder,
                               cfg.num_classes)
    batch = batch_to_arrays(SynthBatch(np.random.RandomState(0), b=4))

    s1 = TrainState.create(variables, opt)
    step1 = jax.jit(make_train_step(cfg, opt, use_specaug=False))
    s1, m1 = step1(s1, batch, jax.random.PRNGKey(0))

    s2 = TrainState.create(variables, opt)
    step2 = jax.jit(make_train_step(cfg, opt, grad_accum=2,
                                    use_specaug=False))
    s2, m2 = step2(s2, batch, jax.random.PRNGKey(0))

    # dither noise + BN batch stats differ between micro/full batches, so
    # compare loosely: same order of magnitude loss, params moved similarly
    d1 = float(jnp.linalg.norm(
        s1.params["decoder"]["w"] - variables["params"]["decoder"]["w"]))
    d2 = float(jnp.linalg.norm(
        s2.params["decoder"]["w"] - variables["params"]["decoder"]["w"]))
    assert d1 > 0 and d2 > 0
    assert 0.2 < d1 / d2 < 5.0


def test_eval_step_and_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    opt = make_optimizer("novograd", 0.01)
    variables = init_quartznet(jax.random.PRNGKey(0), cfg.encoder,
                               cfg.num_classes)
    state = TrainState.create(variables, opt)

    eval_step = jax.jit(make_eval_step(cfg))
    batch = batch_to_arrays(SynthBatch(np.random.RandomState(1)))
    out = eval_step(state.params, state.batch_stats, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["preds"].shape[0] == 4

    cm = CheckpointManager(str(tmp_path), keep=2)
    for s in (1, 2, 3):
        state = state.replace(step=jnp.asarray(s, jnp.int32))
        cm.save(state)
    assert cm.list_steps() == [2, 3]    # keep-2 pruning
    restored = cm.restore(state)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["decoder"]["b"]),
        np.asarray(state.params["decoder"]["b"]))
