"""Tensor contracts + train-progress monitoring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vietasr_tpu.utils.typing import (ContractError, assert_audio_batch,
                                      assert_features, assert_labels,
                                      assert_log_probs)


def test_contracts_accept_valid():
    assert_audio_batch(jnp.zeros((2, 100)), jnp.zeros((2,), jnp.int32))
    assert_features(jnp.zeros((2, 10, 64)), n_features=64)
    assert_log_probs(jnp.zeros((2, 10, 91)), num_classes=90)
    assert_labels(jnp.zeros((2, 5), jnp.int32), jnp.zeros((2,), jnp.int32))


def test_contracts_reject_mismatches():
    with pytest.raises(ContractError, match="audio_signal"):
        assert_audio_batch(jnp.zeros((2, 10, 3)))          # wrong rank
    with pytest.raises(ContractError, match="lengths"):
        assert_audio_batch(jnp.zeros((2, 10)), jnp.zeros((3,), jnp.int32))
    with pytest.raises(ContractError, match="features"):
        assert_features(jnp.zeros((2, 10, 64)), n_features=80)
    with pytest.raises(ContractError, match="log_probs"):
        assert_log_probs(jnp.zeros((2, 10, 5), jnp.int32))  # wrong dtype
    with pytest.raises(ContractError):
        assert_labels(jnp.zeros((2, 5)))                   # float labels


def test_loss_fn_contract_fires_on_bad_batch():
    from vietasr_tpu.train.loop import make_loss_fn

    from test_train import tiny_config

    loss_fn = make_loss_fn(tiny_config())
    bad = {
        "signal": jnp.zeros((2, 100), jnp.int32),          # int waveform!
        "signal_lens": jnp.zeros((2,), jnp.int32),
        "tokens": jnp.zeros((2, 3), jnp.int32),
        "token_lens": jnp.zeros((2,), jnp.int32),
    }
    with pytest.raises(ContractError):
        loss_fn({}, {}, bad, jax.random.PRNGKey(0), False)


def test_monitor_progress_in_trainer():
    from vietasr_tpu.train import Trainer, TrainState, make_optimizer
    from vietasr_tpu.models import model_init
    from vietasr_tpu.train.synthetic import SyntheticToneDataset

    from test_train import tiny_config

    cfg = tiny_config()
    opt = make_optimizer("sgd", 0.01)
    state = TrainState.create(model_init(jax.random.PRNGKey(0), cfg), opt)
    trainer = Trainer(cfg=cfg, optimizer=opt, use_specaug=False,
                      log_every=1, monitor_progress=True)
    ds = SyntheticToneDataset()
    state = trainer.fit(state, ds.batches(2, 2), num_epochs=1)
    logged = [h for h in trainer.history if "train_wer" in h]
    assert logged
    assert "sample_hyp" in logged[0] and "sample_ref" in logged[0]
