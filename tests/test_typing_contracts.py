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


# ---------------------------------------------------------------------------
# round-2: contracts wired into EVERY public boundary (VERDICT item 5;
# reference checks every module port, nemo/core/neural_types/neural_type.py)


def test_transposed_axes_detected():
    with pytest.raises(ContractError, match="TRANSPOSED"):
        assert_features(jnp.zeros((2, 64, 10)), n_features=64)
    with pytest.raises(ContractError, match="TRANSPOSED"):
        assert_log_probs(jnp.zeros((2, 91, 10)), num_classes=90)


def test_featurizer_input_contract():
    from vietasr_tpu.config import FeaturizerConfig
    from vietasr_tpu.frontend.features import make_featurizer

    featurize = make_featurizer(FeaturizerConfig())
    with pytest.raises(ContractError, match="featurizer.input_signal"):
        featurize(jnp.zeros((2, 100), jnp.int16),
                  jnp.zeros((2,), jnp.int32))
    with pytest.raises(ContractError, match="lengths"):
        featurize(jnp.zeros((2, 100)), jnp.zeros((2,), jnp.float32))


def test_decode_ops_contracts():
    from vietasr_tpu.ops.device_beam import device_beam_search
    from vietasr_tpu.ops.greedy import greedy_decode

    lp_t = jnp.zeros((1, 5, 10))     # V+1 = 5 if transposed
    with pytest.raises(ContractError, match="TRANSPOSED"):
        greedy_decode(lp_t, jnp.asarray([10]), blank=4)
    with pytest.raises(ContractError, match="device_beam_search"):
        device_beam_search(lp_t, jnp.asarray([10]), blank=4, beam_width=4)


def test_ctc_loss_contracts():
    from vietasr_tpu.ops.ctc_loss import ctc_loss

    lp = jnp.zeros((2, 10, 5))
    with pytest.raises(ContractError, match="ctc_loss.targets"):
        ctc_loss(lp, jnp.zeros((2, 3), jnp.float32),   # float labels
                 jnp.asarray([10, 10]), jnp.asarray([3, 3]), blank=4)
    with pytest.raises(ContractError, match="ctc_loss.log_probs"):
        ctc_loss(jnp.zeros((2, 5, 10)), jnp.zeros((2, 3), jnp.int32),
                 jnp.asarray([5, 5]), jnp.asarray([3, 3]), blank=4)


def test_transcriber_and_host_beam_contracts():
    from vietasr_tpu.ops.beam_search import BeamSearchDecoderLM
    from vietasr_tpu.pipeline import Transcriber

    t = Transcriber("/root/reference/configs/quartznet12x1_vi.yaml")
    with pytest.raises(ContractError, match="scale int PCM"):
        t.transcribe(np.zeros(1600, np.int16))          # raw PCM16
    with pytest.raises(ContractError, match="transcribe.signal"):
        t.transcribe_batch([np.zeros((2, 3, 4), np.float32)])

    dec = BeamSearchDecoderLM(["a", "b"], use_native=False)
    with pytest.raises(ContractError, match="beam.decode"):
        dec.decode(np.zeros((10, 7), np.float32))        # wrong vocab width


def test_stream_pool_chunk_contract():
    from vietasr_tpu.utils.typing import assert_waveform

    with pytest.raises(ContractError, match="stream.chunk"):
        assert_waveform(np.zeros(3200, np.int16), port="stream.chunk")
