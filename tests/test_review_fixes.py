"""Regression tests for the code-review findings."""

import numpy as np

import jax
import jax.numpy as jnp

from vietasr_tpu.audio.dataset import AudioTextDataset, BucketBatcher
from vietasr_tpu.audio.manifest import ManifestEntry
from vietasr_tpu.audio.tokenizer import CharTokenizer
from vietasr_tpu.frontend.features import _splice_frames
from vietasr_tpu.ops.beam_search import BeamSearchDecoderLM
from vietasr_tpu.train import TrainState, make_optimizer, make_train_step
from vietasr_tpu.train.loop import batch_to_arrays

from test_train import SynthBatch, tiny_config


def test_infeasible_ctc_sample_masked_not_skipped():
    """Per-sample zero_infinity semantics (train/loop.py make_loss_fn): an
    infeasible row (input too short for its label string) is masked out of
    the batch loss, the rest of the batch still trains, and a batch that is
    ENTIRELY infeasible yields exactly-zero grads (params unchanged) without
    tripping the step-skip guard."""
    cfg = tiny_config()
    opt = make_optimizer("sgd", 0.01)
    from vietasr_tpu.models import model_init

    state = TrainState.create(model_init(jax.random.PRNGKey(0), cfg), opt)
    step = jax.jit(make_train_step(cfg, opt, use_specaug=False))
    batch = batch_to_arrays(SynthBatch(np.random.RandomState(0)))
    # make sample 0 infeasible: tiny input, long dense repeated target
    bad = dict(batch)
    bad["signal_lens"] = batch["signal_lens"].at[0].set(320)  # 2 frames
    bad["tokens"] = batch["tokens"].at[0].set(jnp.array([1, 1, 1]))
    bad["token_lens"] = batch["token_lens"].at[0].set(3)
    p_before = np.asarray(state.params["decoder"]["b"])
    state, metrics = step(state, bad, jax.random.PRNGKey(0))
    # the batch still trains: no skip, finite loss, params moved
    assert int(state.skipped_steps) == 0
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < 1e25   # sentinel masked out of the mean
    assert not np.array_equal(np.asarray(state.params["decoder"]["b"]),
                              p_before)

    # an all-infeasible batch contributes exactly zero gradient
    state2 = TrainState.create(model_init(jax.random.PRNGKey(0), cfg), opt)
    all_bad = dict(batch)
    all_bad["signal_lens"] = jnp.full_like(batch["signal_lens"], 320)
    all_bad["tokens"] = jnp.tile(jnp.array([1, 1, 1], batch["tokens"].dtype),
                                 (batch["tokens"].shape[0], 1))[:, :batch["tokens"].shape[1]]
    all_bad["token_lens"] = jnp.full_like(batch["token_lens"], 3)
    p2_before = np.asarray(state2.params["decoder"]["b"])
    state2, metrics2 = step(state2, all_bad, jax.random.PRNGKey(0))
    assert int(state2.skipped_steps) == 0
    assert float(metrics2["loss"]) == 0.0
    np.testing.assert_array_equal(
        np.asarray(state2.params["decoder"]["b"]), p2_before)


def test_bucket_batcher_drops_overlong_audio(tmp_path):
    import glob

    wavs = sorted(glob.glob("/root/reference/audio_samples/*.wav"))[:2]
    entries = [ManifestEntry(wavs[0], 2.0, "a b"),
               ManifestEntry(wavs[1], 99.0, "b a")]   # way over max bucket
    ds = AudioTextDataset(entries, CharTokenizer([" ", "a", "b"]))
    batcher = BucketBatcher(ds, 2, max_duration=16.7, shuffle=False)
    seen = sum(int((b.signal_lens > 0).sum()) for b in batcher)
    assert seen == 1
    assert batcher.num_skipped_too_long == 1


def test_beam_decoder_zero_length_returns_empty():
    dec = BeamSearchDecoderLM(["a", "b", " "], use_native=False)
    lp = np.log(np.full((5, 4), 0.25, np.float32))
    assert dec.decode(lp, length=0) == ""
    out = dec.decode_batch(np.stack([lp, lp]), np.array([0, 5]))
    assert out[0] == ""


def test_splice_frames_actually_shifts():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 4, 2)
    out = _splice_frames(x, 2)
    assert out.shape == (1, 4, 4)
    # second half of features at t must equal frames at t+1 (edge-clamped)
    np.testing.assert_array_equal(np.asarray(out[0, 0, 2:]),
                                  np.asarray(x[0, 1]))
    np.testing.assert_array_equal(np.asarray(out[0, 3, 2:]),
                                  np.asarray(x[0, 3]))


def test_streaming_online_rejects_bad_chunk():
    import pytest

    from test_streaming_online import small_model
    from vietasr_tpu.streaming_online import OnlineTranscriber

    cfg, variables = small_model()
    ot = OnlineTranscriber(cfg, variables)
    with pytest.raises(ValueError, match="multiple of"):
        ot.stream([np.zeros(3210, np.float32)])
