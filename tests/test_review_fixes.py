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


def test_infeasible_ctc_sample_skips_update():
    """Target longer than the input emits a huge finite loss; the guard
    must skip the step (the reference skips on torch's inf)."""
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
    p_before = state.params["decoder"]["b"]
    state, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert int(state.skipped_steps) == 1
    np.testing.assert_array_equal(np.asarray(state.params["decoder"]["b"]),
                                  np.asarray(p_before))


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
