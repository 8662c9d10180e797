"""Tests: export (StableHLO), kaldi ark IO, common losses, synthetic data,
speech-label/transcript datasets."""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vietasr_tpu.audio.dataset import AudioLabelDataset, TranscriptDataset
from vietasr_tpu.audio.kaldi import (KaldiFeatureDataset, read_ark, read_scp,
                                     write_ark)
from vietasr_tpu.audio.manifest import ManifestEntry
from vietasr_tpu.audio.tokenizer import CharTokenizer
from vietasr_tpu.ops.losses import (aggregate_losses, cross_entropy_loss,
                                    mse_loss, sequence_loss)
from vietasr_tpu.train.synthetic import SyntheticToneDataset, zeros_batch


def test_kaldi_ark_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    records = {"utt1": rng.randn(17, 13).astype(np.float32),
               "utt2": rng.randn(5, 13).astype(np.float32)}
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    write_ark(ark, records, scp)

    got = dict(read_ark(ark))
    assert set(got) == {"utt1", "utt2"}
    np.testing.assert_allclose(got["utt1"], records["utt1"])

    got_scp = dict(read_scp(scp))
    np.testing.assert_allclose(got_scp["utt2"], records["utt2"])


def test_kaldi_compressed_roundtrip(tmp_path):
    from vietasr_tpu.audio.kaldi import write_compressed_ark

    rng = np.random.RandomState(2)
    records = {"u1": (rng.randn(50, 13) * 3).astype(np.float32),
               "u2": (rng.rand(8, 13) * 10 - 5).astype(np.float32)}
    ark = str(tmp_path / "c.ark")
    write_compressed_ark(ark, records)
    got = dict(read_ark(ark))
    for k, want in records.items():
        # lossy 8-bit per-column quantization: tolerance ~ segment width
        scale = want.max() - want.min()
        err = np.abs(got[k] - want).max()
        assert err < 0.02 * scale, (k, err, scale)


def test_kaldi_feature_dataset(tmp_path):
    rng = np.random.RandomState(1)
    records = {"a": rng.randn(10, 8).astype(np.float32),
               "b": rng.randn(20, 8).astype(np.float32)}
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    write_ark(ark, records, scp)
    text = tmp_path / "text"
    text.write_text("a xin chao\nb khong ro\n")
    tok = CharTokenizer(list(" abcdefghijklmnopqrstuvwxyz"))
    ds = KaldiFeatureDataset(scp, str(text), tok)
    assert len(ds) == 2
    key, feats, ids = ds[0]
    assert feats.shape == (10, 8)
    assert tok.decode(ids) == "xin chao"


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=6)
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels)))
    assert abs(got - want) < 1e-5


def test_sequence_loss_masks_padding():
    lp = jnp.log(jnp.full((1, 4, 3), 1 / 3))
    targets = jnp.array([[1, 2, 0, 0]])
    loss = sequence_loss(lp, targets, jnp.array([2]))
    assert abs(float(loss) - float(np.log(3))) < 1e-5


def test_mse_and_aggregate():
    a = mse_loss(jnp.ones(4), jnp.zeros(4))
    assert float(a) == 1.0
    total = aggregate_losses([a, a], weights=[1.0, 0.5])
    assert abs(float(total) - 1.5) < 1e-6


@pytest.mark.slow
def test_zeros_batch_and_tone_dataset_run_through_model():
    from test_train import tiny_config

    from vietasr_tpu.train import TrainState, make_optimizer, make_train_step
    from vietasr_tpu.train.loop import batch_to_arrays
    from vietasr_tpu.models import model_init

    cfg = tiny_config()
    opt = make_optimizer("sgd", 0.01)
    state = TrainState.create(model_init(jax.random.PRNGKey(0), cfg), opt)
    step = jax.jit(make_train_step(cfg, opt, use_specaug=False))

    zb = zeros_batch(2, seconds=0.5, max_tokens=3)
    state, m = step(state, batch_to_arrays(zb), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))

    ds = SyntheticToneDataset()
    for batch in ds.batches(2, 2):
        state, m = step(state, batch_to_arrays(batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_audio_label_dataset(tmp_path):
    import glob

    wavs = sorted(glob.glob("/root/reference/audio_samples/*.wav"))[:4]
    entries = [ManifestEntry(w, 1.0, "yes" if i % 2 else "no")
               for i, w in enumerate(wavs)]
    entries.append(ManifestEntry(wavs[0], 1.0, "unknown_label"))
    ds = AudioLabelDataset(entries, ["no", "yes"])
    assert len(ds) == 4
    assert ds.num_dropped == 1
    samples, label = ds[1]
    assert label == 1
    assert samples.dtype == np.float32


def test_transcript_dataset(tmp_path):
    p = tmp_path / "text.txt"
    p.write_text("xin chao\nviet nam\n\n")
    tok = CharTokenizer(list(" abcdefghijklmnopqrstuvwxyz"))
    ds = TranscriptDataset(str(p), tok, bos_id=99, eos_id=98)
    assert len(ds) == 2
    assert ds[0][0] == 99 and ds[0][-1] == 98


@pytest.mark.slow
def test_stablehlo_export_roundtrip(tmp_path):
    from vietasr_tpu.export import export_transcriber, load_exported
    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions

    t = Transcriber(
        "/root/reference/configs/quartznet12x1_vi.yaml",
        options=TranscriberOptions(buckets_seconds=(1.0,),
                                   compute_dtype=None))
    manifest = export_transcriber(t, str(tmp_path), batch_sizes=(1,))
    assert manifest["blank_id"] == 90
    f = manifest["functions"][0]
    fn = load_exported(os.path.join(str(tmp_path), f["file"]))

    rng = np.random.RandomState(0)
    sig = jnp.asarray(rng.randn(1, f["samples"]).astype(np.float32) * 0.1)
    lens = jnp.asarray(np.array([f["samples"]], np.int32))
    lp, enc_lens, preds, keep = fn(sig, lens)
    want_lp, want_lens, _, _ = t._fwd(sig, lens)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(want_lp),
                               atol=1e-4, rtol=1e-4)
    assert os.path.exists(os.path.join(str(tmp_path), "manifest.json"))
