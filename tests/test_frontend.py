"""Frontend numerics tests.

The torch pipeline below re-creates the reference featurizer semantics
(/root/reference/nemo/collections/asr/parts/features.py:245-301) as an
independent oracle: torch.stft(center=True), hann periodic=False, power
spectrum, mel matmul, log(x + 2^-24), per-feature masked normalization with
unbiased std. Our JAX DFT-matmul implementation must match to fp32 tolerance.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vietasr_tpu.frontend import (
    FeaturizerConfig,
    feature_seq_len,
    make_featurizer,
    mel_filterbank,
)
from vietasr_tpu.frontend.mel import hann_window, hz_to_mel, mel_to_hz


def torch_oracle(signal: np.ndarray, lengths: np.ndarray, cfg: FeaturizerConfig,
                 mel_fb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reference-semantics featurizer in torch (dither disabled)."""
    x = torch.tensor(signal, dtype=torch.float32)
    seq_len = torch.ceil(torch.tensor(lengths, dtype=torch.float32) / cfg.hop_length).long()
    # preemphasis
    x = torch.cat((x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]), dim=1)
    window = torch.hann_window(cfg.win_length, periodic=False)
    spec = torch.stft(x, n_fft=cfg.fft_length, hop_length=cfg.hop_length,
                      win_length=cfg.win_length, center=True, window=window,
                      return_complex=True)
    power = spec.real ** 2 + spec.imag ** 2          # (B, n_bins, T)
    mel = torch.matmul(torch.tensor(mel_fb), power)  # (B, n_mels, T)
    mel = torch.log(mel + 2.0 ** -24)
    # per-feature masked normalization, unbiased std, +1e-5 guard
    out = torch.empty_like(mel)
    for i in range(mel.shape[0]):
        valid = mel[i, :, : seq_len[i]]
        mean = valid.mean(dim=1, keepdim=True)
        std = valid.std(dim=1, keepdim=True) + 1e-5
        out[i] = (mel[i] - mean) / std
    # mask + pad to multiple of 16
    t = out.shape[-1]
    mask = torch.arange(t)[None, :] >= seq_len[:, None]
    out = out.masked_fill(mask[:, None, :], 0.0)
    if t % cfg.pad_to:
        out = torch.nn.functional.pad(out, (0, cfg.pad_to - t % cfg.pad_to))
    return out.numpy(), seq_len.numpy()


@pytest.fixture(scope="module")
def cfg():
    return FeaturizerConfig(dither=0.0)


def test_hann_window_matches_torch():
    ours = hann_window(320)
    theirs = torch.hann_window(320, periodic=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 250.0, 999.0, 1000.0, 2000.0, 7999.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, 64)
    assert fb.shape == (64, 257)
    assert np.all(fb >= 0)
    # every filter has support and the supports tile the band contiguously
    assert np.all(fb.sum(axis=1) > 0)
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 1)
    # Slaney normalization: response integrated over Hz ~ triangle area * enorm = 1
    df = 16000 / 512
    areas = fb.sum(axis=1) * df
    # interior filters integrate to ~1 (edge discretization error allowed)
    assert np.all(np.abs(areas[5:] - 1.0) < 0.12)


def test_log_mel_matches_torch_oracle(cfg):
    rng = np.random.RandomState(0)
    b, s = 3, 16000 * 2
    signal = rng.randn(b, s).astype(np.float32) * 0.1
    lengths = np.array([s, s - 3777, s // 2 + 11], dtype=np.int32)
    # zero beyond the valid length as the batch collate does
    for i, l in enumerate(lengths):
        signal[i, l:] = 0.0

    mel_fb = mel_filterbank(16000, 512, 64)
    want, want_len = torch_oracle(signal, lengths, cfg, mel_fb)

    featurize = make_featurizer(cfg)
    got, got_len = featurize(jnp.asarray(signal), jnp.asarray(lengths))
    got = np.asarray(got).transpose(0, 2, 1)  # (B, T, D) -> (B, D, T) to compare

    np.testing.assert_array_equal(got_len, want_len)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_seq_len_formula():
    lens = jnp.array([1, 159, 160, 161, 32000])
    np.testing.assert_array_equal(
        np.asarray(feature_seq_len(lens, 160)), [1, 1, 1, 2, 200]
    )


def test_pad_to_multiple(cfg):
    featurize = make_featurizer(cfg)
    signal = jnp.zeros((1, 16000), jnp.float32)
    feats, _ = featurize(signal, jnp.array([16000], jnp.int32))
    assert feats.shape[1] % cfg.pad_to == 0
