"""Preprocessor variants beyond log-mel.

Reference: nemo/collections/asr/audio_preprocessing.py —
AudioToSpectrogramPreprocessor (:99-209), AudioToMFCCPreprocessor
(:386-519), MultiplyBatch (:611-663), CropOrPadSpectrogramAugmentation
(:666-738). All implemented as pure JAX functions sharing the log-mel
frontend's DFT-matmul core.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vietasr_tpu.frontend.features import (
    FeaturizerConfig,
    _frame_signal,
    _normalize,
    _windowed_dft_matrix,
    feature_seq_len,
)
from vietasr_tpu.frontend.mel import mel_filterbank


def _power_spectrum(signal, cfg: FeaturizerConfig, dft_matrix):
    x = signal.astype(jnp.float32)
    if cfg.preemph is not None:
        x = jnp.concatenate([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]],
                            axis=1)
    frames = _frame_signal(x, cfg.fft_length, cfg.hop_length)
    spec = jnp.einsum("btn,nk->btk", frames, dft_matrix,
                      preferred_element_type=jnp.float32)
    n_bins = cfg.fft_length // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    return re * re + im * im


def spectrogram_features(signal, lengths, *, cfg: FeaturizerConfig,
                         dft_matrix):
    """Linear power spectrogram, log-compressed and masked like the log-mel
    path. Output (B, T, n_fft//2+1)."""
    seq_len = feature_seq_len(lengths, cfg.hop_length)
    power = _power_spectrum(signal, cfg, dft_matrix)
    if cfg.log:
        power = jnp.log(power + cfg.log_zero_guard_value)
    if cfg.normalize:
        power = _normalize(power, seq_len, cfg.normalize)
    t = power.shape[1]
    mask = jnp.arange(t)[None, :, None] < seq_len[:, None, None]
    return jnp.where(mask, power, cfg.pad_value), seq_len


def _dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """DCT-II with ortho norm (the MFCC transform)."""
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)[:, None]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels))
    m[0] *= 1.0 / np.sqrt(2)
    m *= np.sqrt(2.0 / n_mels)
    return m.astype(np.float32)          # (n_mfcc, n_mels)


def mfcc_features(signal, lengths, *, cfg: FeaturizerConfig, dft_matrix,
                  mel_matrix, dct: jnp.ndarray):
    """MFCCs: mel -> log -> DCT-II(ortho). Output (B, T, n_mfcc)."""
    seq_len = feature_seq_len(lengths, cfg.hop_length)
    power = _power_spectrum(signal, cfg, dft_matrix)
    mel = jnp.einsum("btk,km->btm", power, mel_matrix,
                     preferred_element_type=jnp.float32)
    logmel = jnp.log(mel + cfg.log_zero_guard_value)
    mfcc = jnp.einsum("btm,cm->btc", logmel, dct,
                      preferred_element_type=jnp.float32)
    if cfg.normalize:
        mfcc = _normalize(mfcc, seq_len, cfg.normalize)
    t = mfcc.shape[1]
    mask = jnp.arange(t)[None, :, None] < seq_len[:, None, None]
    return jnp.where(mask, mfcc, cfg.pad_value), seq_len


def make_spectrogram_featurizer(cfg: FeaturizerConfig):
    # host numpy constants: see make_featurizer (features.py) — device-
    # array closure constants stall jit lowering with a d2h fetch
    dft = np.asarray(_windowed_dft_matrix(cfg), np.float32)
    return partial(spectrogram_features, cfg=cfg, dft_matrix=dft)


def make_mfcc_featurizer(cfg: FeaturizerConfig, n_mfcc: int = 64):
    dft = np.asarray(_windowed_dft_matrix(cfg), np.float32)
    mel = np.asarray(mel_filterbank(cfg.sample_rate, cfg.fft_length,
                                    cfg.features, cfg.lowfreq,
                                    cfg.highfreq).T, np.float32)
    dct = np.asarray(_dct_matrix(n_mfcc, cfg.features), np.float32)
    return partial(mfcc_features, cfg=cfg, dft_matrix=dft, mel_matrix=mel,
                   dct=dct)


# ---------------------------------------------------------------------------


def multiply_batch(feats, feat_lens, tokens, token_lens, *, mult: int):
    """Repeat a batch `mult` times (reference MultiplyBatch,
    audio_preprocessing.py:611-663)."""
    rep = lambda x: jnp.concatenate([x] * mult, axis=0)
    return rep(feats), rep(feat_lens), rep(tokens), rep(token_lens)


def crop_or_pad_spectrogram(feats, feat_lens, *, audio_length: int,
                            pad_value: float = 0.0):
    """Center-crop or symmetric-pad the time dim to a fixed length
    (reference CropOrPadSpectrogramAugmentation,
    audio_preprocessing.py:666-738; used by speech-classification models).
    feats: (B, T, D)."""
    t = feats.shape[1]
    if t > audio_length:
        start = (t - audio_length) // 2
        feats = jax.lax.dynamic_slice_in_dim(feats, start, audio_length,
                                             axis=1)
    elif t < audio_length:
        pad = audio_length - t
        feats = jnp.pad(feats, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)),
                        constant_values=pad_value)
    lens = jnp.full_like(feat_lens, audio_length)
    return feats, lens
