"""Log-mel spectrogram frontend as a pure, jittable JAX function.

Numerics contract: matches the reference featurizer
(/root/reference/nemo/collections/asr/parts/features.py:245-301) to fp32
tolerance:

  dither -> preemphasis (0.97) -> STFT (n_fft 512, win 320, hop 160, hann
  periodic=False, center=True reflect pad) -> |X|^mag_power -> mel matmul
  (Slaney 64 bins) -> log(x + 2^-24) -> optional frame splicing ->
  per-feature masked mean/std normalization (std with Bessel correction,
  parts/features.py:17-30) -> zero beyond seq_len -> pad time to multiple
  of pad_to.

TPU-first design decisions (deliberate departures from the reference *how*):
- The 512-point rFFT is computed as a real DFT **matmul** (frames @ [cos|-sin]),
  a (T, 512) x (512, 514) GEMM that maps straight onto the MXU, instead of a
  cuFFT call. The window is folded into the DFT matrix so framing feeds the
  GEMM directly.
- Everything is a single jitted function over static shapes; time padding to a
  multiple of `pad_to` happens at trace time so XLA sees one shape per bucket.
- Output layout is (B, T, n_mels) — channels last, matching the NWC conv
  layout of the encoder (no transposes between frontend and encoder).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vietasr_tpu.frontend.mel import hann_window, mel_filterbank

LOG_ZERO_GUARD = 2.0 ** -24
STD_GUARD = 1e-5
# causal mode uses a LARGER guard: constant (silent) mel bins have ~zero
# variance, so a 1e-5 guard amplifies fp accumulation noise ~1e5x into
# multi-sigma feature values — and offline (single cumsum) vs streaming
# (carried per-chunk sums) accumulate in different orders, so those bins
# DISAGREE between training and serving. 1e-2 caps the amplification at
# ~1e-4 while leaving active bins (std ~ 1) within 1% (measured round 5:
# streaming WER 0.218 vs offline 0.093 with the 1e-5 guard was the last
# residual of the streaming-garbage finding)
CAUSAL_STD_GUARD = 1e-2


@dataclasses.dataclass(frozen=True)
class FeaturizerConfig:
    """Mirrors the reference YAML section `AudioToMelSpectrogramPreprocessor`
    (/root/reference/configs/quartznet12x1_vi.yaml:8-18)."""

    sample_rate: int = 16000
    window_size: float = 0.02
    window_stride: float = 0.01
    window: str = "hann"
    normalize: str = "per_feature"
    n_fft: Optional[int] = 512
    preemph: Optional[float] = 0.97
    features: int = 64
    lowfreq: float = 0.0
    highfreq: Optional[float] = None
    log: bool = True
    log_zero_guard_type: str = "add"
    log_zero_guard_value: float = LOG_ZERO_GUARD
    dither: float = 1e-5
    pad_to: int = 16
    frame_splicing: int = 1
    pad_value: float = 0.0
    mag_power: float = 2.0
    # accepted for config compatibility; the DFT-matmul path ignores it
    stft_conv: bool = False

    @property
    def win_length(self) -> int:
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.window_stride * self.sample_rate)

    @property
    def fft_length(self) -> int:
        return self.n_fft or 2 ** math.ceil(math.log2(self.win_length))

    @classmethod
    def from_dict(cls, d: dict) -> "FeaturizerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def feature_seq_len(sample_len, hop_length: int):
    """Number of valid feature frames: ceil(len / hop)
    (reference get_seq_len, parts/features.py:238-239)."""
    return jnp.ceil(jnp.asarray(sample_len, jnp.float32) / hop_length).astype(jnp.int32)


def _windowed_dft_matrix(cfg: FeaturizerConfig) -> np.ndarray:
    """Real-DFT matrix with the analysis window folded in.

    Shape (n_fft, 2 * n_bins): frames @ M yields [real | imag] parts of the
    one-sided DFT of the windowed frame. The window (length win_length) is
    zero-padded to n_fft centered, as torch.stft does for win_length < n_fft.
    """
    n_fft = cfg.fft_length
    n_bins = n_fft // 2 + 1
    if cfg.window == "hann":
        win = hann_window(cfg.win_length, dtype=np.float64)
    elif cfg.window in (None, "none", "ones"):
        win = np.ones(cfg.win_length, dtype=np.float64)
    else:
        raise ValueError(f"unsupported window: {cfg.window!r}")
    pad = (n_fft - cfg.win_length) // 2
    win_full = np.zeros(n_fft, dtype=np.float64)
    win_full[pad : pad + cfg.win_length] = win

    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_m = np.cos(ang) * win_full[:, None]
    sin_m = -np.sin(ang) * win_full[:, None]
    return np.concatenate([cos_m, sin_m], axis=1).astype(np.float32)


def _frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, S) -> (B, n_frames, n_fft) with torch.stft center=True semantics:
    reflect-pad n_fft//2 on both sides, n_frames = 1 + S // hop."""
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[:, idx]


def _splice_frames(x: jnp.ndarray, splicing: int) -> jnp.ndarray:
    """Stack time-shifted frames along features: out[t] contains frames
    t..t+splicing-1 (edge-clamped). x is (B, T, D).

    NOTE: the reference splice_frames (parts/features.py:49-59) is a no-op
    bug — its concat reconstructs x unchanged, duplicating features. This
    implements the obviously intended behavior instead.
    """
    seq = [x]
    for n in range(1, splicing):
        shifted = jnp.concatenate(
            [x[:, n:], jnp.repeat(x[:, -1:], n, axis=1)], axis=1)
        seq.append(shifted)
    return jnp.concatenate(seq, axis=2)


def _normalize(x, seq_len, normalize_type: str):
    """Masked per-feature / all-features normalization over valid frames.

    x: (B, T, D); seq_len: (B,). Matches normalize_batch
    (parts/features.py:17-46) including the unbiased (N-1) std and the
    +1e-5 std guard.
    """
    t = x.shape[1]
    mask = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(x.dtype)  # (B, T)
    # guard zero-length rows (partial-batch padding): their output is fully
    # masked to pad_value afterwards, so the stats just need to be finite
    n = jnp.maximum(seq_len, 2).astype(x.dtype)
    if normalize_type == "per_feature":
        mask3 = mask[:, :, None]
        mean = jnp.sum(x * mask3, axis=1) / n[:, None]                   # (B, D)
        var = jnp.sum(((x - mean[:, None, :]) * mask3) ** 2, axis=1) / (n[:, None] - 1.0)
        std = jnp.sqrt(var) + STD_GUARD
        return (x - mean[:, None, :]) / std[:, None, :]
    elif normalize_type == "causal_per_feature":
        # Frame t is normalized by running stats over frames 0..t ONLY —
        # the exact statistics the online streaming featurizer
        # (streaming_online.StreamingFeaturizer) applies at serve time.
        # Training with this mode makes streaming inference match the
        # training-time computation (SURVEY §5.7's deviation, closed):
        # the r4 study measured WER 1.0 streaming vs 0.035 offline for a
        # per_feature-trained model through causal serving stats.
        mask3 = mask[:, :, None]
        xm = x * mask3
        cnt = jnp.cumsum(mask, axis=1)[:, :, None]             # (B, T, 1)
        cnt_safe = jnp.maximum(cnt, 1.0)
        s1 = jnp.cumsum(xm, axis=1)
        s2 = jnp.cumsum(xm * xm, axis=1)
        mean = s1 / cnt_safe
        # unbiased var via m2 / max(cnt-1, 1), m2 = s2 - cnt*mean^2
        var = jnp.maximum(s2 / cnt_safe - mean * mean, 0.0) \
            * (cnt_safe / jnp.maximum(cnt_safe - 1.0, 1.0))
        std = jnp.sqrt(var) + CAUSAL_STD_GUARD
        return (x - mean) / std
    elif normalize_type == "all_features":
        d = x.shape[2]
        mask3 = mask[:, :, None]
        cnt = n * d
        mean = jnp.sum(x * mask3, axis=(1, 2)) / cnt                     # (B,)
        var = jnp.sum(((x - mean[:, None, None]) * mask3) ** 2, axis=(1, 2)) / (cnt - 1.0)
        std = jnp.sqrt(var) + STD_GUARD
        return (x - mean[:, None, None]) / std[:, None, None]
    elif not normalize_type:
        return x
    else:
        raise ValueError(f"unsupported normalize: {normalize_type!r}")


def log_mel_features(
    signal: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    cfg: FeaturizerConfig,
    dft_matrix: jnp.ndarray,
    mel_matrix: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    training: bool = False,
):
    """Compute padded log-mel features.

    Args:
      signal: (B, S) float32 waveform at cfg.sample_rate.
      lengths: (B,) int32 valid sample counts.
      dft_matrix: (n_fft, 2*n_bins) windowed real-DFT matrix.
      mel_matrix: (n_bins, n_mels) — transposed mel filterbank.
      rng: PRNG key for dither noise (required if dither > 0 and training).

    Returns:
      feats: (B, T_padded, n_mels * frame_splicing) float32, zero beyond
        seq_len, T_padded a multiple of cfg.pad_to (static).
      seq_len: (B,) int32 valid frame counts (ceil(len / hop)).
    """
    from vietasr_tpu.utils.typing import assert_audio_batch

    assert_audio_batch(signal, lengths, port="featurizer.input_signal")
    hop = cfg.hop_length
    n_fft = cfg.fft_length
    seq_len = feature_seq_len(lengths, hop)

    x = signal.astype(jnp.float32)
    if cfg.dither > 0 and training:
        if rng is None:
            raise ValueError("dither > 0 in training mode requires an rng key")
        x = x + cfg.dither * jax.random.normal(rng, x.shape, x.dtype)

    if cfg.preemph is not None:
        x = jnp.concatenate([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], axis=1)

    # framing + windowed DFT as ONE strided convolution (stride = hop,
    # kernel = the (n_fft, 2*n_bins) DFT matrix): XLA lowers it onto the
    # MXU with no gather materialization; bit-identical to frame+einsum
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    spec = jax.lax.conv_general_dilated(
        xp[:, :, None], dft_matrix.reshape(n_fft, 1, -1),
        window_strides=(hop,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"))               # (B, T, 2*n_bins)
    n_bins = n_fft // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    power = re * re + im * im                                  # |X|^2
    if cfg.mag_power != 2.0:
        # Deliberate deviation for mag_power != 2: this computes |X|^p.
        # The reference pows re and im separately then sums (re^p + im^p,
        # parts/features.py:193-198), which is not a magnitude for p != 2
        # (and NaNs on negative re/im for fractional p). Parity holds at
        # the default mag_power=2.0, the only value any shipped config uses.
        power = jnp.power(jnp.sqrt(jnp.maximum(power, 0.0)), cfg.mag_power)

    mel = jnp.einsum(
        "btk,km->btm", power, mel_matrix, preferred_element_type=jnp.float32
    )                                                          # (B, T, n_mels)

    if cfg.log:
        if cfg.log_zero_guard_type == "add":
            mel = jnp.log(mel + cfg.log_zero_guard_value)
        elif cfg.log_zero_guard_type == "clamp":
            mel = jnp.log(jnp.maximum(mel, cfg.log_zero_guard_value))
        else:
            raise ValueError(f"bad log_zero_guard_type {cfg.log_zero_guard_type!r}")

    if cfg.frame_splicing > 1:
        mel = _splice_frames(mel, cfg.frame_splicing)

    if cfg.normalize:
        mel = _normalize(mel, seq_len, cfg.normalize)

    # zero-mask beyond seq_len, then pad time to a multiple of pad_to
    t = mel.shape[1]
    mask = (jnp.arange(t)[None, :, None] < seq_len[:, None, None])
    mel = jnp.where(mask, mel, cfg.pad_value)

    if cfg.pad_to > 0 and t % cfg.pad_to != 0:
        pad_amt = cfg.pad_to - t % cfg.pad_to
        mel = jnp.pad(mel, ((0, 0), (0, pad_amt), (0, 0)),
                      constant_values=cfg.pad_value)

    return mel, seq_len


def make_featurizer(cfg: FeaturizerConfig):
    """Bind the constant matrices and return featurize(signal, lengths, ...).

    The DFT/mel matrices are kept as HOST numpy arrays on purpose: a
    jax.Array closure constant must be fetched device-to-host at jit
    LOWERING time (mlir _array_mlir_constant_handler), which stalls every
    cold compile of any program embedding the featurizer by a ~1.1 MB
    round trip — and on a remote-attached chip that fetch can block
    behind the very compile stream it sits in. Host constants embed
    directly into the lowered module with no device traffic."""
    dft = np.asarray(_windowed_dft_matrix(cfg), np.float32)
    mel = np.asarray(
        mel_filterbank(cfg.sample_rate, cfg.fft_length, cfg.features,
                       cfg.lowfreq, cfg.highfreq).T, np.float32)
    return partial(log_mel_features, cfg=cfg, dft_matrix=dft, mel_matrix=mel)
