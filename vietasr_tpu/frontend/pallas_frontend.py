"""Fused Pallas log-mel frontend: frame + window + DFT + mel + log in ONE
VMEM-resident pass (SURVEY.md §7.2; reference chain parts/features.py:245-301
materializes the (B, T, 514) spectrum and walks it through 4 more HBM passes).

Why fusion wins here: the XLA path writes/reads the complex spectrum
(B, T, 2*n_bins) f32 — ~8x the bytes of the final (B, T, n_mels) features —
so the chain is HBM-bandwidth-bound. The kernel keeps each frame tile's
spectrum in VMEM and only the log-mel tile ever touches HBM.

TPU-first framing trick: with hop 160 and n_fft 512, the signal tile is a
(span_rows, 160) hop-rows view and frame f spans rows f..f+3, so the
frame-matrix x DFT product decomposes into FOUR shifted-row-block matmuls
(one per hop-row slice of the DFT matrix) summed in fp32 — no per-frame
dynamic slicing, no gather, no cross-sublane concatenate. The windowed
real-DFT matrix rides the MXU and is fetched into VMEM once (its block
index is constant across the grid, so the Pallas pipeline elides every
re-copy). Matmuls run at Precision.HIGHEST: the DFT has heavy cancellation
and log() amplifies bf16 damage into O(1) feature error (measured on v5e:
max err 1.4 at default precision vs 2.6e-4 at HIGHEST — and the HIGHEST
fused kernel is still 1.5x faster than the default-precision XLA chain,
5.6x faster than the equally-accurate XLA chain).

Per-feature normalization needs utterance-GLOBAL stats, so the kernel also
emits per-tile (count, sum, sumsq) partials; a tiny XLA epilogue reduces
them with Bessel correction and normalizes — two elementwise passes over
the small (B, T, n_mels) array.

Numerics contract: identical to frontend/features.py:log_mel_features
(which matches the torch reference to fp32 tolerance) — asserted by
tests/test_pallas_frontend.py on every shipped config.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vietasr_tpu.frontend.features import (FeaturizerConfig,
                                           _windowed_dft_matrix,
                                           feature_seq_len)
from vietasr_tpu.frontend.mel import mel_filterbank

FRAMES_PER_TILE = 128


def _kernel(seq_len_ref, sig_ref, dft_ref, mel_ref, out_ref, part_ref, *,
            hop: int, span_rows: int, n_bins: int, guard: float,
            guard_type: str, precision: str = "highest"):
    """One (batch row, frame tile) step.

    sig_ref: (1, 1, span_rows, hop) signal slice covering the tile (the
      hop-rows view is materialized on the host side: Mosaic requires the
      trailing two block dims to be tileable or full, which (rows, hop) is)
    dft_ref: (span_rows_per_frame * hop, 2 * n_bins_padded) windowed DFT
    mel_ref: (n_bins_padded, n_mels) transposed mel filterbank
    out_ref: (1, FRAMES_PER_TILE, n_mels) log-mel tile
    part_ref: (1, 1, 2, n_mels) this tile's (sum, sumsq) over VALID frames
    """
    t_idx = pl.program_id(1)
    rows = sig_ref[0, 0]                                   # (span_rows, hop)
    f = FRAMES_PER_TILE
    rpf = span_rows - f + 1
    # frame i starts at row i (frame starts are hop-aligned) and spans the
    # next rpf rows; frames @ DFT decomposes as a sum over the rpf shifted
    # row blocks, each against its hop-row slice of the DFT matrix — the
    # same MXU FLOPs with no cross-sublane concatenate (which Mosaic
    # cannot lay out for offsets that are not multiples of 8)
    # precision="highest": fp32 (6-pass) matmuls — the DFT has heavy
    # cancellation, bf16 passes corrupt low-energy bins and log()
    # amplifies the damage into O(1) error on spectral-floor bins
    # (measured: max feature err 1.4 at default precision, 3e-4 at
    # HIGHEST). precision="default": single bf16 passes — the SAME
    # accuracy class as the default-precision XLA chain it replaces at
    # large batch (transcript-neutral on real speech, rooflines §1), at
    # 1/6 the MXU work.
    prec = jax.lax.Precision.HIGHEST if precision == "highest" \
        else jax.lax.Precision.DEFAULT
    dotf = partial(jnp.dot, preferred_element_type=jnp.float32,
                   precision=prec)
    spec = dotf(rows[0:f], dft_ref[0:hop, :])              # (F, 2*nb_pad)
    for i in range(1, rpf):
        spec += dotf(rows[i : f + i], dft_ref[i * hop : (i + 1) * hop, :])
    nb_pad = dft_ref.shape[1] // 2
    # real parts live in cols [0, n_bins), imag in [nb_pad, nb_pad+n_bins);
    # the padding cols are zero so power over the full nb_pad width is exact
    re = spec[:, :nb_pad]
    im = spec[:, nb_pad:]
    power = re * re + im * im                              # (F, nb_pad)
    mel = dotf(power, mel_ref[:, :])                   # (F, n_mels)
    if guard_type == "add":
        logmel = jnp.log(mel + guard)
    else:
        logmel = jnp.log(jnp.maximum(mel, guard))
    out_ref[0] = logmel

    # normalization partials over this tile's VALID frames
    valid = seq_len_ref[pl.program_id(0)] - t_idx * f
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (f, 1), 0)
    mask = (row_ids < valid).astype(jnp.float32)           # (F, 1)
    masked = logmel * mask
    part_ref[0, 0, 0, :] = jnp.sum(masked, axis=0)
    part_ref[0, 0, 1, :] = jnp.sum(masked * logmel, axis=0)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@partial(jax.jit, static_argnames=("cfg", "interpret", "precision"))
def fused_log_mel_features(signal, lengths, *, cfg: FeaturizerConfig,
                           rng=None, training: bool = False,
                           interpret: bool = False,
                           precision: str = "highest"):
    """Drop-in fused replacement for log_mel_features (same contract:
    (B, S) + lengths -> (B, T_padded_to_pad_to, n_mels), seq_len)."""
    from vietasr_tpu.utils.typing import assert_audio_batch

    assert_audio_batch(signal, lengths, port="featurizer.input_signal")
    if cfg.frame_splicing != 1:
        raise NotImplementedError("fused frontend: frame_splicing==1 only")
    bsz, n_samples = signal.shape
    hop = cfg.hop_length
    n_fft = cfg.fft_length
    rows_per_frame = -(-n_fft // hop)        # frame spans this many hop-rows
    n_bins = n_fft // 2 + 1
    n_mels = cfg.features
    x = signal.astype(jnp.float32)

    if cfg.dither > 0 and training:
        if rng is None:
            raise ValueError("dither > 0 in training mode needs an rng key")
        x = x + cfg.dither * jax.random.normal(rng, x.shape)
    if cfg.preemph is not None:
        x = jnp.concatenate([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]],
                            axis=1)
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")

    t_out = (xp.shape[1] - n_fft) // hop + 1
    n_tiles = max((t_out + FRAMES_PER_TILE - 1) // FRAMES_PER_TILE, 1)
    span_rows = FRAMES_PER_TILE + rows_per_frame - 1
    # overlapping tile views: tile t needs samples [t*F*hop, ... + span)
    need = (n_tiles - 1) * FRAMES_PER_TILE * hop + span_rows * hop
    xp = jnp.pad(xp, ((0, 0), (0, max(need - xp.shape[1], 0))))
    tiles = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, t * FRAMES_PER_TILE * hop,
                                      span_rows * hop, axis=1)
         for t in range(n_tiles)], axis=1)   # (B, n_tiles, span*hop)
    tiles = tiles.reshape(bsz, n_tiles, span_rows, hop)

    # windowed real-DFT, rows zero-padded 512 -> span of one frame (640)
    dft = _windowed_dft_matrix(cfg)                        # (n_fft, 2*nb)
    nb_pad = _round_up(n_bins, 128)
    dft_p = np.zeros((rows_per_frame * hop, 2 * nb_pad), np.float32)
    dft_p[:n_fft, :n_bins] = dft[:, :n_bins]
    dft_p[:n_fft, nb_pad : nb_pad + n_bins] = dft[:, n_bins:]
    mel_t = mel_filterbank(cfg.sample_rate, n_fft, n_mels,
                           cfg.lowfreq, cfg.highfreq).T     # (nb, n_mels)
    mel_p = np.zeros((nb_pad, n_mels), np.float32)
    mel_p[:n_bins] = mel_t

    seq_len = feature_seq_len(lengths, hop)                 # (B,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, span_rows, hop),
                         lambda b, t, sl: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_frame * hop, 2 * nb_pad),
                         lambda b, t, sl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_pad, n_mels), lambda b, t, sl: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, FRAMES_PER_TILE, n_mels),
                         lambda b, t, sl: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, n_mels), lambda b, t, sl: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    logmel, parts = pl.pallas_call(
        partial(_kernel, hop=hop, span_rows=span_rows, n_bins=n_bins,
                guard=cfg.log_zero_guard_value,
                guard_type=cfg.log_zero_guard_type, precision=precision),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_tiles * FRAMES_PER_TILE, n_mels),
                                 jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_tiles, 2, n_mels), jnp.float32),
        ],
        interpret=interpret,
    )(seq_len.astype(jnp.int32), tiles, jnp.asarray(dft_p),
      jnp.asarray(mel_p))

    # ---- XLA epilogue: Bessel-corrected per-feature normalization ----
    n = jnp.maximum(seq_len, 1).astype(jnp.float32)[:, None]   # (B, 1)
    s1 = jnp.sum(parts[:, :, 0], axis=1)                        # (B, n_mels)
    s2 = jnp.sum(parts[:, :, 1], axis=1)
    mean = s1 / n
    var = jnp.maximum(s2 - n * mean * mean, 0.0) \
        / jnp.maximum(n - 1.0, 1.0)
    feats = logmel
    if cfg.normalize == "per_feature":
        feats = (feats - mean[:, None, :]) \
            / (jnp.sqrt(var)[:, None, :] + 1e-5)
    elif cfg.normalize:
        raise NotImplementedError(
            f"fused frontend: normalize={cfg.normalize!r} not supported")

    # zero beyond seq_len, trim/pad time to the pad_to grid
    t_ids = jnp.arange(feats.shape[1])[None, :, None]
    feats = jnp.where(t_ids < seq_len[:, None, None], feats, cfg.pad_value)
    t_final = _round_up(t_out, cfg.pad_to) if cfg.pad_to else t_out
    if t_final <= feats.shape[1]:
        feats = feats[:, :t_final]
    else:
        feats = jnp.pad(feats, ((0, 0), (0, t_final - feats.shape[1]),
                                (0, 0)), constant_values=cfg.pad_value)
    return feats, seq_len


def make_fused_featurizer(cfg: FeaturizerConfig, *, interpret: bool = False,
                          precision: str = "highest"):
    """Same factory contract as frontend.features.make_featurizer."""
    return partial(fused_log_mel_features, cfg=cfg, interpret=interpret,
                   precision=precision)


def fused_supported(cfg: FeaturizerConfig) -> bool:
    """True when the fused kernel covers this config's feature set; callers
    fall back to the XLA chain otherwise (same numerics, slower)."""
    return (cfg.frame_splicing == 1 and cfg.log
            and cfg.mag_power == 2.0
            and cfg.normalize in ("per_feature", "", None, False))
