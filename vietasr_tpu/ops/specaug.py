"""SpecAugment / SpecCutout as pure JAX RNG-keyed masking.

Reference semantics (/root/reference/nemo/collections/asr/parts/
spectr_augment.py:33-97): per-sample random bands/rectangles with widths
drawn uniform in [0, width) and starts uniform in [0, dim - width). The
reference loops in Python with a host RNG; here the masks are built
vectorized on device from a PRNG key, so augmentation runs inside the jitted
train step (no host sync, regenerated per microbatch).

Layout note: x is (B, T, D) (time-major, channels last) — the reference is
(B, D, T); freq masks act on D, time masks on T either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vietasr_tpu.config import SpecAugmentConfig


def _band_mask(rng, b: int, dim: int, n_masks: int, width: int,
               active=None):
    """(B, dim) bool — True where zeroed. n_masks bands per sample.

    `active` (optional traced scalar) gates how many of the n_masks
    bands apply: band i is live iff i < active. n_masks stays the STATIC
    maximum, so annealing the count (train/freeze.py value schedules)
    never changes shapes or retraces."""
    r_start, r_width = jax.random.split(rng)
    starts = jax.random.uniform(r_start, (b, n_masks)) * max(dim - width, 1)
    starts = jnp.floor(starts).astype(jnp.int32)
    widths = jax.random.uniform(r_width, (b, n_masks)) * width
    widths = jnp.floor(widths).astype(jnp.int32)
    idx = jnp.arange(dim)[None, None, :]
    bands = (idx >= starts[..., None]) & (idx < (starts + widths)[..., None])
    if active is not None:
        bands = bands & (jnp.arange(n_masks)[None, :, None] < active)
    return jnp.any(bands, axis=1)


def spec_augment(rng, x: jnp.ndarray, cfg: SpecAugmentConfig, *,
                 active_freq=None, active_time=None) -> jnp.ndarray:
    """Frequency + time band masking (SpecAugment, arXiv:1904.08779)."""
    b, t, d = x.shape
    r_f, r_t = jax.random.split(rng)
    mask = jnp.zeros((b, t, d), bool)
    if cfg.freq_masks > 0:
        fm = _band_mask(r_f, b, d, cfg.freq_masks, cfg.freq_width,
                        active=active_freq)
        mask = mask | fm[:, None, :]
    if cfg.time_masks > 0:
        tm = _band_mask(r_t, b, t, cfg.time_masks, cfg.time_width,
                        active=active_time)
        mask = mask | tm[:, :, None]
    return jnp.where(mask, 0.0, x)


def spec_cutout(rng, x: jnp.ndarray, cfg: SpecAugmentConfig) -> jnp.ndarray:
    """Random rectangle cutout (arXiv:1708.04552). Reference draws the
    rectangle start with the freq/time extents and the width with the
    swapped names (spectr_augment.py:86-92); we keep its exact semantics:
    start_f in [0, D - rect_freq), extent_f uniform[0, rect_freq);
    start_t in [0, T - rect_time), extent_t uniform[0, rect_time)."""
    b, t, d = x.shape
    n = cfg.rect_masks
    if n <= 0:
        return x
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    f0 = jnp.floor(jax.random.uniform(r1, (b, n)) * max(d - cfg.rect_freq, 1)
                   ).astype(jnp.int32)
    t0 = jnp.floor(jax.random.uniform(r2, (b, n)) * max(t - cfg.rect_time, 1)
                   ).astype(jnp.int32)
    wf = jnp.floor(jax.random.uniform(r3, (b, n)) * cfg.rect_freq).astype(jnp.int32)
    wt = jnp.floor(jax.random.uniform(r4, (b, n)) * cfg.rect_time).astype(jnp.int32)
    fi = jnp.arange(d)[None, None, :]
    ti = jnp.arange(t)[None, None, :]
    f_band = (fi >= f0[..., None]) & (fi < (f0 + wf)[..., None])   # (B, n, D)
    t_band = (ti >= t0[..., None]) & (ti < (t0 + wt)[..., None])   # (B, n, T)
    rects = jnp.any(t_band[:, :, :, None] & f_band[:, :, None, :], axis=1)
    return jnp.where(rects, 0.0, x)


def apply_spec_augment(rng, x: jnp.ndarray, cfg: SpecAugmentConfig, *,
                       active_freq=None, active_time=None) -> jnp.ndarray:
    """SpectrogramAugmentation NM equivalent: cutout then specaugment
    (reference audio_preprocessing.py:583-608 applies SpecCutout first).
    active_freq/active_time: optional traced counts (<= the config's
    static maxima) for schedule-annealed masking."""
    r_c, r_a = jax.random.split(rng)
    x = spec_cutout(r_c, x, cfg)
    if cfg.freq_masks > 0 or cfg.time_masks > 0:
        x = spec_augment(r_a, x, cfg, active_freq=active_freq,
                         active_time=active_time)
    return x
