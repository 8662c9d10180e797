"""Device-side G.711 decode (jnp) — the 8-bit telephony wire format.

Shipping mu-law/A-law bytes instead of int16 PCM halves host->device
traffic on the upload-bound long-form and streaming paths (the axon
tunnel measures ~64 MB/s; see docs/rooflines.md §6/§7), and telephony
sources are G.711 to begin with. Decode is pure elementwise integer
bit-twiddling — fused by XLA into the ingest program.

Bit-exact with the host codec (vietasr_tpu/audio/g711.py, itself
bit-exact vs audioop over all 256 codes): tests/test_g711.py.
"""

from __future__ import annotations

import jax.numpy as jnp

_SCALE = 1.0 / 32768.0


def ulaw_decode_f32(u: jnp.ndarray) -> jnp.ndarray:
    """uint8 mu-law codes -> float32 in [-1, 1] (int16-compatible scale)."""
    u = (~u.astype(jnp.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = jnp.left_shift((mant << 3) + 0x84, exp) - 0x84
    return jnp.where(sign != 0, -mag, mag).astype(jnp.float32) * _SCALE


def alaw_decode_f32(u: jnp.ndarray) -> jnp.ndarray:
    """uint8 A-law codes -> float32 in [-1, 1] (int16-compatible scale)."""
    u = u.astype(jnp.int32) ^ 0x55
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag0 = (mant << 4) + 8
    magn = jnp.left_shift((mant << 4) + 0x108,
                          jnp.maximum(exp - 1, 0))
    mag = jnp.where(exp == 0, mag0, magn)
    return jnp.where(sign != 0, mag, -mag).astype(jnp.float32) * _SCALE
