"""On-device polyphase FIR resampling.

The reference resamples on the host with librosa
(/root/reference/nemo/collections/asr/parts/segment.py:95-100,
/root/reference/app.py:66); our host path mirrors that with
scipy.signal.resample_poly (audio/io.py:79-85). For long-form serving on a
remote-attached TPU the host resample is actively harmful: it doubles (or
quadruples) the bytes crossing the host->device link BEFORE upload. This
module runs the SAME polyphase filter on device as one dilated/strided
convolution (SURVEY.md §2.9: "resample as polyphase filter — can run as
JAX conv for on-device path"), so callers can ship the native-rate PCM and
convert on chip.

Numerics: taps are exactly scipy's (firwin kaiser beta=5.0, 10*max_rate
half-length, scaled by `up`), the conv is zero-padded like upfirdn, and
the output window matches resample_poly's delay trim — equality with the
host path is asserted to fp32 tolerance by tests/test_ops_misc.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _scipy_taps(up: int, down: int) -> np.ndarray:
    from scipy.signal import firwin

    max_rate = max(up, down)
    half_len = 10 * max_rate
    return (firwin(2 * half_len + 1, 1.0 / max_rate,
                   window=("kaiser", 5.0)) * up).astype(np.float32)


def make_device_resampler(orig_sr: int, target_sr: int):
    """Return resample(x: (..., N) f32) -> (..., ceil(N*up/down)) f32, a
    jit-friendly device function equal to audio/io.resample."""
    if orig_sr == target_sr:
        return lambda x: x
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    taps = _scipy_taps(up, down)
    half = (len(taps) - 1) // 2
    return partial(_resample_apply, taps=jnp.asarray(taps), up=up,
                   down=down, half=half)


@partial(jax.jit, static_argnames=("up", "down", "half"))
def _resample_apply(x: jnp.ndarray, *, taps: jnp.ndarray, up: int,
                    down: int, half: int):
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    lead = x.shape[:-1]
    n = x.shape[-1]
    n_out = -(-n * up // down)                      # ceil
    xb = x.reshape((-1, 1, n))
    # upfirdn = zero-stuff by `up` (lhs dilation), full zero-padded conv
    # with the symmetric FIR (correlation == convolution), take every
    # `down`-th output starting at the filter delay `half`
    k = taps.shape[0]
    n_up = (n - 1) * up + 1
    pad_l = half
    pad_r = (n_out - 1) * down + k - half - n_up    # exact cover
    y = jax.lax.conv_general_dilated(
        xb, taps[None, None, :], window_strides=(down,),
        padding=[(pad_l, max(pad_r, 0))], lhs_dilation=(up,),
        precision=jax.lax.Precision.HIGHEST)
    y = y[:, 0, :n_out].reshape(lead + (n_out,))
    return y[0] if squeeze else y
