"""Functional NWC conv / norm primitives for the QuartzNet encoder.

TPU-first layout decisions:
- Activations are (B, T, C) — channels last. Pointwise (1x1) convolutions are
  einsum matmuls that map directly onto the MXU; depthwise convolutions use
  lax.conv_general_dilated with feature_group_count=C.
- Length masking is a jnp.where against an iota mask (no boolean gathers, no
  dynamic shapes), so everything stays jittable with static shapes.

Semantics contract (reference nemo/collections/asr/parts/jasper.py):
- MaskedConv1d (:68-132): zero the input beyond each sequence's length before
  convolving; output lengths follow the standard conv arithmetic
  floor((len + 2p - d(k-1) - 1) / s) + 1.
- BatchNorm1d(eps=1e-3, momentum=0.1) (:392) with torch semantics: batch stats
  over (B, T) including padding, biased var for normalization, unbiased var
  in the running average.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
BN_MOMENTUM = 0.1


def length_mask(t: int, lens: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T, 1) mask of valid positions."""
    return (jnp.arange(t)[None, :, None] < lens[:, None, None]).astype(dtype)


def mask_padding(x: jnp.ndarray, lens: Optional[jnp.ndarray]) -> jnp.ndarray:
    if lens is None:
        return x
    return x * length_mask(x.shape[1], lens, x.dtype)


def conv_out_length(lens, kernel: int, stride: int, dilation: int, padding: int):
    """floor((len + 2p - d(k-1) - 1)/s) + 1 — matches MaskedConv1d.get_seq_len
    (parts/jasper.py:108-111) after the long() truncation."""
    return (lens + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1


def depthwise_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Depthwise conv: x (B, T, C), w (K, C) -> (B, T', C)."""
    k, c = w.shape
    return jax.lax.conv_general_dilated(
        x,
        w.reshape(k, 1, c),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )


def dense_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """Full conv: x (B, T, Cin), w (K, Cin//groups, Cout) -> (B, T', Cout)."""
    if w.shape[0] == 1 and stride == 1 and padding == 0 and groups == 1:
        # pointwise: pure matmul on the MXU
        return jnp.einsum("btc,cd->btd", x, w[0],
                          preferred_element_type=jnp.float32)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


def pointwise_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv as einsum: x (B, T, Cin), w (Cin, Cout)."""
    return jnp.einsum("btc,cd->btd", x, w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# batch norm


def init_batchnorm(c: int) -> Tuple[dict, dict]:
    params = {"scale": jnp.ones((c,), jnp.float32),
              "bias": jnp.zeros((c,), jnp.float32)}
    stats = {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)}
    return params, stats


def batchnorm_apply(
    x: jnp.ndarray,
    params: dict,
    stats: dict,
    *,
    training: bool = False,
    eps: float = BN_EPS,
    momentum: float = BN_MOMENTUM,
):
    """x: (B, T, C). Returns (y, new_stats). In eval mode stats pass through."""
    if training:
        n = x.shape[0] * x.shape[1]
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.mean((x - mean) ** 2, axis=(0, 1))     # biased, for normalization
        unbiased = var * (n / max(n - 1, 1))             # torch running-stat update
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * (inv * params["scale"]) + params["bias"]
    return y, new_stats


def fold_bn_into_conv(conv_w: jnp.ndarray, bn_params: dict, bn_stats: dict,
                      eps: float = BN_EPS):
    """Fold BN into the preceding conv for inference.

    conv_w has output channels on its LAST axis ((K, Cin, Cout), (K, C) for
    depthwise, or (Cin, Cout) pointwise). Returns (w_folded, bias).
    """
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    w = conv_w * inv  # broadcast over last axis
    b = bn_params["bias"] - bn_stats["mean"] * inv
    return w, b


# ---------------------------------------------------------------------------
# misc layers


def group_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Channel shuffle (reference GroupShuffle, parts/jasper.py:135-151).
    x: (B, T, C)."""
    b, t, c = x.shape
    x = x.reshape(b, t, groups, c // groups)
    x = jnp.swapaxes(x, 2, 3)
    return x.reshape(b, t, c)


def squeeze_excite(x: jnp.ndarray, params: dict) -> jnp.ndarray:
    """SE over time (reference SqueezeExcite, parts/jasper.py:154-169).
    Note the reference pools over ALL timesteps (padding included)."""
    y = jnp.mean(x, axis=1)                               # (B, C)
    y = jnp.maximum(y @ params["w1"], 0.0)
    y = jax.nn.sigmoid(y @ params["w2"])
    return x * y[:, None, :]


def activation_fn(name: str):
    if name == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    if name == "hardtanh":
        return lambda x: jnp.clip(x, 0.0, 20.0)
    if name == "selu":
        return jax.nn.selu
    raise ValueError(f"unsupported activation {name!r}")


def dropout(x: jnp.ndarray, rate: float, rng, training: bool) -> jnp.ndarray:
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    # keep-mask straight from raw u32 bits: one integer compare per
    # element. jax.random.bernoulli goes bits -> f32 uniform -> lt, whose
    # convert chain measured ~2.3 ms/step on the conformer train config
    # (96 dropout sites); the u32 threshold is the same Bernoulli(keep)
    # up to 2^-32 probability quantization.
    bits = jax.random.bits(rng, x.shape, jnp.uint32)
    thresh = jnp.uint32(min(int(keep * 2.0 ** 32), 2 ** 32 - 1))
    return jnp.where(bits < thresh, x / keep, 0.0)


# ---------------------------------------------------------------------------
# initializers (torch-compatible)


def xavier_uniform(rng, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ with gain=1 (reference init_weights,
    parts/jasper.py:28-41)."""
    a = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, dtype, -a, a)


def kaiming_uniform(rng, shape, fan_in: int, dtype=jnp.float32):
    """torch kaiming_uniform_ with nonlinearity='relu' (gain=sqrt(2))."""
    bound = float(np.sqrt(2.0) * np.sqrt(3.0 / fan_in))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)
