"""Pallas TPU kernel: fused separable QuartzNet block (inference).

One VMEM-resident pass computes what the XLA path does in ~8 HBM
round-trips per block (reference semantics parts/jasper.py:408-448 with BN
folded):

    y = relu( pointwise( depthwise(x) * [t < len] ) + pw_b
              + x @ res_w + res_b )

- grid = (B,): each program processes one utterance's full (T, C) pane —
  for QuartzNet shapes (T<=1600, C<=512, bf16) everything fits VMEM.
- depthwise conv = K shifted multiply-accumulates on the VPU over the
  halo-padded tile; pointwise + residual 1x1 are MXU jnp.dots with fp32
  accumulation.
- the valid-length mask rides in as a scalar-prefetch array (SMEM).

Applies to stride-1, dilation-1, group-1 separable blocks with a single
residual pane (13 of the 15 blocks in quartznet12x1_vi); the XLA path
handles the rest. Training keeps the XLA path (BN batch stats + autodiff).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lens_ref, x_ref, dw_ref, pw_ref, pwb_ref, resw_ref, resb_ref,
            out_ref, *, k: int, t: int):
    pad = k // 2
    b = pl.program_id(0)
    length = lens_ref[b]

    x_pad = x_ref[0]                         # (T + 2*pad, C) bf16
    x_mid = x_pad[pad : pad + t, :]          # the unpadded tile

    # depthwise: K shifted MACs on the VPU, fp32 accumulator
    acc = jnp.zeros_like(x_mid, dtype=jnp.float32)
    for kk in range(k):
        acc = acc + x_pad[kk : kk + t, :].astype(jnp.float32) \
            * dw_ref[kk, :].astype(jnp.float32)

    # mask frames beyond the valid length before the pointwise conv
    # (reference MaskedConv1d zero-fill, parts/jasper.py:113-118)
    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    acc = jnp.where(row < length, acc, 0.0)

    y = jnp.dot(acc.astype(x_mid.dtype), pw_ref[...],
                preferred_element_type=jnp.float32)
    y = y + pwb_ref[...].astype(jnp.float32)

    res = jnp.dot(x_mid, resw_ref[...], preferred_element_type=jnp.float32)
    y = y + res + resb_ref[...].astype(jnp.float32)

    out_ref[0] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_separable_block(x, lens, dw_w, pw_w, pw_b, res_w, res_b,
                          *, interpret: bool = False):
    """x: (B, T, C) [masked beyond lens by the caller], returns (B, T, Cout).

    Weights are the folded-BN inference weights: dw_w (K, C), pw_w (C, Cout),
    pw_b (Cout,), res_w (C, Cout), res_b (Cout,).
    """
    bsz, t, c = x.shape
    k = dw_w.shape[0]
    c_out = pw_w.shape[1]
    pad = k // 2
    dtype = x.dtype
    x_pad = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, t + 2 * pad, c), lambda b, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda b, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c_out), lambda b, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda b, lens: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c_out), lambda b, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda b, lens: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c_out), lambda b, lens: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, k=k, t=t),
        out_shape=jax.ShapeDtypeStruct((bsz, t, c_out), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lens.astype(jnp.int32), x_pad.astype(dtype), dw_w.astype(dtype),
      pw_w.astype(dtype), pw_b, res_w.astype(dtype), res_b)


def block_is_fusable(bcfg, params) -> bool:
    """Eligibility for the fused kernel (folded separable stride-1 block
    with exactly one folded residual pane)."""
    return (bcfg.separable and bcfg.stride == 1 and bcfg.dilation == 1
            and bcfg.groups == 1 and bcfg.heads == -1 and bcfg.repeat == 1
            and "b" in params["sub"][0]
            and len(params["res"]) == 1 and "b" in params["res"][0]
            and not bcfg.se)
