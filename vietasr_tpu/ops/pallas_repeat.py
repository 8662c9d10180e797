"""Fused QuartzNet repeat-block: R x (depthwise + pointwise + foldedBN +
ReLU) + residual in ONE Pallas kernel, activations VMEM-resident.

Why this exists (VERDICT r3 #6): quartznet15x5 inference is HBM-BOUND —
77 stacked convs each round-trip the (B, T, C) activations through HBM,
~14 MB per audio-second against a measured ~240 GB/s effective
bandwidth, which pins the XLA path to MFU ~0.17 (docs/rooflines.md §2b).
Round 2 built and deleted a fused SINGLE sub-layer kernel (0.83x XLA —
the K-tap depthwise is VPU-FLOP-bound and fusing one layer saves almost
no traffic). This kernel is the traffic-shaped attack instead: a whole
repeat-5 block (10 convs + biases + activations + the residual 1x1) runs
out of VMEM, so the activations touch HBM once on the way in and once on
the way out — ~5x less block traffic, moving the bound toward the
depthwise VPU FLOPs.

Shape strategy:
- (T, C) tiles, channels on lanes (C = 256/512 = 2/4 lane groups).
- Time is tiled with a halo of R*(K//2) rows per side; each repeat's
  valid extent shrinks by K//2 per side, so every stage computes only
  the rows later stages still need (statically sliced — the repeat loop
  is unrolled, R is tiny).
- depthwise = fori_loop of K shifted (E, C) FMAs on the VPU (f32
  accumulation, same numerics as the XLA path's preferred_element_type).
- pointwise/residual = (E, C_in) @ (C_in, C_out) bf16 MXU matmuls with
  f32 accumulation, + folded-BN bias.
- per-sample length masking before every conv, matching the XLA path
  exactly (mask -> dw -> mask -> pw, quartznet.py:_apply_sub); padded
  rows inside the batch produce the same relu(b_pw + b_res) values as
  XLA, and tile-padding rows are sliced off by the wrapper.

Eligibility (quartznet.py routes here under `block_impl="auto"`):
separable, stride 1, dilation 1, groups 1, no heads/SE, folded BN
(inference), plain add-residual with a single pane — exactly the shape
of quartznet15x5's 15 big blocks (configs/quartznet15x5.yaml:183-199)
and the 12x1 body. Everything else stays on XLA.

Reference for parity: JasperBlock.forward /root/reference/nemo/
collections/asr/parts/jasper.py:408-448 (masked convs 268-292).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _kernel(lens_ref, x_tiles, dw_ref, pw_refs, b_ref, resw_ref, resb_ref,
            out_ref, stage_ref, *, tile_t: int, k: int, r: int, c_in: int,
            c_max: int, c_out: int, last_act: bool, has_res: bool,
            out_dtype):
    """One (batch, tile) grid step: the whole repeat block in VMEM.

    Activations run at c_max lanes throughout (the first repeat's
    narrower C_in is zero-padded; the zero-padded dw rows / pw rows
    neutralize the extra channels), and each repeat's masked input is
    staged into a VMEM scratch so the K-tap loop can read shifted rows
    with pl.ds — Mosaic has no dynamic_slice on VALUES."""
    k2 = k // 2
    h = r * k2
    e0 = tile_t + 2 * h
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    length = lens_ref[b_idx]

    # row p of the tile maps to original row g = t_idx*tile_t + p - h
    # (the wrapper pre-pads the sequence with h zeros); valid iff
    # 0 <= g < length
    g = jax.lax.broadcasted_iota(jnp.int32, (e0, 1), 0) \
        + t_idx * tile_t - h
    mask_full = ((g >= 0) & (g < length))                   # (E0, 1) bool

    x0 = x_tiles[0, 0].astype(jnp.float32)                  # (E0, C_in)
    if c_in < c_max:
        x0 = jnp.concatenate(
            [x0, jnp.zeros((e0, c_max - c_in), jnp.float32)], axis=1)
    cur = x0                                                # (E0, C_max)
    stage_ref[...] = jnp.zeros(stage_ref.shape, jnp.float32)

    k_pad = (k + 7) // 8 * 8
    for rr in range(r):
        e_in = e0 - 2 * rr * k2
        e_out = e_in - 2 * k2
        off = rr * k2
        m = mask_full[off:off + e_in]
        stage_ref[0:e_in] = jnp.where(m, cur, 0.0)          # (E_in, C_max)

        # Mosaic requires dynamic sublane starts to be provably 8-aligned,
        # so the K taps run as ceil(K/8) aligned 8-row groups with the
        # in-group shift unrolled as static value slices. Taps >= K read
        # zero dw rows (the stack is row-padded) against zeroed stage
        # tail rows, contributing nothing.
        def tap8(q, acc):
            base = pl.multiple_of(q * 8, 8)
            rows = dw_ref[rr, pl.ds(base, 8)]               # (8, C_max)
            seg = stage_ref[pl.ds(base, e_out + 8)]         # (E_out+8, C)
            for rem in range(8):
                acc = acc + seg[rem:rem + e_out] * rows[rem:rem + 1]
            return acc

        acc0 = jnp.zeros((e_out, c_max), jnp.float32)
        y = jax.lax.fori_loop(0, k_pad // 8, tap8, acc0)    # (E_out, C_max)
        m2 = mask_full[off + k2:off + k2 + e_out]
        y = jnp.where(m2, y, 0.0)
        z = jax.lax.dot_general(
            y.astype(jnp.bfloat16), pw_refs[rr][...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (E_out, C_out)
        z = z + b_ref[rr][None, :]
        if rr < r - 1 or last_act:
            z = jnp.maximum(z, 0.0)
        if c_out < c_max:
            z = jnp.concatenate(
                [z, jnp.zeros((e_out, c_max - c_out), jnp.float32)],
                axis=1)
        cur = z

    cur = cur[:, :c_out]
    # cur: (tile_t, C_out) — the center rows
    if has_res:
        center = x_tiles[0, 0, h:h + tile_t].astype(jnp.float32)
        m_c = mask_full[h:h + tile_t]
        res = jax.lax.dot_general(
            jnp.where(m_c, center, 0.0).astype(jnp.bfloat16),
            resw_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        res = res + resb_ref[...][None, :]
        cur = cur + res
    cur = jnp.maximum(cur, 0.0)                             # final ReLU
    out_ref[0, 0] = cur.astype(out_dtype)


def fused_repeat_block(
    x: jnp.ndarray,                 # (B, T, C_in)
    lens: jnp.ndarray,              # (B,) int32
    dw_ws: Sequence[jnp.ndarray],   # R x (K, C_r)  (C_0 = C_in, else C_out)
    pw_ws: Sequence[jnp.ndarray],   # R x (C_r, C_out)
    bs: Sequence[jnp.ndarray],      # R x (C_out,)
    res_w: Optional[jnp.ndarray],   # (C_in, C_out) or None
    res_b: Optional[jnp.ndarray],   # (C_out,) or None
    *,
    kernel: int,
    last_act: bool = False,
    tile_t: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, T, C_out) — the block's output after residual + ReLU.

    `last_act=True` also applies ReLU after the final repeat BEFORE the
    residual add (not used by QuartzNet; kept for generality)."""
    bsz, t, c_in = x.shape
    r = len(dw_ws)
    c_out = pw_ws[-1].shape[1]
    k2 = kernel // 2
    h = r * k2

    if tile_t <= 0:
        # as few tiles as possible under a VMEM-friendly cap, then the
        # smallest 16-multiple tile that still covers T
        n_tiles = max((t + 1023) // 1024, 1)
        tile_t = _round_up((t + n_tiles - 1) // n_tiles, 16)
    n_tiles = (t + tile_t - 1) // tile_t
    e0 = tile_t + 2 * h

    # pad: h zeros left, then out to n_tiles*tile_t + h on the right
    total = n_tiles * tile_t
    xp = jnp.pad(x, ((0, 0), (h, total - t + h), (0, 0)))
    # overlapping tile views (B, n_tiles, E0, C): tile i starts at row
    # i*tile_t of the padded array
    tiles = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, i * tile_t, e0, axis=1)
         for i in range(n_tiles)], axis=1)

    # stack per-repeat weights; first repeat may have a narrower C_in —
    # zero-pad its rows/channels so one ref serves all repeats (zeros
    # contribute nothing)
    c_max = max(w.shape[1] for w in dw_ws)
    k_pad = (kernel + 7) // 8 * 8        # aligned 8-row tap groups
    dw_stack = jnp.stack(
        [jnp.pad(w.astype(jnp.float32),
                 ((0, k_pad - kernel), (0, c_max - w.shape[1])))
         for w in dw_ws])                                   # (R, Kpad, Cmax)
    pw_pads = [jnp.pad(w.astype(jnp.bfloat16),
                       ((0, c_max - w.shape[0]), (0, 0)))
               for w in pw_ws]                              # R x (C_max, C_out)
    b_stack = jnp.stack([b.astype(jnp.float32) for b in bs])  # (R, C_out)
    has_res = res_w is not None
    resw = (res_w.astype(jnp.bfloat16) if has_res
            else jnp.zeros((c_in, c_out), jnp.bfloat16))
    resb = (res_b.astype(jnp.float32) if has_res
            else jnp.zeros((c_out,), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, e0, c_in), lambda b, i, sl: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k_pad, c_max), lambda b, i, sl: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((c_max, c_out), lambda b, i, sl: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(r)
        ] + [
            pl.BlockSpec((r, c_out), lambda b, i, sl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda b, i, sl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out,), lambda b, i, sl: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_t, c_out),
                               lambda b, i, sl: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((e0 + 8, c_max), jnp.float32)],
    )

    def kern(lens_ref, x_tiles, dw_ref, *rest):
        pw_refs = rest[:r]
        b_ref, resw_ref, resb_ref, out_ref, stage_ref = rest[r:]
        _kernel(lens_ref, x_tiles, dw_ref, pw_refs, b_ref, resw_ref,
                resb_ref, out_ref, stage_ref, tile_t=tile_t, k=kernel,
                r=r, c_in=c_in, c_max=c_max, c_out=c_out,
                last_act=last_act, has_res=has_res, out_dtype=x.dtype)

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles, tile_t, c_out),
                                       x.dtype),
        interpret=interpret,
    )(lens.astype(jnp.int32), tiles, dw_stack, *pw_pads, b_stack,
      resw, resb)
    return out.reshape(bsz, n_tiles * tile_t, c_out)[:, :t]


def block_eligible(bcfg, params, training: bool) -> bool:
    """Can this block take the fused path? (see module docstring)"""
    return (not training
            and bcfg.separable
            and bcfg.stride == 1
            and bcfg.dilation == 1
            and bcfg.groups <= 1
            and bcfg.heads <= 0
            and not bcfg.se
            and all("b" in s for s in params["sub"])       # folded BN
            and len(params["res"]) <= 1
            and all("b" in p and "se" not in p for p in params["res"]))
