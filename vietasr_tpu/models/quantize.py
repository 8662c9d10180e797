"""Post-training int8 quantization for QuartzNet serving.

The MXU on v5e runs int8 matmuls at ~2x the bf16 rate (measured 381
TOP/s vs 197 TF/s at 4096^3 with a realistic dequant/requant epilogue —
tools/bench_int8.py MXU_RATES=1; docs/rooflines.md §8). QuartzNet's
inference FLOPs are dominated by the
1x1 pointwise convs (the K-tap depthwise is VPU work), so serving
quantizes exactly those GEMMs and leaves everything else in
bf16/fp32:

- weights: per-out-channel symmetric int8 (BN already folded in, so
  the channel scales absorb the BN gain exactly);
- activations: per-tensor symmetric int8 with STATIC scales from a
  one-shot calibration pass over representative audio (abs-max; no
  zero points — conv inputs after folded-BN + ReLU are roughly
  symmetric pre-activation and abs-max keeps the dequant a single
  fused multiply);
- accumulate int32 on the MXU, dequantize with the fused
  (x_scale * w_scale[c]) multiply, then bias/activation as usual.

This plugs into `quartznet_apply(pw_fn=...)` — the pointwise-conv
intercept — so the quantized model shares every other code path
(masking, residuals, decode) with the fp32/bf16 one. The reference has
no quantized serving path (torch 1.8 CPU fp32,
/root/reference/infer.py); this is a TPU-native extension.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vietasr_tpu.models.quartznet import EncoderConfig, quartznet_apply
from vietasr_tpu.models.layers import pointwise_conv


class QuantizedPointwise(NamedTuple):
    """One quantized 1x1-conv site."""

    w_i8: jnp.ndarray      # (Cin, Cout) int8
    w_scale: jnp.ndarray   # (Cout,) f32 — per-out-channel
    x_scale: jnp.ndarray   # ()  f32 — per-tensor activation scale


def quantize_weight(w: jnp.ndarray):
    """Per-out-channel symmetric int8: w (Cin, Cout) -> (w_i8, scale)."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)                    # (Cout,)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale


def calibrate_activations(variables: dict, cfg: EncoderConfig,
                          feats: jnp.ndarray, feat_lens: jnp.ndarray,
                          *, compute_dtype=jnp.bfloat16) -> Dict[str, float]:
    """One forward pass recording abs-max of every pointwise-conv INPUT.

    The recording closure captures a TRACER per site while the forward is
    traced, so the whole calibration is ONE jitted program returning a
    dict of scalars (an eager pass would be ~200 dispatch round trips on
    a tunnel-attached chip). `feats` should be real featurized audio —
    scales baked from it are static thereafter.
    """

    @jax.jit
    def run(variables, feats, feat_lens):
        amax: Dict[str, jnp.ndarray] = {}

        def pw_cal(tag, x, w):
            amax[tag] = jnp.max(jnp.abs(x.astype(jnp.float32)))
            return pointwise_conv(x, w)

        quartznet_apply(variables, feats, feat_lens, cfg=cfg,
                        compute_dtype=compute_dtype, pw_fn=pw_cal)
        return amax

    return {tag: float(v)
            for tag, v in run(variables, feats, feat_lens).items()}


def quantize_quartznet(variables: dict, cfg: EncoderConfig,
                       act_amax: Dict[str, float]
                       ) -> Dict[str, QuantizedPointwise]:
    """Build the int8 tables for every calibrated pointwise site.

    `variables` must be BN-FOLDED (models/quartznet.py fold_batchnorm):
    folding first means the per-channel weight scales absorb the BN
    gain exactly instead of quantizing conv and BN separately. Sites
    not present in `act_amax` (e.g. grouped convs, which route through
    dense_conv1d, or a site calibration never reached) stay float.
    """
    tables: Dict[str, QuantizedPointwise] = {}
    params = variables["params"]

    def add(tag, w):
        if tag not in act_amax:
            return
        w_i8, w_scale = quantize_weight(w)
        x_scale = jnp.float32(max(act_amax[tag], 1e-12) / 127.0)
        tables[tag] = QuantizedPointwise(w_i8, w_scale, x_scale)

    for i, bcfg in enumerate(cfg.blocks):
        bp = params["encoder"][i]
        if bcfg.separable and bcfg.groups == 1:
            for r, sub in enumerate(bp["sub"]):
                add(f"enc{i}.sub{r}", sub["pw_w"])
        for p, pane in enumerate(bp["res"]):
            add(f"enc{i}.res{p}", pane["conv_w"])
    add("dec", params["decoder"]["w"])
    return tables


def int8_pw_fn(tables: Dict[str, QuantizedPointwise]):
    """pw_fn for quartznet_apply: int8 MXU GEMM at quantized sites,
    float fallback elsewhere. Output dtype matches the float path
    (f32 accumulate, like pointwise_conv's preferred_element_type)."""

    def pw(tag, x, w):
        q = tables.get(tag)
        if q is None:
            return pointwise_conv(x, w)
        x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / q.x_scale),
                        -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_i8, q.w_i8, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (..., Cout)
        deq = acc.astype(jnp.float32) * (q.x_scale * q.w_scale)
        # keep the folded-BN bf16 activation stream intact (quartznet.py
        # _apply_sub stays in compute_dtype end-to-end after folding)
        return deq.astype(x.dtype)

    return pw


def quantized_apply_fn(variables: dict, cfg: EncoderConfig,
                       tables: Dict[str, QuantizedPointwise]):
    """(feats, feat_lens) -> (log_probs, out_lens): the int8 serving
    forward. jit-compatible (tables close over as constants/pytrees)."""

    pw = int8_pw_fn(tables)

    def apply(feats, feat_lens):
        lp, out_lens, _ = quartznet_apply(
            variables, feats, feat_lens, cfg=cfg,
            compute_dtype=jnp.bfloat16, pw_fn=pw)
        return lp, out_lens

    return apply
