"""QuartzNet/Jasper encoder + CTC head as functional pytree modules.

Rebuilds the capabilities of the reference encoder
(/root/reference/nemo/collections/asr/jasper.py:17-254 and
parts/jasper.py:172-448) the TPU way:

- Variables are plain pytrees: {"params": ..., "batch_stats": ...}. There is
  no module object graph; `quartznet_apply` is a pure function you jit/grad.
- NWC layout; depthwise convs via feature_group_count, pointwise (1x1) convs
  and the CTC head as MXU einsum matmuls.
- `fold_batchnorm` produces an inference tree with BN folded into conv
  weights + bias, removing all normalization work from the decode path.

Supported block features for config parity: repeat, separable, groups (+
channel shuffle), heads, dilation, stride, residual (add/max, dense panes),
squeeze-excite, relu/hardtanh/selu, dropout, conv length masking.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vietasr_tpu.config import BlockConfig, EncoderConfig
from vietasr_tpu.models.layers import (
    activation_fn,
    batchnorm_apply,
    conv_out_length,
    dense_conv1d,
    depthwise_conv1d,
    dropout,
    fold_bn_into_conv,
    group_shuffle,
    init_batchnorm,
    kaiming_uniform,
    mask_padding,
    pointwise_conv,
    squeeze_excite,
    xavier_uniform,
)


def _conv_init(rng, shape, mode: str, fan_in: int, fan_out: int):
    if mode == "xavier_uniform":
        return xavier_uniform(rng, shape, fan_in, fan_out)
    if mode == "kaiming_uniform":
        return kaiming_uniform(rng, shape, fan_in)
    if mode == "xavier_normal":
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        return std * jax.random.normal(rng, shape)
    if mode == "kaiming_normal":
        std = (2.0 / fan_in) ** 0.5
        return std * jax.random.normal(rng, shape)
    raise ValueError(f"unknown init mode {mode!r}")


# ---------------------------------------------------------------------------
# init


def _init_sub(rng, bcfg: BlockConfig, c_in: int, c_out: int, mode: str):
    """One conv(+BN) sub-layer. Weight layouts: depthwise (K, C) [or (K, heads)],
    pointwise/1x1 (Cin, Cout), dense (K, Cin//groups, Cout)."""
    k = bcfg.effective_kernel
    keys = jax.random.split(rng, 3)
    params: dict = {}
    if bcfg.separable:
        dw_ch = bcfg.heads if bcfg.heads != -1 else c_in
        # torch fan for depthwise weight (C, 1, K): fan_in=K, fan_out=C*K
        params["dw_w"] = _conv_init(keys[0], (k, dw_ch), mode, k, dw_ch * k)
        # pointwise (Cout, Cin/groups, 1): fan_in=Cin/groups, fan_out=Cout
        g = bcfg.groups
        if g > 1:
            params["pw_w"] = _conv_init(
                keys[1], (1, c_in // g, c_out), mode, c_in // g, c_out)
        else:
            params["pw_w"] = _conv_init(keys[1], (c_in, c_out), mode, c_in, c_out)
    else:
        g = bcfg.groups
        params["conv_w"] = _conv_init(
            keys[0], (k, c_in // g, c_out), mode, (c_in // g) * k, c_out * k)
    bn_params, bn_stats = init_batchnorm(c_out)
    params["bn"] = bn_params
    return params, {"bn": bn_stats}


def _init_se(rng, c: int, ratio: int, mode: str):
    k1, k2 = jax.random.split(rng)
    hidden = c // ratio
    return {
        "w1": _conv_init(k1, (c, hidden), mode, c, hidden),
        "w2": _conv_init(k2, (hidden, c), mode, hidden, c),
    }


def _init_block(rng, bcfg: BlockConfig, c_in: int, res_panes: Sequence[int],
                mode: str):
    params: dict = {"sub": [], "res": [], "se": []}
    stats: dict = {"sub": [], "res": []}
    c = c_in
    for r in range(bcfg.repeat):
        rng, sub_rng = jax.random.split(rng)
        p, s = _init_sub(sub_rng, bcfg, c, bcfg.filters, mode)
        params["sub"].append(p)
        stats["sub"].append(s)
        c = bcfg.filters
        if bcfg.se and not bcfg.residual:
            # one SE per repeat, matching the reference (per-repeat append
            # at parts/jasper.py:238-239 plus the final one at :259-260)
            rng, se_rng = jax.random.split(rng)
            params["se"].append(_init_se(se_rng, bcfg.filters,
                                         bcfg.se_reduction_ratio, mode))
    if bcfg.residual:
        for pane_c in res_panes:
            rng, r1, r2 = jax.random.split(rng, 3)
            pane: dict = {
                "conv_w": _conv_init(r1, (pane_c, bcfg.filters), mode,
                                     pane_c, bcfg.filters)
            }
            bn_p, bn_s = init_batchnorm(bcfg.filters)
            pane["bn"] = bn_p
            if bcfg.se:
                pane["se"] = _init_se(r2, bcfg.filters,
                                      bcfg.se_reduction_ratio, mode)
            params["res"].append(pane)
            stats["res"].append({"bn": bn_s})
    return params, stats


def init_quartznet(rng: jax.Array, cfg: EncoderConfig, num_classes: int):
    """Build the variable tree. num_classes EXCLUDES the blank; the head
    outputs num_classes + 1 (reference jasper.py:247)."""
    enc_params: List[dict] = []
    enc_stats: List[dict] = []
    feat_in = cfg.feat_in
    residual_panes: List[int] = []
    for bcfg in cfg.blocks:
        if bcfg.residual_dense:
            residual_panes.append(feat_in)
            panes = list(residual_panes)
        elif bcfg.residual:
            panes = [feat_in]
        else:
            panes = []
        rng, block_rng = jax.random.split(rng)
        p, s = _init_block(block_rng, bcfg, feat_in, panes, cfg.init_mode)
        enc_params.append(p)
        enc_stats.append(s)
        feat_in = bcfg.filters

    rng, w_rng, b_rng = jax.random.split(rng, 3)
    v = num_classes + 1
    dec = {
        "w": _conv_init(w_rng, (feat_in, v), cfg.init_mode, feat_in, v),
        # torch Conv1d default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        "b": jax.random.uniform(b_rng, (v,), jnp.float32,
                                -(feat_in ** -0.5), feat_in ** -0.5),
    }
    return {
        "params": {"encoder": enc_params, "decoder": dec},
        "batch_stats": {"encoder": enc_stats},
    }


# ---------------------------------------------------------------------------
# apply


def _apply_depthwise(x, w, bcfg: BlockConfig):
    if bcfg.heads == -1:
        return depthwise_conv1d(x, w, stride=bcfg.stride,
                                dilation=bcfg.dilation,
                                padding=bcfg.same_padding)
    # heads: share one (K, heads) filter across C/heads channel groups
    # (reference MaskedConv1d heads path, parts/jasper.py:123-130)
    b, t, c = x.shape
    h = bcfg.heads
    xh = x.reshape(b, t, c // h, h)
    xh = jnp.moveaxis(xh, 2, 1).reshape(b * (c // h), t, h)
    yh = depthwise_conv1d(xh, w, stride=bcfg.stride, dilation=bcfg.dilation,
                          padding=bcfg.same_padding)
    t2 = yh.shape[1]
    y = yh.reshape(b, c // h, t2, h)
    return jnp.moveaxis(y, 1, 2).reshape(b, t2, c)


def _default_pw(tag, x, w):
    return pointwise_conv(x, w)


def _apply_sub(x, lens, params, stats, bcfg: BlockConfig, conv_mask: bool,
               training: bool, compute_dtype=None, pw_fn=_default_pw,
               tag=""):
    """conv(+shuffle)+BN. Returns (y, new_lens, new_stats).

    compute_dtype=bfloat16 runs the convs/matmuls on the MXU in bf16 with
    fp32 accumulation (preferred_element_type in layers.py); BN/residual
    math stays fp32. This replaces the reference's Apex AMP levels
    (actions.py:352-378) — no loss scaling is needed on TPU bf16.
    """
    new_stats = dict(stats)
    cast = (lambda a: a.astype(compute_dtype)) if compute_dtype else (lambda a: a)
    if bcfg.separable:
        if conv_mask:
            x = mask_padding(x, lens)
        x = _apply_depthwise(cast(x), cast(params["dw_w"]), bcfg)
        lens = conv_out_length(lens, bcfg.effective_kernel, bcfg.stride,
                               bcfg.dilation, bcfg.same_padding)
        if conv_mask:
            x = mask_padding(x, lens)
        if bcfg.groups > 1:
            w = params["pw_w"][None] if params["pw_w"].ndim == 2 \
                else params["pw_w"]
            x = dense_conv1d(cast(x), cast(w), groups=bcfg.groups)
        else:
            x = pw_fn(tag, cast(x), cast(params["pw_w"]))
    else:
        if conv_mask:
            x = mask_padding(x, lens)
        x = dense_conv1d(cast(x), cast(params["conv_w"]), stride=bcfg.stride,
                         dilation=bcfg.dilation, padding=bcfg.same_padding,
                         groups=bcfg.groups)
        lens = conv_out_length(lens, bcfg.effective_kernel, bcfg.stride,
                               bcfg.dilation, bcfg.same_padding)
    if "bn" in params:
        x = x.astype(jnp.float32)
        x, new_stats["bn"] = batchnorm_apply(x, params["bn"], stats["bn"],
                                             training=training)
    else:
        # folded-BN inference: stay in compute_dtype end-to-end — activations
        # never round-trip through fp32, halving HBM traffic
        x = x + cast(params["b"])
    if bcfg.groups > 1:
        x = group_shuffle(x, bcfg.groups)
    return x, lens, new_stats


def _apply_block(xs, lens_orig, params, stats, bcfg: BlockConfig,
                 cfg: EncoderConfig, training: bool, rng,
                 compute_dtype=None, pw_fn=_default_pw, block_idx=0,
                 block_impl="auto"):
    """Reference JasperBlock.forward (parts/jasper.py:408-448).

    The conv stack stays on XLA (block_impl="auto" == "xla"). Two fused
    Pallas attempts, both measured and refuted: (round 2) a SINGLE
    sub-layer kernel at 0.83x XLA; (round 4) the whole-REPEAT-block
    VMEM-resident kernel (ops/pallas_repeat.py, available via
    block_impl="pallas") at 0.26x XLA on the 15x5 serving shape — the
    K-tap depthwise needs unaligned shifted sublane reads that Mosaic
    lowers far worse than XLA's conv emitter, and the corrected HBM
    bandwidth (~620 GB/s, rooflines §8) shows activation traffic was
    never the 15x5 bound anyway. Numbers in docs/rooflines.md §2b."""
    use_fused = (block_impl == "pallas"
                 and compute_dtype == jnp.bfloat16
                 and cfg.activation == "relu"
                 and cfg.residual_mode == "add"
                 and cfg.conv_mask
                 and pw_fn is _default_pw
                 and not bcfg.residual_dense
                 # residual pane 0 must alias the block input: with a
                 # preceding residual_dense block len(xs) > 1 and pane 0
                 # is xs[0], not xs[-1] (ADVICE r4)
                 and len(xs) == 1)
    if use_fused:
        from vietasr_tpu.ops.pallas_repeat import (block_eligible,
                                                   fused_repeat_block)

        if block_eligible(bcfg, params, training):
            x = xs[-1]
            r = bcfg.repeat
            out = fused_repeat_block(
                x.astype(compute_dtype), lens_orig,
                [params["sub"][j]["dw_w"] for j in range(r)],
                [params["sub"][j]["pw_w"] for j in range(r)],
                [params["sub"][j]["b"] for j in range(r)],
                params["res"][0]["conv_w"] if params["res"] else None,
                params["res"][0]["b"] if params["res"] else None,
                kernel=bcfg.kernel,
                interpret=jax.default_backend() == "cpu")
            return [out], lens_orig, {"sub": [dict(s) for s in
                                              stats["sub"]],
                                      "res": list(stats["res"])}
    act = activation_fn(cfg.activation)
    out = xs[-1]
    lens = lens_orig
    new_stats = {"sub": [], "res": list(stats["res"])}
    for r in range(bcfg.repeat):
        out, lens, s = _apply_sub(out, lens, params["sub"][r],
                                  stats["sub"][r], bcfg, cfg.conv_mask,
                                  training, compute_dtype, pw_fn,
                                  f"enc{block_idx}.sub{r}")
        new_stats["sub"].append(s)
        if r < bcfg.repeat - 1:
            out = act(out)
            if training and bcfg.dropout > 0:
                rng, d_rng = jax.random.split(rng)
                out = dropout(out, bcfg.dropout, d_rng, training)
            if bcfg.se and not bcfg.residual:
                out = squeeze_excite(out, params["se"][r])

    if bcfg.se and not bcfg.residual and params["se"]:
        out = squeeze_excite(out, params["se"][-1])

    if params["res"]:
        cast = (lambda a: a.astype(compute_dtype)) if compute_dtype \
            else (lambda a: a)
        for i, pane in enumerate(params["res"]):
            res = xs[i]
            if cfg.conv_mask:
                res = mask_padding(res, lens_orig)
            res = pw_fn(f"enc{block_idx}.res{i}", cast(res),
                        cast(pane["conv_w"]))
            if "bn" in pane:
                res = res.astype(jnp.float32)
                res, new_stats["res"][i] = dict_bn(res, pane,
                                                   stats["res"][i], training)
            else:
                res = res + cast(pane["b"])
            if "se" in pane:
                res = squeeze_excite(res, pane["se"])
            if cfg.residual_mode == "add":
                out = out + res
            else:
                out = jnp.maximum(out, res)

    out = act(out)
    if training and bcfg.dropout > 0:
        rng, d_rng = jax.random.split(rng)
        out = dropout(out, bcfg.dropout, d_rng, training)

    if params["res"] and bcfg.residual_dense:
        return xs + [out], lens, new_stats
    return [out], lens, new_stats


def dict_bn(x, pane_params, pane_stats, training):
    if "bn" in pane_params:
        y, s = batchnorm_apply(x, pane_params["bn"], pane_stats["bn"],
                               training=training)
        return y, {"bn": s}
    return x + pane_params["b"], pane_stats  # folded inference


def quartznet_apply(
    variables: dict,
    feats: jnp.ndarray,
    feat_lens: jnp.ndarray,
    *,
    cfg: EncoderConfig,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=None,
    pw_fn=_default_pw,
    block_impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Forward pass.

    Args:
      feats: (B, T, feat_in) from the frontend (channels last).
      feat_lens: (B,) int32.
      pw_fn: intercept for every 1x1 (pointwise) conv call site,
        `(tag, x, w) -> y`; the default just applies `pointwise_conv`.
        Tags name the site ("enc{i}.sub{r}", "enc{i}.res{p}", "dec").
        Used by models/quantize.py for int8 calibration and serving.

    Returns:
      log_probs: (B, T_out, num_classes + 1) — log_softmax over the head
        (reference JasperDecoderForCTC.forward, jasper.py:253-254).
      out_lens: (B,) int32 encoded lengths.
      new_batch_stats: updated BN stats (== input stats in eval mode).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {"encoder": None})
    if rng is None:
        rng = jax.random.PRNGKey(0)

    xs = [feats]
    lens = feat_lens
    new_enc_stats = []
    enc_stats = stats["encoder"]
    for i, bcfg in enumerate(cfg.blocks):
        rng, block_rng = jax.random.split(rng)
        xs, lens, s = _apply_block(
            xs, lens, params["encoder"][i], enc_stats[i], bcfg, cfg,
            training, block_rng, compute_dtype, pw_fn, i, block_impl)
        new_enc_stats.append(s)

    encoded = xs[-1]                                    # (B, T', C)
    dec = params["decoder"]
    logits = pw_fn("dec", encoded, dec["w"]) + dec["b"]
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return log_probs, lens.astype(jnp.int32), {"encoder": new_enc_stats}


# ---------------------------------------------------------------------------
# BN folding for inference


def fold_batchnorm(variables: dict, cfg: EncoderConfig) -> dict:
    """Fold every BN into its preceding conv; returns inference variables
    whose batch_stats slots carry empty dicts (apply detects the "b" keys)."""
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])  # copy
    stats = variables["batch_stats"]
    new_enc = []
    new_enc_stats = []
    for i, bcfg in enumerate(cfg.blocks):
        bp = {"sub": [], "res": [], "se": params["encoder"][i].get("se", [])}
        bs = {"sub": [], "res": []}
        for r, sub in enumerate(params["encoder"][i]["sub"]):
            sub_stats = stats["encoder"][i]["sub"][r]
            new_sub = dict(sub)
            key = "pw_w" if bcfg.separable else "conv_w"
            w, b = fold_bn_into_conv(sub[key], sub["bn"], sub_stats["bn"])
            new_sub[key] = w
            new_sub["b"] = b
            del new_sub["bn"]
            bp["sub"].append(new_sub)
            bs["sub"].append({})
        for pane, pane_stats in zip(params["encoder"][i]["res"],
                                    stats["encoder"][i]["res"]):
            new_pane = dict(pane)
            w, b = fold_bn_into_conv(pane["conv_w"], pane["bn"],
                                     pane_stats["bn"])
            new_pane["conv_w"] = w
            new_pane["b"] = b
            del new_pane["bn"]
            bp["res"].append(new_pane)
            bs["res"].append({})
        new_enc.append(bp)
        new_enc_stats.append(bs)
    return {
        "params": {"encoder": new_enc, "decoder": params["decoder"]},
        "batch_stats": {"encoder": new_enc_stats},
    }


class QuartzNet:
    """Convenience OO facade over the functional API (init/apply/fold)."""

    def __init__(self, cfg: EncoderConfig, num_classes: int):
        self.cfg = cfg
        self.num_classes = num_classes

    def init(self, rng: jax.Array) -> dict:
        return init_quartznet(rng, self.cfg, self.num_classes)

    def apply(self, variables, feats, feat_lens, **kw):
        return quartznet_apply(variables, feats, feat_lens, cfg=self.cfg, **kw)

    def fold(self, variables) -> dict:
        return fold_batchnorm(variables, self.cfg)
