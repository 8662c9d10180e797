"""Conformer-CTC encoder (arXiv:2005.08100) — the upgrade model family.

The reference never built its Conformer (README TODO, README.md:68-71); its
vendored transformer blocks (nemo/collections/nlp/.../transformer_modules.py
:39-274) are plain MHA. This is a from-scratch TPU-first Conformer sharing
the frontend/CTC/train stack:

- macaron FFN halves, MHSA with Transformer-XL relative position encoding,
  conv module (pointwise-GLU -> masked depthwise -> BN -> swish ->
  pointwise), all pre-norm; conv2d subsampling (4x) in NHWC.
- everything is (B, T, D) channels-last; matmuls hit the MXU; attention is
  masked with a static-shape additive mask (no dynamic shapes).
- `compute_dtype=bfloat16` runs matmuls/convs in bf16 with fp32 accumulation.
- For models beyond one chip's HBM, shard the FFN/attention weights over the
  reserved 'model' mesh axis (see parallel/mesh.py); this 10-30M config
  replicates.

Variables follow the same {"params", "batch_stats"} convention as QuartzNet
so TrainState/checkpointing work unchanged.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vietasr_tpu.models.layers import (BN_EPS, batchnorm_apply, dropout,
                                       init_batchnorm, length_mask,
                                       xavier_uniform)


from vietasr_tpu.config import ConformerConfig  # noqa: E402 (re-export)


def _linear_init(rng, fan_in, fan_out):
    w_rng, b_rng = jax.random.split(rng)
    bound = fan_in ** -0.5
    return {
        "w": xavier_uniform(w_rng, (fan_in, fan_out), fan_in, fan_out),
        "b": jax.random.uniform(b_rng, (fan_out,), jnp.float32,
                                -bound, bound),
    }


def _linear(x, p, cast):
    # MXU accumulates in fp32 (preferred_element_type); the stored result
    # rejoins the bf16 activation stream — under training dtypes every
    # inter-matmul tensor is half the HBM bytes of an fp32 stream
    y = jnp.einsum("...i,io->...o", cast(x), cast(p["w"]),
                   preferred_element_type=jnp.float32)
    return cast(y + p["b"])


def _layernorm_init(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def _layernorm(x, p, eps=1e-5):
    # statistics always in fp32; output returns to the stream dtype.
    # one-pass variance (E[x^2] - E[x]^2): mean and mean-square reduce in
    # the same fusion instead of a second (x - m)^2 pass — fine in fp32
    # at d_model widths (the cancellation risk needs |m| >> std)
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    v = jnp.maximum(ms - m * m, 0.0)
    y = (x32 - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# init


def _init_block(rng, cfg: ConformerConfig):
    d, h = cfg.d_model, cfg.num_heads
    ff = cfg.ff_expansion * d
    keys = iter(jax.random.split(rng, 16))
    bn_p, bn_s = init_batchnorm(d)
    params = {
        "ff1": {"ln": _layernorm_init(d),
                "in": _linear_init(next(keys), d, ff),
                "out": _linear_init(next(keys), ff, d)},
        "mhsa": {
            "ln": _layernorm_init(d),
            "q": _linear_init(next(keys), d, d),
            "k": _linear_init(next(keys), d, d),
            "v": _linear_init(next(keys), d, d),
            "pos": {"w": xavier_uniform(next(keys), (d, d), d, d)},
            "out": _linear_init(next(keys), d, d),
            # Transformer-XL global content/position biases u, v
            "u": jnp.zeros((h, d // h), jnp.float32),
            "vb": jnp.zeros((h, d // h), jnp.float32),
        },
        "conv": {
            "ln": _layernorm_init(d),
            "pw1": _linear_init(next(keys), d, 2 * d),       # GLU
            "dw": xavier_uniform(next(keys), (cfg.conv_kernel, d),
                                 cfg.conv_kernel, d * cfg.conv_kernel),
            "bn": bn_p,
            "pw2": _linear_init(next(keys), d, d),
        },
        "ff2": {"ln": _layernorm_init(d),
                "in": _linear_init(next(keys), d, ff),
                "out": _linear_init(next(keys), ff, d)},
        "final_ln": _layernorm_init(d),
    }
    return params, {"conv_bn": bn_s}


def init_conformer(rng: jax.Array, cfg: ConformerConfig, feat_in: int,
                   num_classes: int) -> dict:
    keys = iter(jax.random.split(rng, cfg.num_blocks + 8))
    c = cfg.subsampling_channels
    if cfg.subsampling_mode == "stack":
        # frame stacking: no conv stages, proj maps 4 spliced frames
        params: dict = {
            "proj": _linear_init(next(keys), 4 * feat_in, cfg.d_model),
            "blocks": [],
            "decoder": _linear_init(next(keys), cfg.d_model,
                                    num_classes + 1),
        }
        stats = {"blocks": []}
        for _ in range(cfg.num_blocks):
            p, s = _init_block(next(keys), cfg)
            params["blocks"].append(p)
            stats["blocks"].append(s)
        return {"params": params, "batch_stats": stats}
    params = {
        # conv2d subsampling weights in HWIO
        "sub1": {"w": xavier_uniform(next(keys), (3, 3, 1, c), 9, 9 * c),
                 "b": jnp.zeros((c,), jnp.float32)},
        "sub2": {"w": xavier_uniform(next(keys), (3, 3, c, c), 9 * c, 9 * c),
                 "b": jnp.zeros((c,), jnp.float32)},
        "proj": _linear_init(next(keys), c * (feat_in // 4), cfg.d_model),
        "blocks": [],
        "decoder": _linear_init(next(keys), cfg.d_model, num_classes + 1),
    }
    stats = {"blocks": []}
    for _ in range(cfg.num_blocks):
        p, s = _init_block(next(keys), cfg)
        params["blocks"].append(p)
        stats["blocks"].append(s)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# relative-position MHSA


def rel_pos_encoding_range(max_off: int, min_off: int, d: int) -> np.ndarray:
    """Sinusoidal encodings for relative offsets [max_off ... min_off]
    (descending), shape (max_off - min_off + 1, d). Shared with the
    chunked streaming runtime so offline and streaming attention read
    IDENTICAL encodings for the same offset."""
    pos = np.arange(max_off, min_off - 1, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64)
                 * (-np.log(10000.0) / d))
    enc = np.zeros((pos.shape[0], d))
    enc[:, 0::2] = np.sin(pos * div)
    enc[:, 1::2] = np.cos(pos * div)
    return enc.astype(np.float32)


def _rel_pos_encoding(t: int, d: int) -> np.ndarray:
    """Offsets [t-1 ... -(t-1)], shape (2t-1, d)."""
    return rel_pos_encoding_range(t - 1, -(t - 1), d)


def _rel_shift(x):
    """(B, H, T, 2T-1) -> (B, H, T, T): out[i, j] = x[i, (T-1) - i + j],
    i.e. entry [i, j] reads relative offset i - j in the [T-1 ... -(T-1)]
    ordering (Transformer-XL shift trick: pad one column, flatten, skip
    T-1, re-stride by 2T-1)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))     # (B, H, T, 2T)
    flat = x.reshape(b, h, 2 * t * t)
    flat = flat[:, :, t - 1 : t - 1 + t * (2 * t - 1)]
    return flat.reshape(b, h, t, 2 * t - 1)[:, :, :, :t]


def _mhsa(x, params, mask, cfg: ConformerConfig, pos_enc, cast):
    b, t, d = x.shape
    h = cfg.num_heads
    dh = d // h

    # one fused (d, 3d) GEMM for q/k/v: params stay separate (checkpoint
    # format unchanged); the concat is 0.6 MB and folds into the step
    w_qkv = jnp.concatenate([params["q"]["w"], params["k"]["w"],
                             params["v"]["w"]], axis=1)
    b_qkv = jnp.concatenate([params["q"]["b"], params["k"]["b"],
                             params["v"]["b"]])
    qkv = jnp.einsum("...i,io->...o", cast(x), cast(w_qkv),
                     preferred_element_type=jnp.float32) + b_qkv
    qkv = cast(qkv)
    q, k, v = [a.reshape(b, t, h, dh)
               for a in jnp.split(qkv, 3, axis=-1)]

    qu = q + params["u"][None, None]
    qv = q + params["vb"][None, None]
    content = jnp.einsum("bthe,bshe->bhts", cast(qu), cast(k),
                         preferred_element_type=jnp.float32)
    # Relative-position term WITHOUT the Transformer-XL shift. The shift
    # is a pure relayout but XLA lowers it to 3 passes over the
    # (B, H, T, 2T-1) score tensor (~12 ms/step at the train shape —
    # docs/rooflines.md §5). Identical math as two MXU matmuls via the
    # angle-difference identity: with w[i] = W_pos^T qv[i] and the
    # sinusoid e_o (e_o[2m] = sin(o·w_m), e_o[2m+1] = cos(o·w_m)),
    #   pos[i, j] = w[i]·e_{i-j}
    #            = Σ_m (ws·si + wc·ci)[i, m]·cos(j·w_m)
    #                + (wc·si - ws·ci)[i, m]·sin(j·w_m)
    # where ws/wc pick the sin/cos rows of W_pos and si/ci = sin/cos(i·w_m).
    si, ci = pos_enc                                   # (T, D/2) tables
    wp = params["pos"]["w"]
    ws = jnp.einsum("bthe,mhe->bthm", cast(qv),
                    cast(wp[0::2].reshape(d // 2, h, dh)),
                    preferred_element_type=jnp.float32)
    wc = jnp.einsum("bthe,mhe->bthm", cast(qv),
                    cast(wp[1::2].reshape(d // 2, h, dh)),
                    preferred_element_type=jnp.float32)
    sq, cq = si[None, :, None, :], ci[None, :, None, :]
    position = (
        jnp.einsum("bthm,sm->bhts", cast(ws * sq + wc * cq), cast(ci),
                   preferred_element_type=jnp.float32)
        + jnp.einsum("bthm,sm->bhts", cast(wc * sq - ws * cq), cast(si),
                     preferred_element_type=jnp.float32))

    scores = (content + position) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    if mask.ndim == 2:                 # (B, S): key-validity only
        mask = mask[:, None, None, :]
    scores = jnp.where(mask, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshe->bthe", cast(attn), cast(v),
                     preferred_element_type=jnp.float32)
    return _linear(out.reshape(b, t, d), params["out"], cast)


# ---------------------------------------------------------------------------
# conv module


def _conv_module(x, params, stats, lens, training, cast, causal=False):
    y = _layernorm(x, params["ln"])
    y = _linear(y, params["pw1"], cast)                   # (B, T, 2D)
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)                             # GLU
    y = y * length_mask(y.shape[1], lens, y.dtype)        # mask before conv
    k, d = params["dw"].shape
    pad = (k - 1, 0) if causal else (k // 2, k // 2)
    y = jax.lax.conv_general_dilated(
        cast(y), cast(params["dw"].reshape(k, 1, d)),
        window_strides=(1,), padding=[pad],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=d).astype(jnp.float32)
    y, new_bn = batchnorm_apply(y, params["bn"], stats["conv_bn"],
                                training=training)
    y = cast(_swish(y))
    y = _linear(y, params["pw2"], cast)
    return y, {"conv_bn": new_bn}


def _ffn(x, params, rate, rng, training, cast):
    y = _layernorm(x, params["ln"])
    y = _swish(_linear(y, params["in"], cast))
    y = dropout(y, rate, rng, training)
    return _linear(y, params["out"], cast)


# ---------------------------------------------------------------------------
# forward


def _stack_subsample(x, lens):
    """Frame-stacking 4x subsampling: (B, T, F) -> (B, ceil(T/4), 4F).
    Inherently causal (each output frame is exactly its own 4 inputs),
    so the same code serves offline, chunked-causal, and streaming."""
    b, t, f = x.shape
    pad = (-t) % 4
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    x = x.reshape(b, (t + pad) // 4, 4 * f)
    return x, (lens + 3) // 4


def _subsample(x, lens, params, cast, causal=False):
    """Conv2d 4x subsampling: (B, T, F) -> (B, T/4, C*F/4).

    causal=True left-pads the TIME dim ((2, 0) instead of (1, 1); same
    output length) so each output frame depends only on past input —
    required by the chunked streaming mode."""
    b, t, f = x.shape
    tpad = (2, 0) if causal else (1, 1)
    y = x[..., None]                                     # NHWC: (B, T, F, 1)
    for name in ("sub1", "sub2"):
        w = params[name]["w"]
        y = jax.lax.conv_general_dilated(
            cast(y), cast(w), window_strides=(2, 2),
            padding=[tpad, (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")
        ).astype(jnp.float32) + params[name]["b"]
        y = cast(jnp.maximum(y, 0.0))
        lens = (lens + 2 * 1 - 3) // 2 + 1               # k3 s2 p1
    bt = y.shape[1]
    y = y.reshape(b, bt, -1)
    return y, lens


def conformer_apply(
    variables: dict,
    feats: jnp.ndarray,
    feat_lens: jnp.ndarray,
    *,
    cfg: ConformerConfig,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """feats (B, T, F) -> (log_probs (B, T', V+1), out_lens, new_stats).

    remat=True wraps each block in jax.checkpoint (rematerialization):
    activations are recomputed in the backward pass instead of stored,
    trading ~30% step FLOPs for O(num_blocks) less HBM — the standard
    lever for training configs that outgrow one chip's memory
    (complementary to the 'model'-axis TP in parallel/tp.py)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    cast = (lambda a: a.astype(compute_dtype)) if compute_dtype \
        else (lambda a: a)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    chunked = cfg.chunk_size > 0
    if cfg.subsampling_mode == "stack":
        x, lens = _stack_subsample(feats, feat_lens)
    else:
        x, lens = _subsample(feats, feat_lens, params, cast, causal=chunked)
    x = _linear(x, params["proj"], cast)   # bf16 stream from here on

    t = x.shape[1]
    # sin/cos(position · w_m) tables for the matmul-form relative
    # attention in _mhsa (same frequencies as _rel_pos_encoding)
    inv = np.exp(np.arange(0, cfg.d_model, 2, dtype=np.float64)
                 * (-np.log(10000.0) / cfg.d_model))
    ang = jnp.asarray(np.arange(t)[:, None] * inv[None, :], jnp.float32)
    pos_enc = (jnp.sin(ang), jnp.cos(ang))
    mask = jnp.arange(t)[None, :] < lens[:, None]
    x = x * mask[..., None].astype(x.dtype)
    if chunked:
        # chunked-causal attention (WeNet/U2 style): query i sees keys in
        # chunks [chunk(i) - left_chunks, chunk(i)] — full attention
        # inside its own chunk, bounded left context, no future chunks
        ci = jnp.arange(t) // cfg.chunk_size
        ok = (ci[None, :] <= ci[:, None]) \
            & (ci[None, :] >= ci[:, None] - cfg.left_chunks)  # (T, S)
        att_mask = mask[:, None, None, :] & ok[None, None]    # (B,1,T,S)
    else:
        att_mask = mask

    new_stats = {"blocks": []}
    rate = cfg.dropout

    def one_block(x, bp, bstat, keys):
        r1a, r1b, r2, r3, r4a, r4b = keys
        x = x + 0.5 * dropout(_ffn(x, bp["ff1"], rate, r1a, training, cast),
                              rate, r1b, training)
        attn = _mhsa(_layernorm(x, bp["mhsa"]["ln"]), bp["mhsa"], att_mask,
                     cfg, pos_enc, cast)
        x = x + dropout(attn, rate, r2, training)
        conv, s = _conv_module(x, bp["conv"], bstat, lens, training, cast,
                               causal=chunked)
        x = x + dropout(conv, rate, r3, training)
        x = x + 0.5 * dropout(_ffn(x, bp["ff2"], rate, r4a, training, cast),
                              rate, r4b, training)
        return _layernorm(x, bp["final_ln"]), s

    block_call = jax.checkpoint(one_block) if remat else one_block
    n = len(params["blocks"])
    # identical key derivation for both paths: the scan receives the same
    # per-block keys the unrolled loop would draw
    block_keys = []
    for _ in range(n):
        rng, *ks = jax.random.split(rng, 7)
        block_keys.append(ks)

    if cfg.scan_blocks and n > 1:
        # lax.scan over the homogeneous block stack: identical math to
        # the unroll (test_conformer asserts it), O(1) compiled-graph
        # size. NOT the perf default — see ConformerConfig.scan_blocks.
        stacked_p = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *params["blocks"])
        stacked_s = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *stats["blocks"])
        stacked_k = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *block_keys)

        def body(x, xs):
            bp, bstat, ks = xs
            y, s = block_call(x, bp, bstat, tuple(ks))
            return y, s

        x, stacked_ns = jax.lax.scan(body, x,
                                     (stacked_p, stacked_s, stacked_k))
        new_stats["blocks"] = [
            jax.tree_util.tree_map(lambda l, i=i: l[i], stacked_ns)
            for i in range(n)]
    else:
        for bi, bp in enumerate(params["blocks"]):
            x, s = block_call(x, bp, stats["blocks"][bi],
                              tuple(block_keys[bi]))
            new_stats["blocks"].append(s)

    logits = _linear(x, params["decoder"], cast)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return log_probs, lens.astype(jnp.int32), new_stats
