"""Fused Pallas TPU kernels for the CTC loss (alpha forward + analytic
beta backward).

The lax.scan CTC (`ops/ctc_loss.py`) is issue-bound: each of T steps is
~10 tiny (B, 2L+1) VPU ops, so per-op dispatch latency — not FLOPs or
bandwidth — sets the time even with unroll=8 (docs/rooflines.md §4,
5.1 ms fwd+bwd at the Conformer train shape). These kernels run the whole
recursion as ONE pallas_call each way: grid=(T,), the alpha/beta row
carried in VMEM scratch, lane rolls for the s-1/s-2 lattice shifts.

Forward emits the full alpha lattice (needed by the backward); backward
is the classic analytic CTC gradient instead of autodiff-through-scan:

    d(-ll_b)/d lp_ext[t, b, s] = -exp(alpha[t,b,s] + beta[t,b,s] - ll_b)

with beta the suffix recursion (beta[t,s] = lse over s' in {s, s+1,
s+2 if skippable} of beta[t+1,s'] + lp[t+1,s']), initialized at each
row's own last valid frame. The emission one-hot contraction and its
transpose stay OUTSIDE the kernel as plain MXU matmuls (they are the
efficient part already).

Semantics are identical to `ctc_loss(..., impl="scan")` — same extended
lattice, skip gating, per-row input-length freeze, infeasible-path
sentinel; forward values are bit-identical (same op order), gradients
match autodiff to fp32 tolerance (tests/test_pallas_ctc.py, and the
torch oracle in tests/test_ctc_loss.py runs both impls).

Reference semantics: nn.CTCLoss(blank=num_classes, reduction='none')
(/root/reference/nemo/collections/asr/losses.py:46-58).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _lse3(a, b, c):
    m = jnp.maximum(a, jnp.maximum(b, c))
    s = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))
    return jnp.where(m <= NEG / 2, NEG, s)


def _fwd_kernel(lp_ref, can_ref, valid_ref, len_ref, alpha_out_ref, a_scr):
    t = pl.program_id(0)
    lp_t = lp_ref[0]                                     # (B, S)
    valid = valid_ref[...] > 0.0
    b, s = lp_t.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)

    @pl.when(t == 0)
    def _():
        a_scr[...] = jnp.where((pos <= 1) & valid, lp_t, NEG)

    @pl.when(t > 0)
    def _():
        a = a_scr[...]
        a1 = jnp.where(pos >= 1, pltpu.roll(a, 1, 1), NEG)
        a2 = jnp.where((pos >= 2) & (can_ref[...] > 0.0),
                       pltpu.roll(a, 2, 1), NEG)
        new = _lse3(a, a1, a2) + lp_t
        new = jnp.where(valid, new, NEG)
        active = t < len_ref[...]                        # (B, 1) -> bcast
        a_scr[...] = jnp.where(active, new, a)

    alpha_out_ref[0] = a_scr[...]


def _bwd_kernel(lp_ref, alpha_ref, can2_ref, valid_ref, len_ref, tlen_ref,
                ll_ref, ybar_ref, g_out_ref, q_scr, *, t_max: int):
    i = pl.program_id(0)
    t = t_max - 1 - i
    lp_t = lp_ref[0]
    alpha_t = alpha_ref[0]
    valid = valid_ref[...] > 0.0
    b, s = lp_t.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)

    @pl.when(i == 0)
    def _():
        q_scr[...] = jnp.full((b, s), NEG, jnp.float32)

    q = q_scr[...]
    # left-shift as cyclic roll by s-k (pltpu.roll wants shift >= 0)
    q1 = jnp.where(pos < s - 1, pltpu.roll(q, s - 1, 1), NEG)
    q2 = jnp.where((pos < s - 2) & (can2_ref[...] > 0.0),
                   pltpu.roll(q, s - 2, 1), NEG)
    rec = _lse3(q, q1, q2)

    tl = tlen_ref[...]                                   # (B, 1)
    init_end = jnp.where(
        (pos == 2 * tl) | ((tl > 0) & (pos == 2 * tl - 1)), 0.0, NEG)
    ilen = len_ref[...]
    beta_t = jnp.where(t >= ilen - 1, init_end, rec)

    ll = ll_ref[...]                                     # (B, 1)
    g = ybar_ref[...] * jnp.exp(jnp.minimum(alpha_t + beta_t - ll, 0.0))
    g = jnp.where((t < ilen) & valid & (ll > NEG / 2), g, 0.0)
    g_out_ref[0] = g
    q_scr[...] = jnp.where(valid, beta_t + lp_t, NEG)


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ctc_ll(lp_ext, can, can2, valid, ilen, tlen, interpret):
    """(T, B, S) extended-label log-probs -> (B,) log-likelihood."""
    ll, _ = _ctc_ll_fwd(lp_ext, can, can2, valid, ilen, tlen, interpret)
    return ll


def _final_ll(alpha_last, tlen):
    """ll from the final (frozen) alpha row: lse of the two end states."""
    tl = tlen[:, 0]
    end_blank = jnp.take_along_axis(alpha_last, (2 * tl)[:, None],
                                    axis=1)[:, 0]
    idx = jnp.maximum(2 * tl - 1, 0)
    end_label = jnp.take_along_axis(alpha_last, idx[:, None], axis=1)[:, 0]
    end_label = jnp.where(tl > 0, end_label, NEG)
    m = jnp.maximum(end_blank, end_label)
    ll = m + jnp.log(jnp.exp(end_blank - m) + jnp.exp(end_label - m))
    return jnp.where(m <= NEG / 2, NEG, ll)


def _ctc_ll_fwd(lp_ext, can, can2, valid, ilen, tlen, interpret):
    t_max, b, s = lp_ext.shape
    alphas = pl.pallas_call(
        _fwd_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, b, s), lambda t: (t, 0, 0)),
            pl.BlockSpec((b, s), lambda t: (0, 0)),
            pl.BlockSpec((b, s), lambda t: (0, 0)),
            pl.BlockSpec((b, 1), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b, s), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_max, b, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(lp_ext, can, valid, ilen)
    ll = _final_ll(alphas[-1], tlen)
    return ll, (lp_ext, alphas, can, can2, valid, ilen, tlen, ll)


def _ctc_ll_bwd(interpret, res, ybar):
    lp_ext, alphas, can, can2, valid, ilen, tlen, ll = res
    t_max, b, s = lp_ext.shape
    g = pl.pallas_call(
        partial(_bwd_kernel, t_max=t_max),
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, b, s), lambda i, t=t_max: (t - 1 - i, 0, 0)),
            pl.BlockSpec((1, b, s), lambda i, t=t_max: (t - 1 - i, 0, 0)),
            pl.BlockSpec((b, s), lambda i: (0, 0)),
            pl.BlockSpec((b, s), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b, s),
                               lambda i, t=t_max: (t - 1 - i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_max, b, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(lp_ext, alphas, can2, valid, ilen, tlen, ll[:, None], ybar[:, None])
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # int/bool primals
    return (g, jnp.zeros_like(can), jnp.zeros_like(can2),
            jnp.zeros_like(valid), f0(ilen), f0(tlen))


_ctc_ll.defvjp(_ctc_ll_fwd, _ctc_ll_bwd)


def ctc_neg_ll_pallas(lp_ext, can_skip, valid_s, input_lengths,
                      target_lengths, *, interpret: bool = False):
    """Fused-kernel negative log-likelihood.

    Args:
      lp_ext: (B, T, S) label log-probs on the extended lattice
        (already gathered/one-hot-contracted from (B, T, V)).
      can_skip: (B, S) bool — arrival at s from s-2 allowed.
      valid_s: (B, S) bool — s < 2*target_len+1.
      input_lengths, target_lengths: (B,) int32.

    Returns (B,) loss = -log p. Differentiable wrt lp_ext.
    """
    b, t_max, s = lp_ext.shape
    s_pad = max(-(-s // 128) * 128, 128)
    b_pad = max(-(-b // 8) * 8, 8)

    def pad2(x, fill):
        return jnp.pad(x, ((0, b_pad - b), (0, s_pad - s)),
                       constant_values=fill)

    lp = jnp.pad(lp_ext, ((0, b_pad - b), (0, 0), (0, s_pad - s)))
    lp = jnp.transpose(lp, (1, 0, 2))                    # (T, B, S)
    can = pad2(can_skip.astype(jnp.float32), 0.0)
    valid = pad2(valid_s.astype(jnp.float32), 0.0)
    # beta's departure gate: can2[s] = can_skip[s + 2]
    can2 = jnp.pad(can, ((0, 0), (0, 2)))[:, 2:]
    ilen = jnp.pad(input_lengths.astype(jnp.int32), (0, b_pad - b))[:, None]
    tlen = jnp.pad(target_lengths.astype(jnp.int32), (0, b_pad - b))[:, None]

    ll = _ctc_ll(lp, can, can2, valid, ilen, tlen, interpret)
    return -ll[:b]
