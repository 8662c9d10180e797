"""Fully fused Pallas TPU kernel for the on-device CTC beam search.

One `pallas_call` runs the ENTIRE decode: grid=(T,), the packed beam state
lives in VMEM scratch across grid steps, and each step does expand ->
merge -> top-K -> select as pure vector ops. This removes what bounds the
XLA scan version (`ops/device_beam.py`): per-op issue latency (~1-3 us x
~40 fused ops) and in-scan layout copies — the whole step becomes one
kernel invocation with zero HBM traffic beyond the per-frame posterior
tile in and the (parent, char) backpointers out (docs/rooflines.md §3).

Layout: batch rides the 128-wide LANE axis everywhere — state tensors are
(W, B), candidate tensors (W, K, B) — so W=16 x K=8 collapses onto full
vregs instead of wasting 7/8 of each lane row as the (B, W) layout would.

Word-LM shallow fusion uses the dense-match strategy (ops/device_beam.py
`_word_lm_score(dense=True)` semantics, bit-identical backoff math): the
n-gram table is DENSE-PACKED (only occupied rows) into VMEM-resident
columns and every (chain, beam) query is an equality compare over all
rows + a masked max, processed in 128-row blocks — unrolled for small
tables, a fori_loop over ref slices beyond `_UNROLL_BLOCKS` (see
`_word_lm_score_refs` for why both bounds exist). The match is O(N) VPU
work per step (~27 ns/row/step measured at the serving shape, and the
(C, W, B) compare temporaries are lane-padded B->128, so the constant is
8x worse than logical element count suggests); the N-independent XLA
probing path overtakes it past PALLAS_WLM_MAX_ROWS
(ops/device_beam.py), which auto-routing respects — measured curve in
docs/rooflines.md, reproduce with tools/bench_beam_lm_size.py. A
hash-probe gather kernel would be N-independent, but Mosaic's
dynamic_gather only compiles for single-vreg (8, 128) lane-axis gathers
on this toolchain (tools/probe_gather.py), so the probing layout used by
the XLA path cannot be expressed in-kernel yet.

Semantics match `device_beam_search` with canonical (space-normalized)
beam identity: same hashes, same merge rule, same Katz backoff carry,
same backpointer reconstruction (shared `reconstruct_best_path`).
Equality with the XLA path is asserted by tests/test_pallas_beam.py in
interpret mode and spot-checked compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vietasr_tpu.ops.device_beam import NEG, WordLMTables

# hash constants as PYTHON ints (the XLA path's module-level jnp.uint32
# scalars would be captured consts, which pallas kernels reject; plain
# int literals fold into the kernel body)
P1, P2 = 1000003, 69069
Q1, Q2 = 2654435761, 40503
KEY_SEED = 1

# final-state pack row indices (u32 bit patterns; f32 fields bitcast)
(F_PB, F_PNB, F_LM, F_WH1, F_WH2, F_C1H1, F_C1H2, F_C2H1, F_C2H2,
 F_BO1, F_BO2, F_PLEN) = range(12)
N_FIN = 12


class DenseLM(NamedTuple):
    """Dense-packed word-LM table for the kernel (occupied rows only).

    Rows are grouped by level (0=unigram, 1=bigram, 2=trigram); `level`
    marks each row's group so a chain only matches its own level. Padding
    rows carry key 0 / level -1 and can never match.
    """

    key1: jnp.ndarray      # (N, 1) uint32
    key2: jnp.ndarray      # (N, 1) uint32
    logp: jnp.ndarray      # (N, 1) f32
    bo: jnp.ndarray        # (N, 1) f32
    level: jnp.ndarray     # (N, 1) int32
    unk_logp: float


def dense_lm_from_tables(tables: WordLMTables,
                         unk_logp: float) -> DenseLM:
    """Dense-pack an open-addressing WordLMTables (drop empty slots)."""
    packed = np.asarray(tables.packed)
    bases = [int(tables.uni_base), int(tables.bi_base),
             int(tables.tri_base)]
    sizes = [int(tables.uni_mask) + 1, int(tables.bi_mask) + 1,
             int(tables.tri_mask) + 1]
    rows, levels = [], []
    for lvl in range(3):
        seg = packed[bases[lvl] : bases[lvl] + sizes[lvl]]
        occ = seg[(seg[:, 0] != 0) | (seg[:, 1] != 0)]
        rows.append(occ)
        levels.append(np.full((occ.shape[0],), lvl, np.int32))
    rows_np = np.concatenate(rows, axis=0)
    level_np = np.concatenate(levels, axis=0)
    n = rows_np.shape[0]
    pad = max((n + 7) // 8 * 8, 8) - n
    rows_np = np.pad(rows_np, ((0, pad), (0, 0)))
    level_np = np.pad(level_np, (0, pad), constant_values=-1)
    return DenseLM(
        key1=jnp.asarray(rows_np[:, 0:1]),
        key2=jnp.asarray(rows_np[:, 1:2]),
        logp=jnp.asarray(rows_np[:, 2:3].view(np.float32)),
        bo=jnp.asarray(rows_np[:, 3:4].view(np.float32)),
        level=jnp.asarray(level_np[:, None]),
        unk_logp=float(unk_logp),
    )


def _pick_lm_chunk(n: int, w: int, bsz: int,
                   budget_elems: int = 1 << 18) -> int:
    """Static LM-match row-block size. 0 = single pass.

    Budgets in PADDED vreg units, not logical elements: a (C, W, B)
    temporary is tiled over its last two dims, so W rounds up to 8
    sublanes and B to 128 lanes — at the serving shape (W=16, B=16) each
    logical element costs 8x its size in VMEM *and* VPU work. Budgeting
    logically is what let single-pass tables >~380 rows blow VMEM and
    crash Mosaic (found by tools/bench_beam_lm_size.py bisect)."""
    wp = (w + 7) // 8 * 8
    bp = (bsz + 127) // 128 * 128
    if n == 0 or n * wp * bp <= budget_elems:
        return 0
    return max(8, budget_elems // (wp * bp) // 8 * 8)


# max statically-unrolled LM match blocks: >= ~7 blocks of 128 rows
# deterministically crashes the Mosaic compiler (working-set cliff, see
# _word_lm_score_refs); 4 keeps a 1.75x safety margin while sparing
# small tables the fori_loop overhead
_UNROLL_BLOCKS = 4


def _lse2(a, b):
    m = jnp.maximum(a, b)
    safe = jnp.where(m <= NEG / 2, 0.0, m)
    out = safe + jnp.log(
        jnp.exp(jnp.maximum(a - safe, NEG))
        + jnp.exp(jnp.maximum(b - safe, NEG)))
    return jnp.where(m <= NEG / 2, NEG, out)


def _fold(seed1, seed2, h1, h2):
    return seed1 * jnp.uint32(Q1) + h1, seed2 * jnp.uint32(Q2) + h2


def _i32sum_onehot(mask, vals_u32, axis):
    """Exact one-hot select of u32 bit patterns (u32 reduce unsupported)."""
    as_i32 = jax.lax.bitcast_convert_type(vals_u32, jnp.int32)
    s = jnp.sum(jnp.where(mask, as_i32, 0), axis=axis)
    return jax.lax.bitcast_convert_type(s, jnp.uint32)


def _word_lm_queries(c2h1, c2h2, c1h1, c1h2, wh1, wh2):
    """Hash-fold the unigram/bigram/trigram lookup keys, (W, B) each."""
    one = jnp.uint32(KEY_SEED)
    uk1, uk2 = _fold(one, one, wh1, wh2)
    c1k1, c1k2 = _fold(one, one, c1h1, c1h2)
    bk1, bk2 = _fold(c1k1, c1k2, wh1, wh2)
    ctxk1, ctxk2 = _fold(*_fold(one, one, c2h1, c2h2), c1h1, c1h2)
    tk1, tk2 = _fold(ctxk1, ctxk2, wh1, wh2)
    return ((uk1, uk2), (bk1, bk2), (tk1, tk2))


def _lm_match_block(k1, k2, lg, bo_c, lv, queries, state):
    """Fold one (C, 1) table block into the running match state.

    state = (any_hits[3] i32, vals[3] f32, bos[3] f32), each (W, B).
    any_hits is i32 0/1, NOT bool: bool fori_loop carries crash the
    Mosaic compiler on this toolchain (isolated by a minimal probe —
    i32 carries and unrolled bool both compile; bool carries don't).
    Exact across blocks: at most one row in the whole table matches a
    query, so running any/max equals the single-pass result."""
    any_hits, vals, bos = state
    any_hits, vals, bos = list(any_hits), list(vals), list(bos)
    for lvl, (q1, q2) in enumerate(queries):
        # (C, W, B) compare against every dense row of this block
        hit = (k1[:, None, :] == q1[None]) \
            & (k2[:, None, :] == q2[None]) \
            & (lv[:, None, :] == lvl) \
            & (q1[None] != 0)
        any_hits[lvl] = jnp.maximum(
            any_hits[lvl], jnp.any(hit, axis=0).astype(jnp.int32))
        vals[lvl] = jnp.maximum(
            vals[lvl],
            jnp.max(jnp.where(hit, lg[:, None, :], NEG), axis=0))
        bos[lvl] = jnp.maximum(
            bos[lvl],
            jnp.max(jnp.where(hit, bo_c[:, None, :], NEG), axis=0))
    return tuple(any_hits), tuple(vals), tuple(bos)


def _lm_match_init(qshape):
    return (tuple(jnp.zeros(qshape, jnp.int32) for _ in range(3)),
            tuple(jnp.full(qshape, NEG, jnp.float32) for _ in range(3)),
            tuple(jnp.full(qshape, NEG, jnp.float32) for _ in range(3)))


def _lm_combine(state, unk_logp, c1_bo, ctx_bo, c1h1, c2h1):
    """Katz backoff combine — mirrors device_beam._word_lm_score
    (dense=True) bit for bit."""
    hit_masks, vals, raw_bos = state
    any_hits = [m != 0 for m in hit_masks]
    bos = [jnp.where(any_hits[i], raw_bos[i], 0.0) for i in range(3)]
    p = jnp.where(any_hits[0], vals[0], unk_logp)
    p2 = jnp.where(any_hits[1], vals[1], c1_bo + p)
    p = jnp.where(c1h1 != 0, p2, p)
    p3 = jnp.where(any_hits[2], vals[2], ctx_bo + p)
    p = jnp.where((c2h1 != 0) & (c1h1 != 0), p3, p)
    w_bo = jnp.where(any_hits[0], bos[0], 0.0)
    cw_bo = jnp.where(any_hits[1], bos[1], 0.0)
    return p, w_bo, cw_bo


def _word_lm_score_k(lm: DenseLM, unk_logp, c2h1, c2h2, c1h1, c1h2,
                     wh1, wh2, c1_bo, ctx_bo):
    """Single-pass dense-match Katz backoff, (W, B) queries. Used for
    finalization (plain XLA) and for small tables inside the kernel."""
    queries = _word_lm_queries(c2h1, c2h2, c1h1, c1h2, wh1, wh2)
    state = _lm_match_init(c1h1.shape)
    state = _lm_match_block(lm.key1, lm.key2, lm.logp, lm.bo, lm.level,
                            queries, state)
    return _lm_combine(state, unk_logp, c1_bo, ctx_bo, c1h1, c2h1)


def _word_lm_score_refs(k1_ref, k2_ref, lg_ref, bo_ref, lv_ref, chunk,
                        unk_logp, c2h1, c2h2, c1h1, c1h2, wh1, wh2,
                        c1_bo, ctx_bo):
    """In-kernel dense match over VMEM refs in `chunk`-row blocks via a
    fori_loop (table row count must be a multiple of `chunk` — the
    wrapper pads with key-0/level -1 rows, which can never match).

    Why a loop over ref slices instead of slicing loaded arrays: the
    (C, W, B) compare temporaries are lane-padded (B -> 128), so a
    single-pass match blows VMEM beyond a few hundred rows, and
    UNROLLED block loops deterministically crash the Mosaic compiler
    once blocks x block-size crosses a working-set cliff (N=896 at
    C=128 fails while N=768 passes — tools/bench_beam_lm_size.py).
    A fori_loop bounds both code size and live temporaries to one
    block regardless of N. Small tables (<= _UNROLL_BLOCKS blocks, well
    under the cliff) unroll statically instead — the fori_loop costs a
    measured ~7 us/step in loop overhead that small tables shouldn't
    pay."""
    n = k1_ref.shape[0]
    queries = _word_lm_queries(c2h1, c2h2, c1h1, c1h2, wh1, wh2)
    state = _lm_match_init(c1h1.shape)

    if n // chunk <= _UNROLL_BLOCKS:
        for c0 in range(0, n, chunk):
            idx = (pl.ds(c0, chunk), slice(None))
            state = _lm_match_block(
                k1_ref[idx], k2_ref[idx], lg_ref[idx], bo_ref[idx],
                lv_ref[idx], queries, state)
    else:
        def body(i, state):
            idx = (pl.ds(i * chunk, chunk), slice(None))
            return _lm_match_block(
                k1_ref[idx], k2_ref[idx], lg_ref[idx], bo_ref[idx],
                lv_ref[idx], queries, state)

        state = jax.lax.fori_loop(0, n // chunk, body, state)
    return _lm_combine(state, unk_logp, c1_bo, ctx_bo, c1h1, c2h1)


def _beam_kernel(lens_ref, lp_ref, toplp_ref, topci_ref, *rest,
                 w: int, k_c: int, v1: int, blank: int, space: int,
                 alpha: float, beta: float, has_lm: bool,
                 unk_logp: float, lm_chunk: int):
    if has_lm:
        (k1_ref, k2_ref, lg_ref, bo_ref, lv_ref, bp_ref, fin_ref,
         h1_s, h2_s, pb_s, pnb_s, lm_s, last_s, plen_s,
         wh1_s, wh2_s, c1h1_s, c1h2_s, c2h1_s, c2h2_s, bo1_s, bo2_s) = rest
    else:
        (bp_ref, fin_ref,
         h1_s, h2_s, pb_s, pnb_s, lm_s, last_s, plen_s,
         wh1_s, wh2_s, c1h1_s, c1h2_s, c2h1_s, c2h2_s, bo1_s, bo2_s) = rest
    t = pl.program_id(0)
    bsz = pb_s.shape[1]
    row_w = jax.lax.broadcasted_iota(jnp.int32, (w, bsz), 0)   # (W, B)
    row_w_u = jax.lax.bitcast_convert_type(row_w, jnp.uint32)
    poison1 = jnp.uint32(0x80000000) + row_w_u
    poison2 = jnp.full((w, bsz), 0xFFFFFFFF, jnp.uint32)

    @pl.when(t == 0)
    def _init():
        is0 = row_w == 0
        h1_s[...] = jnp.where(is0, jnp.uint32(0), poison1)
        h2_s[...] = jnp.where(is0, jnp.uint32(0), poison2)
        pb_s[...] = jnp.where(is0, 0.0, NEG)
        pnb_s[...] = jnp.full((w, bsz), NEG, jnp.float32)
        lm_s[...] = jnp.zeros((w, bsz), jnp.float32)
        last_s[...] = jnp.full((w, bsz), -1, jnp.int32)
        plen_s[...] = jnp.zeros((w, bsz), jnp.int32)
        for ref in (wh1_s, wh2_s, c1h1_s, c1h2_s, c2h1_s, c2h2_s):
            ref[...] = jnp.zeros((w, bsz), jnp.uint32)
        bo1_s[...] = jnp.zeros((w, bsz), jnp.float32)
        bo2_s[...] = jnp.zeros((w, bsz), jnp.float32)

    h1 = h1_s[...]
    h2 = h2_s[...]
    pb = pb_s[...]
    pnb = pnb_s[...]
    lmsc = lm_s[...]
    last = last_s[...]
    plen = plen_s[...]
    wh1 = wh1_s[...]
    wh2 = wh2_s[...]
    c1h1 = c1h1_s[...]
    c1h2 = c1h2_s[...]
    c2h1 = c2h1_s[...]
    c2h2 = c2h2_s[...]
    bo1 = bo1_s[...]
    bo2 = bo2_s[...]

    lp = lp_ref[0]                                           # (V1, B)
    top_lp = toplp_ref[0]                                    # (K, B)
    top_ci = topci_ref[0]                                    # (K, B) i32

    p_tot = _lse2(pb, pnb)                                   # (W, B)
    lp_blank = lp[blank : blank + 1, :]                      # (1, B)
    stay_pb = p_tot + lp_blank
    # lp[last] as a one-hot contraction over V1
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (1, v1, 1), 1)
    lp_last = jnp.sum(
        jnp.where(last[:, None, :] == iota_v, lp[None, :, :], 0.0),
        axis=1)                                              # (W, B)
    stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG)

    # ---- extension candidates (W, K, B) ----
    is_rep = last[:, None, :] == top_ci[None]
    base = jnp.where(is_rep, pb[:, None, :], p_tot[:, None, :])
    ext_pnb = base + top_lp[None]
    cplus3 = jax.lax.bitcast_convert_type(top_ci + 1, jnp.uint32)
    sp_u = jnp.uint32(space + 1)
    has_words = (c1h1 != 0) | (c1h2 != 0)
    need_sep = (wh1 == 0) & has_words
    b1 = jnp.where(need_sep, h1 * jnp.uint32(P1) + sp_u, h1)
    b2 = jnp.where(need_sep, h2 * jnp.uint32(P2) + sp_u, h2)
    is_space_c = top_ci == space                             # (K, B)
    ext_h1 = jnp.where(is_space_c[None], h1[:, None, :],
                       b1[:, None, :] * jnp.uint32(P1) + cplus3[None])
    ext_h2 = jnp.where(is_space_c[None], h2[:, None, :],
                       b2[:, None, :] * jnp.uint32(P2) + cplus3[None])

    if has_lm:
        if lm_chunk > 0:
            raw_sw, w_bo, cw_bo = _word_lm_score_refs(
                k1_ref, k2_ref, lg_ref, bo_ref, lv_ref, lm_chunk,
                unk_logp, c2h1, c2h2, c1h1, c1h2, wh1, wh2, bo1, bo2)
        else:
            lm = DenseLM(key1=k1_ref[...], key2=k2_ref[...],
                         logp=lg_ref[...], bo=bo_ref[...],
                         level=lv_ref[...], unk_logp=unk_logp)
            raw_sw, w_bo, cw_bo = _word_lm_score_k(
                lm, unk_logp, c2h1, c2h2, c1h1, c1h2, wh1, wh2, bo1, bo2)
        sw = jnp.where(wh1 != 0, alpha * raw_sw + beta, 0.0)  # (W, B)
        ext_lm = lmsc[:, None, :] + jnp.where(
            is_space_c[None], sw[:, None, :], 0.0)
    else:
        sw = jnp.zeros((w, bsz), jnp.float32)
        w_bo = cw_bo = bo1
        ext_lm = jnp.broadcast_to(lmsc[:, None, :], ext_pnb.shape)

    # ---- merge: stay(j) absorbs ext(i, c) iff equal canonical prefix ----
    eqm = (h1[:, None, None, :] == ext_h1[None]) \
        & (h2[:, None, None, :] == ext_h2[None]) \
        & (last[:, None, None, :] == top_ci[None, None])     # (Wj,Wi,K,B)
    ext_masked = jnp.where(eqm, ext_pnb[None], NEG)
    mmax = jnp.maximum(stay_pnb, jnp.max(ext_masked, axis=(1, 2)))
    msafe = jnp.where(mmax <= NEG / 2, 0.0, mmax)
    msum = jnp.exp(jnp.maximum(stay_pnb - msafe, NEG)) + jnp.sum(
        jnp.exp(jnp.maximum(ext_masked - msafe[:, None, None, :], NEG)),
        axis=(1, 2))
    stay_pnb_m = jnp.where(mmax <= NEG / 2, NEG,
                           msafe + jnp.log(jnp.maximum(msum, 1e-38)))
    ext_alive = ~jnp.any(eqm, axis=0)                        # (W, K, B)
    ext_pnb_rank = jnp.where(ext_alive, ext_pnb, NEG)

    # ---- rank all W*(K+1) candidates, keep top W ----
    stay_total = _lse2(stay_pb, stay_pnb_m) + lmsc           # (W, B)
    ext_total = ext_pnb_rank + ext_lm                        # (W, K, B)
    totals = jnp.concatenate(
        [stay_total, ext_total.reshape(w * k_c, bsz)], axis=0)  # (W+WK, B)
    n_cand = w + w * k_c
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (n_cand, bsz), 0)
    taken = jnp.zeros((n_cand, bsz), jnp.bool_)
    idx_rows, val_rows = [], []
    for _ in range(w):
        cur = jnp.where(taken, NEG * 2, totals)
        mm = jnp.max(cur, axis=0, keepdims=True)             # (1, B)
        idx = jnp.min(jnp.where(cur == mm, rows_c, n_cand), axis=0,
                      keepdims=True)                         # (1, B)
        idx_rows.append(idx)
        val_rows.append(mm)
        taken = taken | (rows_c == idx)
    top_idx = jnp.concatenate(idx_rows, axis=0)              # (W, B)
    top_val = jnp.concatenate(val_rows, axis=0)              # (W, B)

    is_stay = top_idx < w
    ext_flat = jnp.maximum(top_idx - w, 0)
    if k_c & (k_c - 1) == 0:
        shift = k_c.bit_length() - 1
        ext_parent = jax.lax.shift_right_logical(ext_flat, shift)
        c_idx = jnp.bitwise_and(ext_flat, k_c - 1)
    else:
        ext_parent = ext_flat // k_c
        c_idx = ext_flat % k_c
    sel_parent = jnp.where(is_stay, jnp.minimum(top_idx, w - 1),
                           ext_parent)                       # (W, B)

    # ---- parent-state select: one-hot over the W parents ----
    psel = sel_parent[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (1, w, bsz), 1)                           # (W, W, B)

    def selu(field):                                          # u32 (W, B)
        return _i32sum_onehot(psel, field[None], axis=1)

    def self_(field):                                         # f32
        return jnp.sum(jnp.where(psel, field[None], 0.0), axis=1)

    def seli(field):                                          # i32
        return jnp.sum(jnp.where(psel, field[None], 0), axis=1)

    p_h1 = selu(h1)
    p_h2 = selu(h2)
    p_pb = self_(pb)
    p_pnb = self_(pnb)
    p_lm = self_(lmsc)
    p_last = seli(last)
    p_plen = seli(plen)
    p_wh1 = selu(wh1)
    p_wh2 = selu(wh2)
    p_c1h1 = selu(c1h1)
    p_c1h2 = selu(c1h2)
    p_c2h1 = selu(c2h1)
    p_c2h2 = selu(c2h2)
    p_bo1 = self_(bo1)
    p_bo2 = self_(bo2)
    p_staypb = self_(stay_pb)
    p_staypnbm = self_(stay_pnb_m)
    p_sw = self_(sw)
    p_wbo = self_(w_bo)
    p_cwbo = self_(cw_bo)

    # ---- extension payload recompute (mirrors device_beam.py) ----
    c_oh = c_idx[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (1, k_c, bsz), 1)                         # (W, K, B)
    sel_char_raw = jnp.sum(jnp.where(c_oh, top_ci[None], 0), axis=1)
    sel_char = jnp.where(is_stay, -1, sel_char_raw)
    sel_lp_c = jnp.sum(jnp.where(c_oh, top_lp[None], 0.0), axis=1)
    sel_p_tot = _lse2(p_pb, p_pnb)
    sel_is_rep = p_last == sel_char
    sel_ext_pnb = jnp.where(sel_is_rep, p_pb, sel_p_tot) + sel_lp_c
    sel_ext_lm = p_lm + jnp.where(sel_char == space, p_sw, 0.0)

    new_pb = jnp.where(is_stay, p_staypb, NEG)
    new_pnb = jnp.where(is_stay, p_staypnbm, sel_ext_pnb)
    new_lm = jnp.where(is_stay, p_lm, sel_ext_lm)
    cplus = jax.lax.bitcast_convert_type(sel_char + 1, jnp.uint32)
    sel_sep = (p_wh1 == 0) & ((p_c1h1 != 0) | (p_c1h2 != 0))
    nb1 = jnp.where(sel_sep, p_h1 * jnp.uint32(P1) + sp_u, p_h1)
    nb2 = jnp.where(sel_sep, p_h2 * jnp.uint32(P2) + sp_u, p_h2)
    sel_space = sel_char == space
    keep_hash = is_stay | sel_space
    new_h1 = jnp.where(keep_hash, p_h1, nb1 * jnp.uint32(P1) + cplus)
    new_h2 = jnp.where(keep_hash, p_h2, nb2 * jnp.uint32(P2) + cplus)

    is_space_ext = (~is_stay) & sel_space
    shift_w = is_space_ext & (p_wh1 != 0)
    zu = jnp.uint32(0)
    new_wh1 = jnp.where(is_stay | is_space_ext,
                        jnp.where(is_space_ext, zu, p_wh1),
                        p_wh1 * jnp.uint32(P1) + cplus)
    new_wh2 = jnp.where(is_stay | is_space_ext,
                        jnp.where(is_space_ext, zu, p_wh2),
                        p_wh2 * jnp.uint32(P2) + cplus)
    new_c1h1 = jnp.where(shift_w, p_wh1, p_c1h1)
    new_c1h2 = jnp.where(shift_w, p_wh2, p_c1h2)
    new_c2h1 = jnp.where(shift_w, p_c1h1, p_c2h1)
    new_c2h2 = jnp.where(shift_w, p_c1h2, p_c2h2)
    new_bo1 = jnp.where(shift_w, p_wbo, p_bo1)
    new_bo2 = jnp.where(shift_w, p_cwbo, p_bo2)

    dead = top_val <= NEG / 2
    new_h1 = jnp.where(dead, poison1, new_h1)
    new_h2 = jnp.where(dead, poison2, new_h2)
    new_pb = jnp.where(dead, NEG, new_pb)
    new_pnb = jnp.where(dead, NEG, new_pnb)

    is_ext = sel_char >= 0
    new_plen = p_plen + is_ext.astype(jnp.int32)
    new_last = jnp.where(is_ext, sel_char, p_last)

    # ---- freeze finished utterances; record backpointers ----
    active = lens_ref[0] > t                                 # (1, B)
    bp_parent = jnp.where(active, sel_parent, row_w)
    bp_char = jnp.where(active, sel_char, -1)
    bp_ref[0, 0] = bp_parent
    bp_ref[0, 1] = bp_char

    def frz(new, old):
        return jnp.where(active, new, old)

    h1_s[...] = frz(new_h1, h1)
    h2_s[...] = frz(new_h2, h2)
    pb_s[...] = frz(new_pb, pb)
    pnb_s[...] = frz(new_pnb, pnb)
    lm_s[...] = frz(new_lm, lmsc)
    last_s[...] = frz(new_last, last)
    plen_s[...] = frz(new_plen, plen)
    wh1_s[...] = frz(new_wh1, wh1)
    wh2_s[...] = frz(new_wh2, wh2)
    c1h1_s[...] = frz(new_c1h1, c1h1)
    c1h2_s[...] = frz(new_c1h2, c1h2)
    c2h1_s[...] = frz(new_c2h1, c2h1)
    c2h2_s[...] = frz(new_c2h2, c2h2)
    bo1_s[...] = frz(new_bo1, bo1)
    bo2_s[...] = frz(new_bo2, bo2)

    def u(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint32)

    fin_ref[F_PB] = u(pb_s[...])
    fin_ref[F_PNB] = u(pnb_s[...])
    fin_ref[F_LM] = u(lm_s[...])
    fin_ref[F_WH1] = wh1_s[...]
    fin_ref[F_WH2] = wh2_s[...]
    fin_ref[F_C1H1] = c1h1_s[...]
    fin_ref[F_C1H2] = c1h2_s[...]
    fin_ref[F_C2H1] = c2h1_s[...]
    fin_ref[F_C2H2] = c2h2_s[...]
    fin_ref[F_BO1] = u(bo1_s[...])
    fin_ref[F_BO2] = u(bo2_s[...])
    fin_ref[F_PLEN] = u(plen_s[...])


@functools.partial(
    jax.jit, static_argnames=("beam_width", "blank", "max_len", "alpha",
                              "beta", "cutoff_top_n", "space", "unk_logp",
                              "interpret", "lm_chunk"))
def pallas_beam_search(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    blank: int,
    beam_width: int = 16,
    cutoff_top_n: int = 8,
    dense_lm: Optional[DenseLM] = None,
    unk_logp: float = 0.0,
    alpha: float = 0.5,
    beta: float = 0.0,
    space: int = -1,
    max_len: int = 0,
    interpret: bool = False,
    lm_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, V+1) log-probs -> (prefixes (B, L), lens (B,)).

    Kernel-fused equivalent of device_beam_search for the canonical
    (space-normalized) identity with optional dense word-LM fusion.
    """
    from vietasr_tpu.ops.device_beam import reconstruct_best_path
    from vietasr_tpu.utils.typing import assert_log_probs

    assert_log_probs(log_probs, num_classes=blank,
                     port="pallas_beam_search.log_probs")
    if space < 0:
        raise ValueError("pallas_beam_search requires the space label id")
    bsz, t_max, v1 = log_probs.shape
    v = v1 - 1
    w = beam_width
    k_c = v if cutoff_top_n <= 0 or cutoff_top_n >= v else cutoff_top_n
    l_max = max_len or t_max

    lp_t = jnp.transpose(log_probs, (1, 2, 0))               # (T, V1, B)
    top_lp, top_ci = jax.lax.top_k(
        jnp.transpose(log_probs[:, :, :v], (1, 0, 2)), k_c)  # (T, B, K)
    top_lp = jnp.transpose(top_lp, (0, 2, 1))                # (T, K, B)
    top_ci = jnp.transpose(top_ci, (0, 2, 1))
    lens2 = jnp.asarray(lengths, jnp.int32)[None, :]         # (1, B)

    has_lm = dense_lm is not None
    n = dense_lm.key1.shape[0] if has_lm else 0
    if lm_chunk is None:
        lm_chunk = _pick_lm_chunk(n, w, bsz)
    if has_lm and lm_chunk > 0 and n % lm_chunk:
        # pad to a block multiple with rows that can never match
        # (key 0, level -1) so the in-kernel fori_loop stays uniform
        pad = lm_chunk - n % lm_chunk
        dense_lm = DenseLM(
            key1=jnp.pad(dense_lm.key1, ((0, pad), (0, 0))),
            key2=jnp.pad(dense_lm.key2, ((0, pad), (0, 0))),
            logp=jnp.pad(dense_lm.logp, ((0, pad), (0, 0))),
            bo=jnp.pad(dense_lm.bo, ((0, pad), (0, 0))),
            level=jnp.pad(dense_lm.level, ((0, pad), (0, 0)),
                          constant_values=-1),
            unk_logp=dense_lm.unk_logp,
        )
        n += pad
    kern = functools.partial(
        _beam_kernel, w=w, k_c=k_c, v1=v1, blank=blank, space=space,
        alpha=alpha, beta=beta, has_lm=has_lm, unk_logp=unk_logp,
        lm_chunk=lm_chunk)
    lm_specs = [
        pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
        for _ in range(5)] if has_lm else []
    lm_args = ([dense_lm.key1, dense_lm.key2, dense_lm.logp, dense_lm.bo,
                dense_lm.level] if has_lm else [])

    bp, fin = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, bsz), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v1, bsz), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_c, bsz), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_c, bsz), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + lm_specs,
        out_specs=[
            pl.BlockSpec((1, 2, w, bsz), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FIN, w, bsz), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, 2, w, bsz), jnp.int32),
            jax.ShapeDtypeStruct((N_FIN, w, bsz), jnp.uint32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((w, bsz), jnp.uint32)] * 2      # h1 h2
            + [pltpu.VMEM((w, bsz), jnp.float32)] * 3   # pb pnb lm
            + [pltpu.VMEM((w, bsz), jnp.int32)] * 2     # last plen
            + [pltpu.VMEM((w, bsz), jnp.uint32)] * 6    # word/ctx hashes
            + [pltpu.VMEM((w, bsz), jnp.float32)] * 2   # bo1 bo2
        ),
        interpret=interpret,
    )(lens2, lp_t, top_lp, top_ci, *lm_args)

    def f32(row):
        return jax.lax.bitcast_convert_type(fin[row], jnp.float32)

    total = _lse2(f32(F_PB), f32(F_PNB)) + f32(F_LM)         # (W, B)
    if has_lm:
        # finalization runs in plain XLA — no VMEM constraint, one pass
        sw, _, _ = _word_lm_score_k(
            dense_lm, unk_logp,
            fin[F_C2H1], fin[F_C2H2], fin[F_C1H1], fin[F_C1H2],
            fin[F_WH1], fin[F_WH2], f32(F_BO1), f32(F_BO2))
        total = total + jnp.where(fin[F_WH1] != 0,
                                  alpha * sw + beta, 0.0)
    best = jnp.argmax(total, axis=0)                         # (B,)

    parents = jnp.transpose(bp[:, 0], (0, 2, 1))             # (T, B, W)
    chars = jnp.transpose(bp[:, 1], (0, 2, 1))
    return reconstruct_best_path(parents, chars, best, w=w, bsz=bsz,
                                 t_max=t_max, l_max=l_max)
