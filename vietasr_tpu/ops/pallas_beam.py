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

Wide beams (the reference's actual deploy configs: W=100 CLI
/root/reference/infer.py:191, W=50 web app.py:27) are first-class: the
prefix merge runs in O(W^2) per step — a stay beam can only absorb
extensions of its own last char, so the (W, W, K, B) candidate equality
the round-2 kernel materialized (and that crashed Mosaic past W=32)
collapses to a (W, W, B) test processed in 8-parent blocks, with absorbed
extensions recovered exactly through per-parent char bitmasks — and the
top-W selection switches from W sequential masked-max passes to a 32-step
binary threshold search + exact MXU-cumsum ranks + blocked one-hot slot
scatter. Internal width pads to the 8-sublane tile (extra slots
permanently dead), so any requested beam_width is supported.

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
interpret mode and spot-checked compiled on TPU — scoped: on real-model
posteriors the compiled kernel's transcripts match the XLA scan; on
SYNTHETIC random logits at W=100 a few rows per batch diverge (fp tie
resolution between different summation orders — both sides are valid
beam searches; measured round 5, docs/rooflines.md wide-beam record).
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

# final-state pack row indices (u32 bit patterns; f32 fields bitcast).
# Rows 5.. hold the order-dependent word-LM context/backoff state:
# 2*n_ctxw context hash rows, n_bo carried backoffs, then plen last —
# N_FIN = 6 + 2*n_ctxw + n_bo (see _fin_rows).
(F_PB, F_PNB, F_LM, F_WH1, F_WH2) = range(5)
F_CTX = 5


def _fin_rows(n_ctxw: int, n_bo: int):
    """(F_BO, F_PLEN, N_FIN) for the order-dependent final-state pack."""
    f_bo = F_CTX + 2 * n_ctxw
    f_plen = f_bo + n_bo
    return f_bo, f_plen, f_plen + 1


class DenseLM(NamedTuple):
    """Dense-packed word-LM table for the kernel (occupied rows only).

    Rows are grouped by level (0=unigram, 1=bigram, ..., L-1); `level`
    marks each row's group so a chain only matches its own level. Padding
    rows carry key 0 / level -1 and can never match. `order` (static) is
    the LM order L (up to 5 — the reference's artifact range).
    """

    key1: jnp.ndarray      # (N, 1) uint32
    key2: jnp.ndarray      # (N, 1) uint32
    logp: jnp.ndarray      # (N, 1) f32
    bo: jnp.ndarray        # (N, 1) f32
    level: jnp.ndarray     # (N, 1) int32
    unk_logp: float
    order: int = 3


def dense_lm_from_tables(tables: WordLMTables,
                         unk_logp: float) -> DenseLM:
    """Dense-pack an open-addressing WordLMTables (drop empty slots)."""
    packed = np.asarray(tables.packed)
    n_levels = int(np.asarray(tables.masks).shape[0])
    bases = [int(b) for b in np.asarray(tables.bases)]
    sizes = [int(m) + 1 for m in np.asarray(tables.masks)]
    rows, levels = [], []
    for lvl in range(n_levels):
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
        order=n_levels,
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


def _word_lm_queries(ctx, wh1, wh2, n_levels):
    """Hash-fold the L chain lookup keys, (W, B) pairs. `ctx` is the
    context-hash pair list, most recent first (ctx[0] = c_1)."""
    one = jnp.uint32(KEY_SEED)
    out = []
    for j in range(1, n_levels + 1):     # chain j = j-gram (c_{j-1}..c_1 w)
        s1 = s2 = one
        for i in range(j - 1, 0, -1):    # fold oldest context first
            s1, s2 = _fold(s1, s2, ctx[i - 1][0], ctx[i - 1][1])
        out.append(_fold(s1, s2, wh1, wh2))
    return tuple(out)


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


def _lm_match_init(qshape, n_levels):
    return (tuple(jnp.zeros(qshape, jnp.int32) for _ in range(n_levels)),
            tuple(jnp.full(qshape, NEG, jnp.float32)
                  for _ in range(n_levels)),
            tuple(jnp.full(qshape, NEG, jnp.float32)
                  for _ in range(n_levels)))


def _lm_combine(state, unk_logp, ctx, bo_carries):
    """Katz backoff combine — mirrors device_beam._word_lm_score
    (dense=True) bit for bit, for any order."""
    hit_masks, vals, raw_bos = state
    n_levels = len(hit_masks)
    any_hits = [m != 0 for m in hit_masks]
    bos = [jnp.where(any_hits[i], raw_bos[i], 0.0)
           for i in range(n_levels)]
    p = jnp.where(any_hits[0], vals[0], unk_logp)
    exists = None
    for j in range(1, n_levels):
        ex_j = ctx[j - 1][0] != 0
        exists = ex_j if exists is None else exists & ex_j
        pj = jnp.where(any_hits[j], vals[j], bo_carries[j - 1] + p)
        p = jnp.where(exists, pj, p)
    new_bos = bos[: n_levels - 1]
    return p, new_bos


def _word_lm_score_k(lm: DenseLM, unk_logp, ctx, wh1, wh2, bo_carries,
                     n_levels):
    """Single-pass dense-match Katz backoff, (W, B) queries. Used for
    finalization (plain XLA) and for small tables inside the kernel."""
    queries = _word_lm_queries(ctx, wh1, wh2, n_levels)
    state = _lm_match_init(wh1.shape, n_levels)
    state = _lm_match_block(lm.key1, lm.key2, lm.logp, lm.bo, lm.level,
                            queries, state)
    return _lm_combine(state, unk_logp, ctx, bo_carries)


def _word_lm_score_refs(k1_ref, k2_ref, lg_ref, bo_ref, lv_ref, chunk,
                        unk_logp, ctx, wh1, wh2, bo_carries, n_levels):
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
    queries = _word_lm_queries(ctx, wh1, wh2, n_levels)
    state = _lm_match_init(wh1.shape, n_levels)

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
    return _lm_combine(state, unk_logp, ctx, bo_carries)


# sublane block sizes for the wide-beam (W > _SMALL_W) code paths: the
# merge loops over parent blocks, slot assignment and parent select loop
# over new-slot blocks, so no temporary ever holds a full (W, W, ...) or
# (n_cand, W, ...) array in VMEM — that is what crashed Mosaic past W=32
# in the round-2 kernel (the (W, W, K, B) merge temporaries)
_SMALL_W = 32
_MERGE_BLK = 8
_SLOT_BLK = 8


def _cumsum_excl_pair(a, b):
    """Exact exclusive cumulative sums of two 0/1 arrays (N, B) along axis
    0, via ONE strictly-lower-triangular matmul on the MXU. bf16 inputs
    are exact (0/1), f32 accumulation is exact for counts < 2^24."""
    n, bsz = a.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = (col < row).astype(jnp.bfloat16)                   # strict lower
    x = jnp.concatenate([a, b], axis=1).astype(jnp.bfloat16)  # (N, 2B)
    out = jax.lax.dot_general(
        tri, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out[:, :bsz], out[:, bsz:]


def _beam_kernel(lens_ref, lp_ref, toplp_ref, topci_ref, *rest,
                 w: int, w_live: int, k_c: int, v1: int, blank: int,
                 space: int, alpha: float, beta: float, has_lm: bool,
                 unk_logp: float, lm_chunk: int, n_ctxw: int, n_bo: int,
                 ablate: str = ""):
    rest = list(rest)
    if has_lm:
        k1_hbm, k2_hbm, lg_hbm, bo_hbm, lv_hbm = rest[:5]
        del rest[:5]
    bp_ref, fin_ref = rest[:2]
    (h1_s, h2_s, pb_s, pnb_s, lm_s, last_s, plen_s, wh1_s, wh2_s) = \
        rest[2:11]
    pos = 11
    ctx_s = [(rest[pos + 2 * j], rest[pos + 2 * j + 1])
             for j in range(n_ctxw)]
    pos += 2 * n_ctxw
    bo_s = rest[pos : pos + n_bo]
    pos += n_bo
    b1_s, b2_s, ptot_s, kills_s = rest[pos : pos + 4]
    pos += 4
    if has_lm:
        k1_ref, k2_ref, lg_ref, bo_ref, lv_ref, lm_sem = rest[pos:]
    lm_order = n_bo + 1          # LM chain count when has_lm
    F_BO, F_PLEN, _ = _fin_rows(n_ctxw, n_bo)
    t = pl.program_id(0)

    if has_lm:
        # the dense LM lives in HBM (memory_space=ANY) and is DMA'd into
        # VMEM scratch ONCE at t == 0. Passing it as grid-blocked (n, 1)
        # VMEM inputs instead re-fetched all five lane-width-1 columns
        # EVERY grid step — measured ~240 us/step of pure DMA at W=104
        # (tools/probe_beam_shell.py), dwarfing the entire compute.
        @pl.when(t == 0)
        def _load_lm():
            pairs = ((k1_hbm, k1_ref), (k2_hbm, k2_ref), (lg_hbm, lg_ref),
                     (bo_hbm, bo_ref), (lv_hbm, lv_ref))
            copies = [pltpu.make_async_copy(src, dst, lm_sem.at[i])
                      for i, (src, dst) in enumerate(pairs)]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
    bsz = pb_s.shape[1]
    n_words = kills_s.shape[0]
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
        for ref in [wh1_s, wh2_s] + [r for pair in ctx_s for r in pair]:
            ref[...] = jnp.zeros((w, bsz), jnp.uint32)
        for ref in bo_s:
            ref[...] = jnp.zeros((w, bsz), jnp.float32)

    if "body" in ablate:        # timing floor: state identity + bp write
        bp_ref[0, 0] = row_w
        bp_ref[0, 1] = jnp.full((w, bsz), -1, jnp.int32)
        fin_ref[F_PB] = jax.lax.bitcast_convert_type(
            pb_s[...] + lp_ref[0, blank:blank + 1, :], jnp.uint32)
        return

    h1 = h1_s[...]
    h2 = h2_s[...]
    pb = pb_s[...]
    pnb = pnb_s[...]
    lmsc = lm_s[...]
    last = last_s[...]
    plen = plen_s[...]
    wh1 = wh1_s[...]
    wh2 = wh2_s[...]
    ctx = [(a[...], b[...]) for a, b in ctx_s]
    bos = [r[...] for r in bo_s]
    c1h1, c1h2 = ctx[0]

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

    if has_lm and "lm" in ablate:
        has_lm = False      # timing ablation: skip the LM match
    if has_lm:
        if lm_chunk > 0:
            raw_sw, new_bos = _word_lm_score_refs(
                k1_ref, k2_ref, lg_ref, bo_ref, lv_ref, lm_chunk,
                unk_logp, ctx, wh1, wh2, bos, lm_order)
        else:
            lm = DenseLM(key1=k1_ref[...], key2=k2_ref[...],
                         logp=lg_ref[...], bo=bo_ref[...],
                         level=lv_ref[...], unk_logp=unk_logp,
                         order=lm_order)
            raw_sw, new_bos = _word_lm_score_k(
                lm, unk_logp, ctx, wh1, wh2, bos, lm_order)
        sw = jnp.where(wh1 != 0, alpha * raw_sw + beta, 0.0)  # (W, B)
        ext_lm = lmsc[:, None, :] + jnp.where(
            is_space_c[None], sw[:, None, :], 0.0)
    else:
        sw = jnp.zeros((w, bsz), jnp.float32)
        new_bos = [jnp.zeros((w, bsz), jnp.float32) for _ in range(n_bo)]
        ext_lm = jnp.broadcast_to(lmsc[:, None, :], ext_pnb.shape)

    # ---- merge: stay(j) absorbs ext(i, c) iff equal canonical prefix ----
    # O(W^2), not O(W^2 K): a stay j can only absorb extensions with the
    # char c == last_j (the merged prefix must END in last_j), so the per-
    # candidate equality collapses to one (Wj, Wi) test with c = last_j,
    # guarded by "last_j was expanded this frame at all" (in_topk). The
    # kill side (which ext candidates were absorbed) is recovered exactly
    # from per-parent char bitmasks: hit(j, i) implies ext(i, last_j) was
    # absorbed, and for a fixed (i, c) at most one stay can absorb it
    # (beams are distinct), so OR-ing 1 << last_j bits over j is exact.
    in_topk = jnp.any(last[:, None, :] == top_ci[None], axis=1)  # (W, B)
    is_space_l = last == space
    cplus_l = jax.lax.bitcast_convert_type(last + 1, jnp.uint32)
    # i-side (extended-parent) fields the block loop slices from refs
    b1_s[...] = b1
    b2_s[...] = b2
    ptot_s[...] = p_tot

    def merge_block(i0, blk):
        """(Wj, blk, B) masked absorbed-mass values + hit mask for the
        parent block [i0, i0+blk)."""
        s = (pl.ds(i0, blk), slice(None))
        h1_i = h1_s[s][None]                                 # (1, blk, B)
        h2_i = h2_s[s][None]
        b1_i = b1_s[s][None]
        b2_i = b2_s[s][None]
        pb_i = pb_s[s][None]
        ptot_i = ptot_s[s][None]
        last_i = last_s[s][None]
        sp_j = is_space_l[:, None, :]
        eh1 = jnp.where(sp_j, h1_i,
                        b1_i * jnp.uint32(P1) + cplus_l[:, None, :])
        eh2 = jnp.where(sp_j, h2_i,
                        b2_i * jnp.uint32(P2) + cplus_l[:, None, :])
        hit = in_topk[:, None, :] \
            & (h1[:, None, :] == eh1) & (h2[:, None, :] == eh2)
        base = jnp.where(last[:, None, :] == last_i, pb_i, ptot_i)
        vals = jnp.where(hit, base + lp_last[:, None, :], NEG)
        return vals, hit

    n_mblk = w if w <= _SMALL_W else _MERGE_BLK
    # ONE blocked pass: online (rescaled) logsumexp over stay_pnb and
    # every absorbed value, with the per-parent kill bitmasks written
    # from the same (Wj, blk, B) temporaries. The previous two-pass form
    # (exact global max, then exp-sums at it) computed merge_block —
    # the hash extends, equality tests and masked values — TWICE per
    # parent block; at W=104 that doubled the dominant O(W^2) term.
    # Decode equality with the XLA scan is preserved (only the fp
    # summation order changes; tests compare decoded ids).
    last_u = jax.lax.bitcast_convert_type(jnp.maximum(last, 0), jnp.uint32)
    word_l = jax.lax.shift_right_logical(last_u, jnp.uint32(5))
    bit_l = jnp.where(
        in_topk,
        jax.lax.shift_left(jnp.full_like(last_u, 1),
                           last_u & jnp.uint32(31)),
        jnp.uint32(0))

    def merge_acc(i0, blk, m, s):
        """Online-logsumexp update over parent block [i0, i0+blk):
        invariant total = m + log(s), s = sum exp(item - m) so far."""
        vals, hit = merge_block(i0, blk)
        m2 = jnp.maximum(m, jnp.max(vals, axis=1))           # (Wj, B)
        s = s * jnp.exp(jnp.maximum(m - m2, NEG)) + jnp.sum(
            jnp.exp(jnp.maximum(vals - m2[:, None, :], NEG)), axis=1)
        for w0 in range(n_words):
            contrib = jnp.where(
                hit & (word_l == w0)[:, None, :],
                bit_l[:, None, :], jnp.uint32(0))            # (Wj, blk, B)
            # disjoint-bit OR == i32 sum (at most one hit per (i, char))
            kills_s[w0, pl.ds(i0, blk), :] = jax.lax.bitcast_convert_type(
                jnp.sum(jax.lax.bitcast_convert_type(contrib, jnp.int32),
                        axis=0), jnp.uint32)
        return m2, s

    ones = jnp.ones_like(stay_pnb)       # exp(stay_pnb - stay_pnb)
    if "merge" in ablate:       # timing ablation
        mmax, msum = stay_pnb, ones
    elif w <= _SMALL_W:
        mmax, msum = merge_acc(0, w, stay_pnb, ones)
    else:
        def accbody(i, carry):
            return merge_acc(i * n_mblk, n_mblk, *carry)

        mmax, msum = jax.lax.fori_loop(0, w // n_mblk, accbody,
                                       (stay_pnb, ones))
    stay_pnb_m = jnp.where(mmax <= NEG / 2, NEG,
                           mmax + jnp.log(jnp.maximum(msum, 1e-38)))

    # killed(i, k): bit c_k of parent i's kill words
    ci_u = jax.lax.bitcast_convert_type(top_ci, jnp.uint32)
    c_w = jax.lax.shift_right_logical(ci_u, jnp.uint32(5))    # (K, B)
    c_b = ci_u & jnp.uint32(31)
    killed = jnp.zeros((w, k_c, bsz), jnp.bool_)
    if "merge" not in ablate:
        for w0 in range(n_words):
            kw = kills_s[w0]                                 # (W, B)
            bit = jax.lax.shift_right_logical(
                kw[:, None, :], c_b[None]) & jnp.uint32(1)
            killed = killed | ((bit == 1) & (c_w == w0)[None])
    ext_pnb_rank = jnp.where(killed, NEG, ext_pnb)

    # ---- rank all W*(K+1) candidates, keep top w_live ----
    stay_total = _lse2(stay_pb, stay_pnb_m) + lmsc           # (W, B)
    ext_total = ext_pnb_rank + ext_lm                        # (W, K, B)
    totals = jnp.concatenate(
        [stay_total, ext_total.reshape(w * k_c, bsz)], axis=0)  # (W+WK, B)
    n_cand = w + w * k_c
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (n_cand, bsz), 0)
    if w <= _SMALL_W:
        # small W: w sequential masked-max passes (measured ~2 us at
        # W=16); slot order = rank order, matching XLA top_k exactly
        taken = jnp.zeros((n_cand, bsz), jnp.bool_)
        idx_rows, val_rows = [], []
        for _ in range(w):
            cur = jnp.where(taken, NEG * 2, totals)
            mm = jnp.max(cur, axis=0, keepdims=True)         # (1, B)
            idx = jnp.min(jnp.where(cur == mm, rows_c, n_cand), axis=0,
                          keepdims=True)                     # (1, B)
            idx_rows.append(idx)
            val_rows.append(mm)
            taken = taken | (rows_c == idx)
        top_idx = jnp.concatenate(idx_rows, axis=0)          # (W, B)
        top_val = jnp.concatenate(val_rows, axis=0)          # (W, B)
        dead_sel = top_val <= NEG / 2
    elif "thresh" in ablate:    # timing ablation: identity selection
        top_idx = row_w
        dead_sel = jnp.zeros((w, bsz), jnp.bool_)
    else:
        # wide W (the reference's deploy widths, 50/100): sequential
        # passes and (n_cand, W, B) one-hots don't scale, so (1) find the
        # w_live-th largest total per lane by a 32-step binary search on
        # the sortable-u32 image of f32, (2) select the > threshold
        # candidates plus ties filled in index order (== XLA top_k's
        # tie-breaking, so the KEPT SET is identical; slot ORDER differs,
        # which the beam semantics and the backtrace are invariant to),
        # (3) compute each selected candidate's slot = its rank among
        # selected via an exact MXU cumsum, and scatter candidate row ids
        # to slots in 8-row one-hot blocks.
        t_u = jax.lax.bitcast_convert_type(totals, jnp.uint32)
        t_i = jax.lax.bitcast_convert_type(totals, jnp.int32)
        t_s = jnp.where(t_i < 0, ~t_u, t_u | jnp.uint32(0x80000000))
        th = jnp.zeros((1, bsz), jnp.uint32)
        # RADIX-4 threshold search: 16 serial iterations resolving 2
        # bits each via THREE independent counts evaluated in parallel.
        # Round-5 measurements showed the old 32-step radix-2 search is
        # bound by the SERIAL chain latency, not reduce throughput: an
        # MXU matvec count (a) fails to compile at the default 16 MiB
        # scoped-VMEM limit (32 staged dot operands, +1.75 MiB at
        # W=104/B=128) and (b) with vmem_limit_bytes raised, runs at
        # exactly the same 68.8 ms/batch as the VPU reduce. Halving the
        # chain length attacks the actual bound; the three counts per
        # iteration are data-independent so the VPU pipelines them.
        for hi in range(30, -2, -2):
            c1 = th | jnp.uint32(1 << hi)                # bits 01
            c2 = th | jnp.uint32(2 << hi)                # bits 10
            c3 = th | jnp.uint32(3 << hi)                # bits 11
            n1 = jnp.sum((t_s >= c1).astype(jnp.int32), axis=0,
                         keepdims=True)
            n2 = jnp.sum((t_s >= c2).astype(jnp.int32), axis=0,
                         keepdims=True)
            n3 = jnp.sum((t_s >= c3).astype(jnp.int32), axis=0,
                         keepdims=True)
            th = jnp.where(
                n3 >= w_live, c3,
                jnp.where(n2 >= w_live, c2,
                          jnp.where(n1 >= w_live, c1, th)))
        gt = t_s > th                                        # (n_cand, B)
        eq = t_s == th
        gt_rank, eq_rank = _cumsum_excl_pair(
            gt.astype(jnp.float32), eq.astype(jnp.float32))
        n_gt = jnp.sum(gt.astype(jnp.int32), axis=0,
                       keepdims=True).astype(jnp.float32)    # (1, B)
        need_eq = jnp.float32(w_live) - n_gt
        selected = gt | (eq & (eq_rank < need_eq))
        rank = gt_rank + jnp.minimum(eq_rank, need_eq)       # (n_cand, B)
        # candidate row id and dead bit packed into ONE field so a single
        # value rides the (n_cand, slot-block, B) one-hot sums
        dead_c = (totals <= NEG / 2).astype(jnp.int32)
        code_c = (rows_c * 2 + dead_c).astype(jnp.float32)   # exact < 2^24
        slot_blocks = []
        for s0 in range(0, w, _SLOT_BLK):
            r_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, _SLOT_BLK, bsz), 1) + s0
            oh = selected[:, None, :] \
                & (rank[:, None, :] == r_iota.astype(jnp.float32))
            slot_blocks.append(
                jnp.sum(jnp.where(oh, code_c[:, None, :], 0.0), axis=0))
        slot_code = jnp.concatenate(slot_blocks, axis=0).astype(jnp.int32)
        top_idx = jax.lax.shift_right_logical(slot_code, 1)  # cand row id
        dead_sel = (slot_code & 1) == 1

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
    # pad slots (w_live rounded up to the 8-sublane tile) are always dead
    if w_live < w:
        dead_sel = dead_sel | (row_w >= w_live)

    # ---- parent-state select: one-hot over the W parents, in slot-row
    # blocks so no (W, W, B) temporary materializes at wide W ----
    ufields = [h1, h2, wh1, wh2] + [h for pair in ctx for h in pair]
    ffields = [pb, pnb, lmsc] + bos \
        + [stay_pb, stay_pnb_m, sw] + new_bos
    ifields = (last, plen)
    sblk = w if w <= _SMALL_W else _SLOT_BLK
    if "psel" in ablate:        # timing ablation: identity parent select
        usel, fsel = list(ufields), list(ffields)
        p_last, p_plen = ifields
    else:
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, w, bsz), 1)
        uouts = [[] for _ in ufields]
        fouts = [[] for _ in ffields]
        iouts = [[] for _ in ifields]
        for s0 in range(0, w, sblk):
            pblk = sel_parent[s0:s0 + sblk][:, None, :] == iota_p
            for li, f in enumerate(ufields):
                uouts[li].append(_i32sum_onehot(pblk, f[None], axis=1))
            for li, f in enumerate(ffields):
                fouts[li].append(
                    jnp.sum(jnp.where(pblk, f[None], 0.0), axis=1))
            for li, f in enumerate(ifields):
                iouts[li].append(
                    jnp.sum(jnp.where(pblk, f[None], 0), axis=1))

        def cat(parts):
            return parts[0] if len(parts) == 1 else \
                jnp.concatenate(parts, 0)

        usel = [cat(o) for o in uouts]
        fsel = [cat(o) for o in fouts]
        p_last, p_plen = [cat(o) for o in iouts]
    p_h1, p_h2, p_wh1, p_wh2 = usel[:4]
    p_ctx = [(usel[4 + 2 * j], usel[4 + 2 * j + 1]) for j in range(n_ctxw)]
    p_c1h1, p_c1h2 = p_ctx[0]
    p_pb, p_pnb, p_lm = fsel[:3]
    p_bos = fsel[3 : 3 + n_bo]
    p_staypb, p_staypnbm, p_sw = fsel[3 + n_bo : 6 + n_bo]
    p_newbos = fsel[6 + n_bo : 6 + 2 * n_bo]

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
    # completed-word context shift: c_1 <- w, c_j <- c_{j-1}
    new_ctx = [(jnp.where(shift_w, p_wh1, p_c1h1),
                jnp.where(shift_w, p_wh2, p_c1h2))]
    for j in range(1, n_ctxw):
        new_ctx.append((jnp.where(shift_w, p_ctx[j - 1][0], p_ctx[j][0]),
                        jnp.where(shift_w, p_ctx[j - 1][1],
                                  p_ctx[j][1])))
    new_bo_vals = [jnp.where(shift_w, p_newbos[j], p_bos[j])
                   for j in range(n_bo)]

    dead = dead_sel
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
    for j in range(n_ctxw):
        ctx_s[j][0][...] = frz(new_ctx[j][0], ctx[j][0])
        ctx_s[j][1][...] = frz(new_ctx[j][1], ctx[j][1])
    for j in range(n_bo):
        bo_s[j][...] = frz(new_bo_vals[j], bos[j])

    def u(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint32)

    fin_ref[F_PB] = u(pb_s[...])
    fin_ref[F_PNB] = u(pnb_s[...])
    fin_ref[F_LM] = u(lm_s[...])
    fin_ref[F_WH1] = wh1_s[...]
    fin_ref[F_WH2] = wh2_s[...]
    for j in range(n_ctxw):
        fin_ref[F_CTX + 2 * j] = ctx_s[j][0][...]
        fin_ref[F_CTX + 2 * j + 1] = ctx_s[j][1][...]
    for j in range(n_bo):
        fin_ref[F_BO + j] = u(bo_s[j][...])
    fin_ref[F_PLEN] = u(plen_s[...])


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
    ablate: str = "",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, V+1) log-probs -> (prefixes (B, L), lens (B,)).

    Kernel-fused equivalent of device_beam_search for the canonical
    (space-normalized) identity with optional dense word-LM fusion
    (order <= 5 — the reference's full artifact range). `ablate` is a
    compile-time timing knob ("lm"/"merge"/"thresh"/"psel"/"body") that
    stubs a kernel section for per-section cost attribution — it breaks
    decode semantics and exists only for tools/ablate_wide_beam.py.
    """
    lm_order = int(dense_lm.order) if dense_lm is not None else 0
    return _pallas_beam_jit(
        log_probs, lengths, dense_lm, blank=blank, beam_width=beam_width,
        cutoff_top_n=cutoff_top_n, unk_logp=unk_logp, alpha=alpha,
        beta=beta, space=space, max_len=max_len, interpret=interpret,
        lm_chunk=lm_chunk, ablate=ablate, lm_order=lm_order)


@functools.partial(
    jax.jit, static_argnames=("beam_width", "blank", "max_len", "alpha",
                              "beta", "cutoff_top_n", "space", "unk_logp",
                              "interpret", "lm_chunk", "ablate",
                              "lm_order"))
def _pallas_beam_jit(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    dense_lm: Optional[DenseLM],
    *,
    blank: int,
    beam_width: int,
    cutoff_top_n: int,
    unk_logp: float,
    alpha: float,
    beta: float,
    space: int,
    max_len: int,
    interpret: bool,
    lm_chunk: Optional[int],
    ablate: str,
    lm_order: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from vietasr_tpu.ops.device_beam import reconstruct_best_path
    from vietasr_tpu.utils.typing import assert_log_probs

    assert_log_probs(log_probs, num_classes=blank,
                     port="pallas_beam_search.log_probs")
    if space < 0:
        raise ValueError("pallas_beam_search requires the space label id")
    bsz, t_max, v1 = log_probs.shape
    v = v1 - 1
    # internal width pads to the 8-sublane tile; the extra slots are kept
    # permanently dead (poisoned hash, NEG score) so results are identical
    # to the requested beam_width
    w = (beam_width + 7) // 8 * 8
    k_c = v if cutoff_top_n <= 0 or cutoff_top_n >= v else cutoff_top_n
    l_max = max_len or t_max
    n_kill_words = (v + 31) // 32
    # word-LM context width scales with the LM order (device_beam.py);
    # without an LM only c_1 is tracked for the separator logic
    n_ctxw = max(lm_order - 1, 1)
    n_bo = max(lm_order - 1, 0)
    f_bo, f_plen, n_fin = _fin_rows(n_ctxw, n_bo)

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
            order=dense_lm.order,
        )
        n += pad
    kern = functools.partial(
        _beam_kernel, w=w, w_live=beam_width, k_c=k_c, v1=v1, blank=blank,
        space=space, alpha=alpha, beta=beta, has_lm=has_lm,
        unk_logp=unk_logp, lm_chunk=lm_chunk, n_ctxw=n_ctxw, n_bo=n_bo,
        ablate=ablate)
    # LM table rides to HBM untouched; the kernel DMAs it to VMEM once
    lm_specs = [pl.BlockSpec(memory_space=pl.ANY)
                for _ in range(5)] if has_lm else []
    lm_args = ([dense_lm.key1, dense_lm.key2, dense_lm.logp, dense_lm.bo,
                dense_lm.level] if has_lm else [])
    lm_scratch = ([pltpu.VMEM((n, 1), jnp.uint32)] * 2
                  + [pltpu.VMEM((n, 1), jnp.float32)] * 2
                  + [pltpu.VMEM((n, 1), jnp.int32)]
                  + [pltpu.SemaphoreType.DMA((5,))]) if has_lm else []

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
            pl.BlockSpec((n_fin, w, bsz), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, 2, w, bsz), jnp.int32),
            jax.ShapeDtypeStruct((n_fin, w, bsz), jnp.uint32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((w, bsz), jnp.uint32)] * 2      # h1 h2
            + [pltpu.VMEM((w, bsz), jnp.float32)] * 3   # pb pnb lm
            + [pltpu.VMEM((w, bsz), jnp.int32)] * 2     # last plen
            + [pltpu.VMEM((w, bsz), jnp.uint32)] * 2    # word hashes
            + [pltpu.VMEM((w, bsz), jnp.uint32)] * (2 * n_ctxw)  # ctx
            + [pltpu.VMEM((w, bsz), jnp.float32)] * n_bo  # bo carries
            + [pltpu.VMEM((w, bsz), jnp.uint32)] * 2    # merge b1 b2
            + [pltpu.VMEM((w, bsz), jnp.float32)]       # merge p_tot
            + [pltpu.VMEM((n_kill_words, w, bsz), jnp.uint32)]  # kills
            + lm_scratch                                # VMEM LM + DMA sem
        ),
        interpret=interpret,
    )(lens2, lp_t, top_lp, top_ci, *lm_args)

    def f32(row):
        return jax.lax.bitcast_convert_type(fin[row], jnp.float32)

    total = _lse2(f32(F_PB), f32(F_PNB)) + f32(F_LM)         # (W, B)
    if has_lm:
        # finalization runs in plain XLA — no VMEM constraint, one pass
        fctx = [(fin[F_CTX + 2 * j], fin[F_CTX + 2 * j + 1])
                for j in range(n_ctxw)]
        fbos = [f32(f_bo + j) for j in range(n_bo)]
        sw, _ = _word_lm_score_k(
            dense_lm, unk_logp, fctx, fin[F_WH1], fin[F_WH2], fbos,
            lm_order)
        total = total + jnp.where(fin[F_WH1] != 0,
                                  alpha * sw + beta, 0.0)
    best = jnp.argmax(total, axis=0)                         # (B,)

    parents = jnp.transpose(bp[:, 0], (0, 2, 1))             # (T, B, W)
    chars = jnp.transpose(bp[:, 1], (0, 2, 1))
    return reconstruct_best_path(parents, chars, best, w=w, bsz=bsz,
                                 t_max=t_max, l_max=l_max)
