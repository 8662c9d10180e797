"""Fully on-device batched CTC beam search with LM shallow fusion.

The reference's beam search is CPU-pinned, batch-1, with a device->host
transfer of the whole posterior (beam_search_decoder.py:75-102). This one
runs under jit on the TPU, batched over utterances, with NO host round
trip.

TPU-first design notes:

- fixed beam width W; every step expands all W*(K+1) candidates as dense
  arrays (VPU-friendly, no dynamic shapes);
- prefix merging (the part SURVEY.md §7 flags as awkward in SIMD) exploits
  a structural fact: live beams hold DISTINCT prefixes, so two stays can
  never merge, two single-char extensions of distinct prefixes can never
  merge, and the only possible merge is stay(j) <- extension(i, c) when
  prefix_j == prefix_i + [c]. That is a dense (W, W*K) equality test on
  rolling prefix hashes — a masked logsumexp + top_k, with no sort and no
  scatter (the previous sort+segment-ops formulation bottlenecked on
  vmapped segment_max/segment_sum, which lower to serial scatters on TPU);
- when `space` is given (and no char-LM table is in play), beam identity
  is the CANONICAL text — leading/trailing/repeated spaces collapse, like
  pyctcdecode and the Python oracle whose identity is
  (words, partial, last_char): the rolling hash covers the canonical char
  sequence (a separator is folded in only when a non-space char starts a
  new word), a space extension leaves the hash unchanged, and the
  last-emitted char joins the equality test to keep "c" and "c " distinct;
- prefixes are identified by TWO independent 32-bit rolling hashes (a
  64-bit composite — false-merge odds ~(W^2 K)/2^64 per step);
- char-level n-gram LM shallow fusion reads a dense backoff table
  (ops/lm.py:char_lm_table) with one gather per step;
- WORD-level n-gram LM shallow fusion (the reference's production decode:
  KenLM word 3/4/5-gram, alpha=0.5 beta=1.5, infer.py:64-67 +
  .MISSING_LARGE_BLOBS:4-6) runs on device
  against hashed open-addressing tables (ops/lm.py:word_lm_tables) living
  in HBM. Each beam carries rolling hashes of its partial word and of the
  last two completed words; when a beam extends with the space character
  the completed word is scored with full Katz backoff
  (5-gram -> ... -> bo+bigram -> bo+unigram -> <unk>, order-deep Katz
  chain) via a handful of (B, W)
  gather probes per step. Semantics match ops/beam_search.py's Python
  oracle exactly, including the trailing-partial-word score at the end.

Returns the top beam's label ids per utterance; the host only renders text.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e30

# largest word-LM table (dense rows) auto-routed to the fused Pallas
# kernel: its dense match is O(N) VPU work per step (~27 ns/row/step
# measured) while this module's XLA probing-gather path is
# N-independent (~131 us/step). Measured crossover: ~1k rows at T=200
# frames, ~3.5k at T=500 (tools/bench_beam_lm_size.py; the kernel's
# fixed cost amortizes with T). 2048 splits the difference; pass
# impl="pallas"/"xla" to override per deployment.
PALLAS_WLM_MAX_ROWS = 2048
# widest beam auto-routed to the fused kernel. The round-2 kernel crashed
# Mosaic past W=32 (its (W, W, K, B) merge temporaries); the kernel now
# (a) merges in O(W^2) — a stay can only absorb extensions of its own
# last char — in 8-parent blocks, and (b) selects the top W by a
# threshold search + MXU-cumsum ranks instead of W sequential passes, so
# it compiles and runs at the reference's deploy widths (infer.py:191
# W=100, app.py:27 W=50). 128 is a routing cap, not a compile limit;
# beyond it the per-step W^2 VPU work makes the XLA scan competitive.
PALLAS_MAX_BEAM_WIDTH = 128
_HASH_P1 = jnp.uint32(1000003)
_HASH_P2 = jnp.uint32(69069)


# widest n-gram order the on-device word-LM fusion supports — covers the
# reference's full artifact set (3/4/5-gram KenLM binaries,
# /root/reference/.MISSING_LARGE_BLOBS:4-6)
MAX_WLM_ORDER = 5


class WordLMTables(NamedTuple):
    """Hashed n-gram tables for on-device word-LM fusion (order <= 5).

    Built by ops/lm.py:word_lm_tables. Every level is an open-addressing
    hash table (linear probing, power-of-two size, key 0 = empty slot)
    keyed by two independent 32-bit hash lanes folded over the n-gram's
    word hashes. `probes` (static) bounds the probe chain: the builder
    records the worst displacement at insert time.

    All L levels live INTERLEAVED in one (N, 4) uint32 array —
    [key1, key2, logp_bits, backoff_bits] per row — so one beam-search
    step fetches every probe of every backoff chain with a SINGLE gather
    (the previous layout's ~40 tiny gathers per step were 6x the cost of
    the rest of the step combined). Natural-log prob/backoff are bitcast
    f32. Level placement: rows [bases[j], bases[j] + masks[j] + 1) hold
    the (j+1)-grams; masks/bases are (L,) uint32 device arrays, so the
    LM order is static via masks.shape[0].
    """

    packed: jnp.ndarray        # (N, 4) uint32
    masks: jnp.ndarray         # (L,) uint32: level_size - 1
    bases: jnp.ndarray         # (L,) uint32 row offsets
    unk_logp: jnp.ndarray      # scalar f32: <unk> logp (or -5e29 floor)


# hash-lane fold multipliers for combining word hashes into n-gram keys
_Q1 = jnp.uint32(2654435761)
_Q2 = jnp.uint32(40503)
_KEY_SEED = jnp.uint32(1)


# packed beam-state column layout (shared with ops/streaming_beam.py):
# ALL per-beam scalars live in one (B, W, n_cols) uint32 tensor, f32
# fields bitcast. Trailing columns past C_CTX scale with the word-LM
# order (context hash pairs, then carried backoff weights).
(C_H1, C_H2, C_PB, C_PNB, C_LM, C_LAST, C_ROW, C_PLEN,
 C_WH1, C_WH2) = range(10)
C_CTX = 10                       # pairs: c_j at (C_CTX+2j, C_CTX+2j+1)


def packed_state_cols(word_lm: Optional["WordLMTables"]) -> int:
    """Number of packed-state columns for a given word-LM config."""
    wlm_levels = int(word_lm.masks.shape[0]) if word_lm is not None else 0
    n_ctxw = max(wlm_levels - 1, 1)
    n_bo = max(wlm_levels - 1, 0)
    return C_CTX + 2 * n_ctxw + n_bo


def init_packed_state(bsz: int, w: int,
                      word_lm: Optional["WordLMTables"] = None
                      ) -> jnp.ndarray:
    """Fresh packed beam state: slot 0 is the live empty prefix, the rest
    are dead with poisoned (unique, never-matching) hashes."""
    f2u = partial(jax.lax.bitcast_convert_type, new_dtype=jnp.uint32)
    n_cols = packed_state_cols(word_lm)
    wlm_levels = int(word_lm.masks.shape[0]) if word_lm is not None else 0
    n_bo = max(wlm_levels - 1, 0)
    slot_poison = (jnp.uint32(0x80000000)
                   + jnp.arange(w, dtype=jnp.uint32))
    neg_bits = f2u(jnp.float32(NEG))
    zero_bits = f2u(jnp.float32(0.0))
    st0 = jnp.zeros((w, n_cols), jnp.uint32)
    st0 = st0.at[:, C_H1].set(jnp.where(jnp.arange(w) == 0,
                                        jnp.uint32(0), slot_poison))
    st0 = st0.at[:, C_H2].set(jnp.where(jnp.arange(w) == 0,
                                        jnp.uint32(0),
                                        jnp.uint32(0xFFFFFFFF)))
    st0 = st0.at[:, C_PB].set(jnp.where(jnp.arange(w) == 0,
                                        zero_bits, neg_bits))
    st0 = st0.at[:, C_PNB].set(neg_bits)
    st0 = st0.at[:, C_LM].set(zero_bits)
    n_ctxw = max(wlm_levels - 1, 1)
    C_BO = C_CTX + 2 * n_ctxw
    for j in range(n_bo):
        st0 = st0.at[:, C_BO + j].set(zero_bits)
    return jnp.broadcast_to(st0[None], (bsz, w, n_cols))


def packed_beam_totals(st, *, word_lm=None, alpha=0.5, beta=0.0,
                       wlm_probes=8):
    """Per-beam total scores from a packed state — p_total + LM, plus the
    trailing-partial-word bonus when a word LM is in play (identical to
    device_beam_search's final ranking, factored out for the streaming
    chunk step)."""
    u2f = partial(jax.lax.bitcast_convert_type, new_dtype=jnp.float32)
    total = _logsumexp2(u2f(st[..., C_PB]), u2f(st[..., C_PNB])) \
        + u2f(st[..., C_LM])
    if word_lm is not None:
        wlm_levels = int(word_lm.masks.shape[0])
        n_ctxw = max(wlm_levels - 1, 1)
        n_bo = max(wlm_levels - 1, 0)
        C_BO = C_CTX + 2 * n_ctxw
        lm_dense = word_lm.packed.shape[0] <= 4096
        wh1 = st[..., C_WH1]
        fctx = [(st[..., C_CTX + 2 * j], st[..., C_CTX + 2 * j + 1])
                for j in range(n_ctxw)]
        fbos = [u2f(st[..., C_BO + j]) for j in range(n_bo)]
        sw, _ = _word_lm_score(word_lm, wlm_probes, fctx, wh1,
                               st[..., C_WH2], fbos, dense=lm_dense)
        total = total + jnp.where(wh1 != 0, alpha * sw + beta, 0.0)
    return total


def _logsumexp2(a, b):
    m = jnp.maximum(a, b)
    safe = jnp.where(m <= NEG / 2, 0.0, m)
    out = safe + jnp.log(
        jnp.exp(jnp.maximum(a - safe, NEG)) + jnp.exp(jnp.maximum(b - safe, NEG)))
    return jnp.where(m <= NEG / 2, NEG, out)


def _fold_key(seed1, seed2, h1, h2):
    return seed1 * _Q1 + h1, seed2 * _Q2 + h2


def _word_lm_score(tables: WordLMTables, probes: int,
                   ctx, wh1, wh2, bo_carries,
                   dense: bool = False):
    """alpha-less natural-log p(word | c_{L-1} ... c_1) with Katz backoff.

    `ctx` is a list of (h1, h2) context-word hash pairs, MOST RECENT
    FIRST: ctx[0] = c_1 (previous word) ... ctx[L-2] = c_{L-1}. Hash 0 =
    absent (empty context slot / empty partial word — caller masks that
    case). Mirrors ops/lm.py:NGramLM._score for any order <= 5; lower-
    order LMs need no special casing: higher chains probe into empty
    levels and the context backoff lands on the stored 0.0.

    The CONTEXT backoff weights bo(c_1), bo(c_2 c_1), ... are passed in
    (`bo_carries`, len L-1), not looked up: they only change when a beam
    completes a word, and at that moment they sit in the very rows this
    function fetches for the new word — the unigram(w), bigram(c_1 w),
    ..., (L-1)-gram rows. The beam search carries them as state, keeping
    the probe chains at L instead of 2L-1. Returns (logp, new_bos): the
    new word's own per-chain backoff weights (len L-1), which become the
    caller's carried `bo_carries` when the word completes.

    All L chains are fused into ONE gather over the packed table:
    indices (..., L, probes) -> rows (..., L, probes, 4); hit selection
    happens on the VPU afterwards.
    """
    MIX = jnp.uint32(0x9E3779B9)
    n_levels = int(tables.masks.shape[0])
    keys1, keys2 = [], []
    for j in range(1, n_levels + 1):     # chain j = j-gram (c_{j-1}..c_1 w)
        s1 = s2 = _KEY_SEED
        for i in range(j - 1, 0, -1):    # fold oldest context first
            s1, s2 = _fold_key(s1, s2, ctx[i - 1][0], ctx[i - 1][1])
        k1, k2 = _fold_key(s1, s2, wh1, wh2)
        keys1.append(k1)
        keys2.append(k2)
    q1 = jnp.stack(keys1, axis=-1)                           # (..., L)
    q2 = jnp.stack(keys2, axis=-1)
    masks = tables.masks
    bases = tables.bases
    if dense:
        # small tables: a brute-force equality match against EVERY row
        # beats the probing gather by ~10x on TPU — XLA lowers the (B, W,
        # L, P, 4) open-addressing gather into a serial windowed loop plus
        # layout copies (~210 us/step measured at B=128, W=16); the dense
        # compare + masked max is a handful of fused VPU passes. Each
        # chain may only match rows of its own level (key hashes of
        # different levels could collide).
        n = tables.packed.shape[0]
        row_id = jnp.arange(n, dtype=jnp.uint32)
        sizes = masks + 1
        level_ok = (row_id[None, :] >= bases[:, None]) \
            & (row_id[None, :] < (bases + sizes)[:, None])   # (L, N)
        key1 = tables.packed[:, 0]
        key2 = tables.packed[:, 1]
        hit = (q1[..., None] == key1) & (q2[..., None] == key2) \
            & level_ok & (q1[..., None] != 0)                # (..., L, N)
        any_hit = jnp.any(hit, axis=-1)                      # (..., L)
        logp_rows = jax.lax.bitcast_convert_type(
            tables.packed[:, 2], jnp.float32)
        bo_rows = jax.lax.bitcast_convert_type(
            tables.packed[:, 3], jnp.float32)
        # at most one row matches, so a masked max IS the lookup
        val = jnp.max(jnp.where(hit, logp_rows, NEG), axis=-1)
        bo = jnp.max(jnp.where(hit, bo_rows, NEG), axis=-1)
        bo = jnp.where(any_hit, bo, 0.0)
    else:
        idx0 = (q1 ^ (q2 * MIX)) & masks
        offs = jnp.arange(probes, dtype=jnp.uint32)
        idx = bases[..., None] + ((idx0[..., None] + offs) & masks[..., None])
        rows = tables.packed[idx.astype(jnp.int32)]          # (...,L,P,4)

        hit = (rows[..., 0] == q1[..., None]) \
            & (rows[..., 1] == q2[..., None]) \
            & (q1[..., None] != 0)      # key 0 marks empty slots
        any_hit = jnp.any(hit, axis=-1)                      # (..., L)
        first = jnp.argmax(hit, axis=-1)                     # (..., L)
        picked = jnp.take_along_axis(rows, first[..., None, None],
                                     axis=-2)[..., 0, :]     # (..., L, 4)
        val = jax.lax.bitcast_convert_type(picked[..., 2], jnp.float32)
        bo = jax.lax.bitcast_convert_type(picked[..., 3], jnp.float32)
        bo = jnp.where(any_hit, bo, 0.0)

    p = jnp.where(any_hit[..., 0], val[..., 0], tables.unk_logp)
    exists = None
    for j in range(1, n_levels):
        ex_j = ctx[j - 1][0] != 0
        exists = ex_j if exists is None else exists & ex_j
        pj = jnp.where(any_hit[..., j], val[..., j], bo_carries[j - 1] + p)
        p = jnp.where(exists, pj, p)
    new_bos = [bo[..., j] for j in range(n_levels - 1)]
    return p, new_bos


@partial(jax.jit, static_argnames=("beam_width", "blank", "max_len",
                                   "n_ctx", "alpha", "beta",
                                   "cutoff_top_n", "space", "wlm_probes",
                                   "return_raw"))
def device_beam_search(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    beam_width: int = 16,
    blank: int,
    lm_table: Optional[jnp.ndarray] = None,
    n_ctx: int = 2,
    alpha: float = 0.5,
    beta: float = 0.0,
    max_len: int = 0,
    cutoff_top_n: int = 0,
    word_lm: Optional[WordLMTables] = None,
    wlm_probes: int = 8,
    space: int = -1,
    carry_state: Optional[jnp.ndarray] = None,
    return_raw: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, V+1) log-probs -> (prefixes (B, L), prefix_lens (B,)).

    lm_table: ((V+1)^n_ctx, V) char-LM table or None. word_lm: hashed
    word-n-gram tables (requires `space` = index of the word separator
    label). alpha/beta are the shallow-fusion weight and per-word (or
    per-char for the char LM) bonus. cutoff_top_n > 0 restricts expansion
    to the top-N tokens per frame (the reference's vocabulary pruning,
    beam_search_decoder.py:34-36) — it shrinks the per-step merge/top-k
    from W*(V+1) to W*(N+1) candidates, the dominant cost on TPU.

    Streaming hooks (ops/streaming_beam.py): `carry_state` resumes the
    scan from a packed (B, W, n_cols) beam state instead of the empty
    prefix, and `return_raw=True` returns (final_state, parents, chars)
    for the caller to carry across chunks and traceback incrementally.
    """
    from vietasr_tpu.utils.typing import assert_log_probs

    assert_log_probs(log_probs, num_classes=blank,
                     port="device_beam_search.log_probs")
    bsz, t_max, v1 = log_probs.shape
    v = v1 - 1
    w = beam_width
    l_max = max_len or t_max
    k_c = v if cutoff_top_n <= 0 or cutoff_top_n >= v else cutoff_top_n
    if word_lm is not None and space < 0:
        raise ValueError("word_lm requires the space label index")
    if word_lm is not None and lm_table is not None:
        raise ValueError("char-LM table and word-LM fusion are exclusive")
    # canonical-text beam identity (oracle/pyctcdecode semantics) needs the
    # space id; char-LM fusion scores RAW sequences, so it keeps raw hashing
    normalize = space >= 0 and lm_table is None
    # domain-sized LM tables take the dense-match path (see _word_lm_score)
    lm_dense = word_lm is not None and word_lm.packed.shape[0] <= 4096

    # ---- packed beam state ----
    # ALL per-beam scalars live in ONE (B, W, C) uint32 tensor (f32 fields
    # bitcast): selection after top_k is then a SINGLE take_along_axis
    # instead of ~16 — on TPU each small gather op costs ~15 us inside a
    # scan step, and they, not the merge math, dominated the step.
    # Trailing columns scale with the word-LM order: n_ctxw completed-word
    # context hash pairs (most recent first) and n_ctxw carried Katz
    # backoff weights (see _word_lm_score). Without a word LM only c_1 is
    # tracked (the canonical-hash separator logic reads it).
    wlm_levels = int(word_lm.masks.shape[0]) if word_lm is not None else 0
    n_ctxw = max(wlm_levels - 1, 1)
    n_bo = max(wlm_levels - 1, 0)
    C_BO = C_CTX + 2 * n_ctxw
    n_cols = C_BO + n_bo

    def f2u(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint32)

    def u2f(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    # slot 0 is the live empty prefix, the rest are dead with poisoned
    # (unique, never-matching) hashes; C_LAST stores last+1 (0 = none
    # yet); word/context hashes start 0
    slot_poison = (jnp.uint32(0x80000000)
                   + jnp.arange(w, dtype=jnp.uint32))        # (W,)
    if carry_state is not None:
        st = carry_state
    else:
        st = init_packed_state(bsz, w, word_lm)

    rows_mod = (v + 1) ** max(n_ctx - 1, 0) if lm_table is not None else 1

    # hoist the per-frame token pruning out of the scan: one batched top_k
    # over all frames beats T tiny top_k ops inside the sequential loop
    if k_c < v:
        all_top_lp, all_top_ci = jax.lax.top_k(log_probs[:, :, :v], k_c)
    else:
        all_top_lp = log_probs[:, :, :v]
        all_top_ci = jnp.broadcast_to(jnp.arange(v)[None, None],
                                      (bsz, t_max, v))

    def step(st, t):
        hashes = st[..., C_H1]
        hashes2 = st[..., C_H2]
        p_b = u2f(st[..., C_PB])
        p_nb = u2f(st[..., C_PNB])
        lm_score = u2f(st[..., C_LM])
        last = st[..., C_LAST].astype(jnp.int32) - 1
        lm_row = st[..., C_ROW].astype(jnp.int32)
        plen = st[..., C_PLEN].astype(jnp.int32)
        wh1 = st[..., C_WH1]
        wh2 = st[..., C_WH2]
        ctx = [(st[..., C_CTX + 2 * j], st[..., C_CTX + 2 * j + 1])
               for j in range(n_ctxw)]
        bos = [u2f(st[..., C_BO + j]) for j in range(n_bo)]
        c1h1, c1h2 = ctx[0]

        lp = log_probs[:, t]                                # (B, V+1)
        p_tot = _logsumexp2(p_b, p_nb)                      # (B, W)

        # ---- "stay" candidates: one per beam (same prefix) ----
        lp_blank = lp[:, blank][:, None]                    # (B, 1)
        stay_pb = p_tot + lp_blank
        # lp[b, last[b, w]] as a one-hot contraction: in-scan gathers
        # lower to serial windowed loops on TPU (~15 us each), the
        # (B, W, V+1) select+reduce fuses into a couple of VPU passes
        last_oh = last[:, :, None] == jnp.arange(v1)[None, None, :]
        lp_last = jnp.sum(jnp.where(last_oh, lp[:, None, :], 0.0), axis=-1)
        stay_pnb = jnp.where(last >= 0, p_nb + lp_last, NEG)

        # ---- "extend" candidates: (B, W, K) over (pruned) tokens ----
        top_lp = all_top_lp[:, t]                           # (B, K)
        top_ci = all_top_ci[:, t]
        lp_c = top_lp[:, None, :]                           # (B, 1, K)
        char_ids = jnp.broadcast_to(top_ci[:, None, :], (bsz, w, k_c))
        is_rep = last[:, :, None] == char_ids
        base = jnp.where(is_rep, p_b[:, :, None], p_tot[:, :, None])
        ext_pnb = base + lp_c                               # (B, W, K)
        cplus3 = (char_ids + 1).astype(jnp.uint32)
        if normalize:
            # canonical-text hashing: fold a single separator before a
            # char that starts a new word; a space never changes the hash
            has_words = ((c1h1 != 0) | (c1h2 != 0))[:, :, None]
            need_sep = (wh1 == 0)[:, :, None] & has_words
            sp_u = jnp.uint32(space + 1)
            base1 = jnp.where(need_sep,
                              hashes[:, :, None] * _HASH_P1 + sp_u,
                              hashes[:, :, None])
            base2 = jnp.where(need_sep,
                              hashes2[:, :, None] * _HASH_P2 + sp_u,
                              hashes2[:, :, None])
            is_space_c = char_ids == space
            ext_hash = jnp.where(is_space_c, hashes[:, :, None],
                                 base1 * _HASH_P1 + cplus3)
            ext_hash2 = jnp.where(is_space_c, hashes2[:, :, None],
                                  base2 * _HASH_P2 + cplus3)
        else:
            ext_hash = hashes[:, :, None] * _HASH_P1 + cplus3
            ext_hash2 = hashes2[:, :, None] * _HASH_P2 + cplus3
        ext_lm = jnp.broadcast_to(lm_score[:, :, None],
                                  ext_pnb.shape)            # (B, W, K)
        if lm_table is not None:
            lm_all = lm_table[lm_row]                       # (B, W, V)
            lm_add = alpha * jnp.take_along_axis(lm_all, char_ids,
                                                 axis=2) + beta
            ext_lm = ext_lm + lm_add
        if word_lm is not None:
            # completed-word bonus: applies only to the space extension of
            # beams holding a non-empty partial word — one backoff-chain
            # lookup per BEAM per step (not per candidate)
            raw_sw, new_bos_vals = _word_lm_score(
                word_lm, wlm_probes, ctx, wh1, wh2, bos, dense=lm_dense)
            sw = jnp.where(wh1 != 0, alpha * raw_sw + beta, 0.0)  # (B, W)
            ext_lm = ext_lm + jnp.where(char_ids == space,
                                        sw[:, :, None], 0.0)
        else:
            new_bos_vals = []

        # ---- merge: stay(j) absorbs extension(i,c) iff equal prefix ----
        # (the ONLY possible merge: beams are distinct, so stay==stay and
        # ext==ext cannot collide; equality via the 64-bit composite hash,
        # plus the last-emitted char under canonical hashing — the hash of
        # "c" and "c " coincide and only last_char separates them)
        eqm = (hashes[:, :, None, None] == ext_hash[:, None]) \
            & (hashes2[:, :, None, None] == ext_hash2[:, None])  # (B,W,W,K)
        if normalize:
            eqm = eqm & (last[:, :, None, None] == char_ids[:, None])
        ext_masked = jnp.where(eqm, ext_pnb[:, None], NEG)   # (B, W, W, K)
        mmax = jnp.maximum(stay_pnb,
                           jnp.max(ext_masked, axis=(2, 3)))  # (B, W)
        msafe = jnp.where(mmax <= NEG / 2, 0.0, mmax)
        msum = jnp.exp(jnp.maximum(stay_pnb - msafe, NEG)) + jnp.sum(
            jnp.exp(jnp.maximum(ext_masked - msafe[:, :, None, None], NEG)),
            axis=(2, 3))
        stay_pnb_m = jnp.where(mmax <= NEG / 2, NEG,
                               msafe + jnp.log(jnp.maximum(msum, 1e-38)))
        ext_alive = ~jnp.any(eqm, axis=1)                    # (B, W, K)
        ext_pnb = jnp.where(ext_alive, ext_pnb, NEG)

        # ---- rank all W*(K+1) candidates, keep top W ----
        stay_total = _logsumexp2(stay_pb, stay_pnb_m) + lm_score
        ext_total = ext_pnb + ext_lm
        totals = jnp.concatenate(
            [stay_total, ext_total.reshape(bsz, w * k_c)], axis=1)
        top_val, top_idx = jax.lax.top_k(totals, w)          # (B, W)

        is_stay = top_idx < w
        stay_idx = jnp.minimum(top_idx, w - 1)               # valid when stay
        ext_idx = jnp.maximum(top_idx - w, 0)                # valid when ext
        sel_parent = jnp.where(is_stay, stay_idx, ext_idx // k_c)

        # ---- selection ----
        # ONE state gather: the parent's full packed state, plus the
        # per-beam stay values and word-LM payloads appended as extra
        # columns. Extension payloads (char/pnb/lm) are RECOMPUTED from
        # the selected parent columns + the per-frame top-K arrays instead
        # of materializing and gathering a (B, W*K, 3) candidate pack —
        # in-scan gathers and their layout copies cost far more than the
        # few elementwise ops of the recompute.
        extra = [f2u(stay_pb), f2u(stay_pnb_m)] \
            + [f2u(b) for b in new_bos_vals] \
            + ([f2u(sw)] if word_lm is not None else [])
        par_pack = jnp.concatenate(
            [st, jnp.stack(extra, axis=-1)], axis=-1)
        sel = jnp.take_along_axis(par_pack, sel_parent[:, :, None], axis=1)
        P_BPB, P_BPNB = n_cols, n_cols + 1
        P_NEWBO = n_cols + 2              # n_bo new backoff-carry columns
        P_SW = P_NEWBO + n_bo

        c_idx = ext_idx % k_c                                # (B, W)
        c_oh = c_idx[:, :, None] == jnp.arange(k_c)[None, None, :]
        sel_char_raw = jnp.sum(
            jnp.where(c_oh, top_ci[:, None, :], 0), axis=-1)
        sel_char = jnp.where(is_stay, -1, sel_char_raw)
        sel_lp_c = jnp.sum(jnp.where(c_oh, top_lp[:, None, :], 0.0), axis=-1)
        sel_p_b = u2f(sel[..., C_PB])
        sel_p_tot = _logsumexp2(sel_p_b, u2f(sel[..., C_PNB]))
        sel_is_rep = (sel[..., C_LAST].astype(jnp.int32) - 1) == sel_char
        sel_ext_pnb = jnp.where(sel_is_rep, sel_p_b, sel_p_tot) + sel_lp_c
        if lm_table is not None:
            # char-LM: the per-candidate LM add depends on (parent row,
            # char), so the packed-candidate gather stays
            ext_pack = jnp.stack(
                [f2u(ext_lm.reshape(bsz, w * k_c))], axis=-1)
            sel_ext_lm = u2f(jnp.take_along_axis(
                ext_pack, ext_idx[:, :, None], axis=1)[..., 0])
        elif word_lm is not None:
            sel_ext_lm = u2f(sel[..., C_LM]) + jnp.where(
                sel_char == space, u2f(sel[..., P_SW]), 0.0)
        else:
            sel_ext_lm = u2f(sel[..., C_LM])

        new_pb = jnp.where(is_stay, u2f(sel[..., P_BPB]), NEG)
        new_pnb = jnp.where(is_stay, u2f(sel[..., P_BPNB]), sel_ext_pnb)
        new_lm = jnp.where(is_stay, u2f(sel[..., C_LM]), sel_ext_lm)
        cplus = (sel_char + 1).astype(jnp.uint32)
        p_h1 = sel[..., C_H1]
        p_h2 = sel[..., C_H2]
        p_wh1 = sel[..., C_WH1]
        p_wh2 = sel[..., C_WH2]
        p_ctx = [(sel[..., C_CTX + 2 * j], sel[..., C_CTX + 2 * j + 1])
                 for j in range(n_ctxw)]
        p_c1h1, p_c1h2 = p_ctx[0]
        if normalize:
            sel_sep = (p_wh1 == 0) & ((p_c1h1 != 0) | (p_c1h2 != 0))
            sp_u = jnp.uint32(space + 1)
            b1 = jnp.where(sel_sep, p_h1 * _HASH_P1 + sp_u, p_h1)
            b2 = jnp.where(sel_sep, p_h2 * _HASH_P2 + sp_u, p_h2)
            sel_space = sel_char == space
            new_hash = jnp.where(is_stay | sel_space, p_h1,
                                 b1 * _HASH_P1 + cplus)
            new_hash2 = jnp.where(is_stay | sel_space, p_h2,
                                  b2 * _HASH_P2 + cplus)
        else:
            new_hash = jnp.where(is_stay, p_h1, p_h1 * _HASH_P1 + cplus)
            new_hash2 = jnp.where(is_stay, p_h2, p_h2 * _HASH_P2 + cplus)
        p_row = sel[..., C_ROW].astype(jnp.int32)
        if lm_table is not None:
            ext_row = (p_row % rows_mod) * (v + 1) + (sel_char + 1)
            new_row = jnp.where(is_stay, p_row, ext_row)
        else:
            new_row = p_row

        # word-LM state transition (recomputed from parent state + char —
        # cheaper than materializing (B, W, K) candidate word states)
        is_space_ext = (~is_stay) & (sel_char == space)
        shift = is_space_ext & (p_wh1 != 0)
        new_wh1 = jnp.where(is_stay | is_space_ext,
                            jnp.where(is_space_ext, jnp.uint32(0), p_wh1),
                            p_wh1 * _HASH_P1 + cplus)
        new_wh2 = jnp.where(is_stay | is_space_ext,
                            jnp.where(is_space_ext, jnp.uint32(0), p_wh2),
                            p_wh2 * _HASH_P2 + cplus)
        # completed-word context shift: c_1 <- w, c_j <- c_{j-1}
        new_ctx = [(jnp.where(shift, p_wh1, p_c1h1),
                    jnp.where(shift, p_wh2, p_c1h2))]
        for j in range(1, n_ctxw):
            new_ctx.append((jnp.where(shift, p_ctx[j - 1][0], p_ctx[j][0]),
                            jnp.where(shift, p_ctx[j - 1][1],
                                      p_ctx[j][1])))
        # on word completion the new context's backoff weights are the
        # completed word's own chain rows, already fetched above
        new_bo_cols = [jnp.where(shift, sel[..., P_NEWBO + j],
                                 sel[..., C_BO + j]) for j in range(n_bo)]

        # dead slots (filled from NEG-score padding) get poisoned hashes so
        # they can never absorb a live extension's probability mass
        dead = top_val <= NEG / 2
        new_hash = jnp.where(dead, slot_poison[None], new_hash)
        new_hash2 = jnp.where(dead, jnp.uint32(0xFFFFFFFF), new_hash2)
        new_pb = jnp.where(dead, NEG, new_pb)
        new_pnb = jnp.where(dead, NEG, new_pnb)

        # prefixes are NOT materialized in the scan (a (B, W, L) gather +
        # rewrite per step dominated the loop's HBM traffic); each step
        # only records (parent, char) backpointers and the best path is
        # reconstructed once after the scan by pointer doubling
        parent_len = sel[..., C_PLEN].astype(jnp.int32)
        parent_last = sel[..., C_LAST].astype(jnp.int32) - 1
        is_ext = sel_char >= 0
        new_plen = parent_len + is_ext.astype(jnp.int32)
        new_last = jnp.where(is_ext, sel_char, parent_last)

        # new_bo_cols selected between u32 columns, already bit patterns
        new_st = jnp.stack(
            [new_hash, new_hash2, f2u(new_pb), f2u(new_pnb), f2u(new_lm),
             (new_last + 1).astype(jnp.uint32), new_row.astype(jnp.uint32),
             new_plen.astype(jnp.uint32), new_wh1, new_wh2]
            + [h for pair in new_ctx for h in pair]
            + new_bo_cols, axis=-1)

        # freeze finished utterances; frozen steps record identity
        # backpointers so the backtrace passes through them unchanged
        act2 = (t < lengths)[:, None]
        bp_parent = jnp.where(act2, sel_parent,
                              jnp.arange(w, dtype=jnp.int32)[None])
        bp_char = jnp.where(act2, sel_char, -1)
        active = act2[:, :, None]
        return jnp.where(active, new_st, st), (bp_parent, bp_char)

    st, (parents, chars) = jax.lax.scan(step, st, jnp.arange(t_max))
    if return_raw:
        return st, parents, chars
    # trailing partial word scored like the oracle's best()
    total = packed_beam_totals(st, word_lm=word_lm, alpha=alpha, beta=beta,
                               wlm_probes=wlm_probes)
    best = jnp.argmax(total, axis=1)                          # (B,)
    return reconstruct_best_path(parents, chars, best, w=w, bsz=bsz,
                                 t_max=t_max, l_max=l_max)


def reconstruct_best_path(parents, chars, best, *, w: int, bsz: int,
                          t_max: int, l_max: int):
    """Best-path reconstruction by a reverse scan over backpointers.

    parents[t][j] maps a beam index after step t to its index before
    step t; the scan carries ONLY the best path's index (B,) backwards,
    selecting each step's parent/char with a one-hot (B, W) contraction
    (in-scan gathers lower to serial windowed loops on TPU; the one-hot
    select+reduce is a couple of VPU passes). This replaced a pointer-
    doubling associative_scan that composed FULL W-wide maps in O(log T)
    passes of (T, B, W) gathers — measured 274.7 us/step at W=104
    (B=128, T=750), i.e. 76% of the whole wide-beam decode; the reverse
    scan is ~2 us/step of scan overhead. Shared by the XLA scan path and
    the fused Pallas kernel (ops/pallas_beam.py)."""
    iota_w = jnp.arange(w, dtype=parents.dtype)[None, :]      # (1, W)

    def step(j, pc):
        p_t, c_t = pc                                         # (B, W)
        oh = iota_w == j[:, None]                             # (B, W)
        char = jnp.sum(jnp.where(oh, c_t, 0), axis=1)         # (B,)
        j_prev = jnp.sum(jnp.where(oh, p_t, 0), axis=1)
        return j_prev, char

    # j_after[T-1] = best; j_after[t-1] = parents[t][j_after[t]];
    # reverse scan emits path_chars[t] = chars[t][j_after[t]] in order
    _, path_chars = jax.lax.scan(step, best.astype(parents.dtype),
                                 (parents, chars), reverse=True)  # (T, B)

    # compact the emitted chars (char >= 0) to the front, in time order
    cp = path_chars.T                                         # (B, T)
    vd = cp >= 0
    t_idx = jnp.arange(t_max)
    order = jnp.argsort(jnp.where(vd, t_idx[None], t_max + t_idx[None]),
                        axis=1)
    take = order[:, :l_max] if l_max < t_max else jnp.pad(
        order, ((0, 0), (0, l_max - t_max)), mode="edge")
    best_prefix = jnp.take_along_axis(
        jnp.where(vd, cp, 0), jnp.minimum(take, t_max - 1), axis=1)
    best_len = jnp.minimum(vd.sum(axis=1), l_max).astype(jnp.int32)
    best_prefix = jnp.where(
        jnp.arange(l_max)[None] < best_len[:, None], best_prefix, 0)
    return best_prefix, best_len


def device_beam_transcripts(log_probs, lengths, labels, *, impl="auto",
                            **kwargs):
    """Convenience: run the device beam search and render texts on host.

    impl="auto" routes eligible calls (canonical identity, no char-LM
    table, pruned expansion, domain-sized word LM) to the FUSED Pallas
    kernel on accelerator backends (ops/pallas_beam.py, ~1.9x the XLA
    scan); "xla"/"pallas" force a path. Outputs are identical either way
    (asserted by tests/test_pallas_beam.py).

    Under canonical (space-normalized) beam identity the surviving
    representative's recorded char path may carry redundant spaces that
    its identity ignores; rendering collapses them to match the oracle.
    """
    import numpy as np

    word_lm = kwargs.get("word_lm")
    eligible = (kwargs.get("lm_table") is None
                and kwargs.get("space", -1) >= 0
                and kwargs.get("cutoff_top_n", 0) > 0
                # blocked merge + threshold select keep the kernel fast
                # through the reference deploy widths (50/100); very wide
                # beams route to the XLA scan
                and kwargs.get("beam_width", 16) <= PALLAS_MAX_BEAM_WIDTH
                and (word_lm is None
                     or int(word_lm.packed.shape[0]) <= PALLAS_WLM_MAX_ROWS))
    use_pallas = impl == "pallas" or (
        impl == "auto" and eligible and jax.default_backend() != "cpu")
    if use_pallas:
        from vietasr_tpu.ops.pallas_beam import (dense_lm_from_tables,
                                                 pallas_beam_search)

        pk = {k: v for k, v in kwargs.items()
              if k in ("beam_width", "cutoff_top_n", "alpha", "beta",
                       "space", "max_len")}
        if word_lm is not None:
            unk = float(np.asarray(word_lm.unk_logp))
            pk["dense_lm"] = dense_lm_from_tables(word_lm, unk)
            pk["unk_logp"] = unk
        ids, lens = pallas_beam_search(
            jnp.asarray(log_probs), jnp.asarray(lengths),
            blank=len(labels),
            interpret=jax.default_backend() == "cpu", **pk)
    else:
        ids, lens = device_beam_search(
            jnp.asarray(log_probs), jnp.asarray(lengths),
            blank=len(labels), **kwargs)
    ids = np.asarray(ids)
    lens = np.asarray(lens)
    texts = ["".join(labels[i] for i in ids[b, : lens[b]])
             for b in range(ids.shape[0])]
    if kwargs.get("space", -1) >= 0 and kwargs.get("lm_table") is None:
        texts = [" ".join(t.split()) for t in texts]
    return texts
