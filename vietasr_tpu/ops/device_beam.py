"""Fully on-device batched CTC beam search with dense char-LM fusion.

The reference's beam search is CPU-pinned, batch-1, with a device->host
transfer of the whole posterior (beam_search_decoder.py:75-102). This one
runs under jit on the TPU, batched over utterances, with NO host round
trip:

- fixed beam width W; every step expands all W*(V+1) candidates as dense
  arrays (MXU/VPU-friendly, no dynamic shapes);
- prefix merging (the part SURVEY.md §7 flags as awkward in SIMD) is done
  with rolling-hash equality: sort candidates by a 64-bit-ish rolling hash
  of the prefix, logsumexp-merge equal-hash runs with segment ops, then
  top-W;
- char-level n-gram LM shallow fusion reads a dense backoff table
  (ops/lm.py:char_lm_table) with one gather per step; the context rolls
  forward in O(1) per beam.

Returns the top beam's label ids per utterance; the host only renders text.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e30
_HASH_P = jnp.uint32(1000003)


def _logsumexp2(a, b):
    m = jnp.maximum(a, b)
    safe = jnp.where(m <= NEG / 2, 0.0, m)
    out = safe + jnp.log(
        jnp.exp(jnp.maximum(a - safe, NEG)) + jnp.exp(jnp.maximum(b - safe, NEG)))
    return jnp.where(m <= NEG / 2, NEG, out)


@partial(jax.jit, static_argnames=("beam_width", "blank", "max_len",
                                   "n_ctx", "alpha", "beta",
                                   "cutoff_top_n"))
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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, V+1) log-probs -> (prefixes (B, L), prefix_lens (B,)).

    lm_table: ((V+1)^n_ctx, V) char-LM table or None; alpha/beta are the
    shallow-fusion weight and per-char bonus. cutoff_top_n > 0 restricts
    expansion to the top-N tokens per frame (the reference's vocabulary
    pruning, beam_search_decoder.py:34-36) — it shrinks the per-step sort
    from W*(V+1) to W*(N+1) candidates, the dominant cost on TPU.
    """
    bsz, t_max, v1 = log_probs.shape
    v = v1 - 1
    w = beam_width
    l_max = max_len or t_max
    k_c = v if cutoff_top_n <= 0 or cutoff_top_n >= v else cutoff_top_n
    n_cand = w * (k_c + 1)

    # beam state (B, W, ...)
    prefixes = jnp.zeros((bsz, w, l_max), jnp.int32)
    plen = jnp.zeros((bsz, w), jnp.int32)
    last = jnp.full((bsz, w), -1, jnp.int32)
    p_b = jnp.full((bsz, w), NEG, jnp.float32).at[:, 0].set(0.0)
    p_nb = jnp.full((bsz, w), NEG, jnp.float32)
    hashes = jnp.zeros((bsz, w), jnp.uint32)
    lm_row = jnp.zeros((bsz, w), jnp.int32)
    lm_score = jnp.zeros((bsz, w), jnp.float32)

    rows_mod = (v + 1) ** max(n_ctx - 1, 0) if lm_table is not None else 1

    def step(state, t):
        (prefixes, plen, last, p_b, p_nb, hashes, lm_row, lm_score) = state
        lp = log_probs[:, t]                                # (B, V+1)
        p_tot = _logsumexp2(p_b, p_nb)                      # (B, W)

        # ---- "stay" candidates: one per beam (same prefix) ----
        lp_blank = lp[:, blank][:, None]                    # (B, 1)
        stay_pb = p_tot + lp_blank
        lp_last = jnp.take_along_axis(
            lp, jnp.maximum(last, 0), axis=1)               # (B, W)
        stay_pnb = jnp.where(last >= 0, p_nb + lp_last, NEG)

        # ---- "extend" candidates: (B, W, K) over (pruned) tokens ----
        if k_c < v:
            top_lp, top_ci = jax.lax.top_k(lp[:, :v], k_c)  # (B, K)
        else:
            top_lp = lp[:, :v]
            top_ci = jnp.broadcast_to(jnp.arange(v)[None], (bsz, v))
        lp_c = top_lp[:, None, :]                           # (B, 1, K)
        char_ids = jnp.broadcast_to(top_ci[:, None, :], (bsz, w, k_c))
        is_rep = last[:, :, None] == char_ids
        base = jnp.where(is_rep, p_b[:, :, None], p_tot[:, :, None])
        ext_pnb = base + lp_c                               # (B, W, K)
        ext_hash = hashes[:, :, None] * _HASH_P \
            + (char_ids + 1).astype(jnp.uint32)
        if lm_table is not None:
            lm_all = lm_table[lm_row]                       # (B, W, V)
            lm_add = alpha * jnp.take_along_axis(lm_all, char_ids,
                                                 axis=2) + beta
            ext_lm = lm_score[:, :, None] + lm_add
            ext_row = (lm_row % rows_mod)[:, :, None] * (v + 1) \
                + (char_ids + 1)
        else:
            ext_lm = jnp.broadcast_to(lm_score[:, :, None], ext_pnb.shape)
            ext_row = jnp.zeros_like(ext_pnb, dtype=jnp.int32)

        # ---- flatten candidates: stay (W) then extend (W*K) ----
        def flat(stay, ext):
            return jnp.concatenate([stay, ext.reshape(bsz, w * k_c)], axis=1)

        c_pb = flat(stay_pb, jnp.full_like(ext_pnb, NEG))
        c_pnb = flat(stay_pnb, ext_pnb)
        c_hash = flat(hashes, ext_hash)
        c_lm = flat(lm_score, ext_lm)
        c_row = flat(lm_row, ext_row)
        c_parent = flat(jnp.broadcast_to(jnp.arange(w)[None], (bsz, w)),
                        jnp.broadcast_to(jnp.arange(w)[None, :, None],
                                         (bsz, w, k_c)).reshape(bsz, w * k_c))
        c_char = flat(jnp.full((bsz, w), -1, jnp.int32),
                      char_ids.reshape(bsz, w * k_c))

        # ---- merge candidates with equal prefix hash ----
        # one multi-operand stable sort carries all payloads with the keys
        # (cheaper than argsort + 7 gathers)
        (s_hash, s_pb, s_pnb, s_lm, s_row, s_parent, s_char) = jax.lax.sort(
            (c_hash, c_pb, c_pnb, c_lm, c_row, c_parent, c_char),
            dimension=1, num_keys=1, is_stable=True)

        first = jnp.concatenate(
            [jnp.ones((bsz, 1), bool), s_hash[:, 1:] != s_hash[:, :-1]],
            axis=1)
        seg = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1   # (B, N)

        def seg_lse(vals):
            # segment logsumexp over runs of equal hash
            mx = jax.vmap(lambda s, x: jax.ops.segment_max(
                x, s, num_segments=n_cand))(seg, vals)
            mx_b = jnp.take_along_axis(mx, seg, axis=1)
            mx_safe = jnp.where(mx_b <= NEG / 2, 0.0, mx_b)
            ex = jnp.exp(jnp.maximum(vals - mx_safe, NEG))
            sm = jax.vmap(lambda s, x: jax.ops.segment_sum(
                x, s, num_segments=n_cand))(seg, ex)
            out = jnp.where(mx <= NEG / 2, NEG,
                            jnp.where(mx <= NEG / 2, 0.0, mx)
                            + jnp.log(jnp.maximum(sm, 1e-38)))
            return out                                       # (B, n_cand) per segment id

        m_pb = seg_lse(s_pb)
        m_pnb = seg_lse(s_pnb)
        # representative (first of each run) carries parent/char/lm state
        rep_total = jnp.where(
            first,
            jnp.take_along_axis(_logsumexp2(m_pb, m_pnb), seg,
                                axis=1) + s_lm,
            NEG)

        top_val, top_idx = jax.lax.top_k(rep_total, w)        # (B, W)
        g = lambda a: jnp.take_along_axis(a, top_idx, axis=1)
        sel_seg = g(seg)
        # only segment REPRESENTATIVES carry live scores; padding slots
        # (top_k ties on NEG) must stay dead or duplicated beams would
        # double-count probability on the next merge
        sel_first = g(first)
        new_pb = jnp.where(sel_first,
                           jnp.take_along_axis(m_pb, sel_seg, axis=1), NEG)
        new_pnb = jnp.where(sel_first,
                            jnp.take_along_axis(m_pnb, sel_seg, axis=1), NEG)
        sel_parent = g(s_parent)
        sel_char = g(s_char)
        new_lm = g(s_lm)
        new_row = g(s_row)
        new_hash = g(s_hash)

        # ---- rebuild prefixes ----
        par = lambda a: jnp.take_along_axis(
            a, sel_parent, axis=1)
        parent_prefix = jnp.take_along_axis(
            prefixes, sel_parent[:, :, None], axis=1)         # (B, W, L)
        parent_len = par(plen)
        parent_last = par(last)
        is_ext = sel_char >= 0
        app = jax.nn.one_hot(jnp.clip(parent_len, 0, l_max - 1), l_max,
                             dtype=jnp.int32)                 # (B, W, L)
        new_prefix = jnp.where(
            (is_ext[:, :, None]) & (app > 0),
            sel_char[:, :, None], parent_prefix)
        new_plen = parent_len + is_ext.astype(jnp.int32)
        new_last = jnp.where(is_ext, sel_char, parent_last)

        # freeze finished utterances
        active = (t < lengths)[:, None]
        keep = lambda n, o: jnp.where(active, n, o)
        keep3 = lambda n, o: jnp.where(active[:, :, None], n, o)
        return (keep3(new_prefix, prefixes), keep(new_plen, plen),
                keep(new_last, last), keep(new_pb, p_b),
                keep(new_pnb, p_nb), keep(new_hash, hashes),
                keep(new_row, lm_row), keep(new_lm, lm_score)), None

    state = (prefixes, plen, last, p_b, p_nb, hashes, lm_row, lm_score)
    state, _ = jax.lax.scan(step, state, jnp.arange(t_max))
    prefixes, plen, last, p_b, p_nb, hashes, lm_row, lm_score = state

    total = _logsumexp2(p_b, p_nb) + lm_score
    best = jnp.argmax(total, axis=1)                          # (B,)
    best_prefix = jnp.take_along_axis(
        prefixes, best[:, None, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(plen, best[:, None], axis=1)[:, 0]
    return best_prefix, best_len


def device_beam_transcripts(log_probs, lengths, labels, **kwargs):
    """Convenience: run the device beam search and render texts on host."""
    import numpy as np

    ids, lens = device_beam_search(
        jnp.asarray(log_probs), jnp.asarray(lengths),
        blank=len(labels), **kwargs)
    ids = np.asarray(ids)
    lens = np.asarray(lens)
    return ["".join(labels[i] for i in ids[b, : lens[b]])
            for b in range(ids.shape[0])]
