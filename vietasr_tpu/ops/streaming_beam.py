"""Batched ON-DEVICE streaming CTC beam search.

The reference's quality serving tier decodes every web request with a
W=50 LM beam on the host, batch-1 (app.py:27, beam_search_decoder.py:
75-102). Round 3's pool kept that shape — one pure-Python
StreamingPrefixBeam per slot (ops/beam_search.py:82-160) — and beam
serving collapsed to ~7 real-time sessions/chip while the greedy tier
ran 600+. This module moves the beam itself onto the TPU:

- the packed per-beam state of ops/device_beam.py (hashes, p_b/p_nb,
  LM carry, word-LM context) is CARRIED ACROSS CHUNKS in device arrays,
  one (B, W, n_cols) tensor for the whole pool;
- each pool tick runs ONE jitted chunk step for all slots: the same
  scan body as the offline search over the chunk's frames
  (device_beam_search(carry_state=..., return_raw=True)), then an
  incremental traceback that appends the chunk's emitted chars to a
  bounded on-device transcript buffer (B, W, L);
- the traceback reuses the offline pointer-doubling composition
  (reconstruct_best_path's associative_scan) but applied to ALL W beams:
  suffix[t, b, j] is the chunk-local ancestor of final beam j after
  step t, so each beam's appended chars and its chunk-start parent come
  out of two gathers — the transcript buffers then reorder in one
  take_along_axis (new_buf[j] = old_buf[parent(j)] ++ appended[j]);
- per-slot lifecycle is a masked reset (open) and a masked commit
  (un-fed slots keep state), both inside the same jit as the encoder
  step, so a 64-slot tick stays a single TPU dispatch.

Semantics match the offline device beam exactly (same scan body, same
state); chunked-vs-whole equality is asserted in
tests/test_streaming_beam.py. Transcripts can only diverge from the
offline search if a beam's true prefix exceeds `max_chars` (buffer
clip, documented).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vietasr_tpu.ops.device_beam import (WordLMTables, device_beam_search,
                                         init_packed_state,
                                         packed_beam_totals)


class BeamCarry(NamedTuple):
    """Pool-wide streaming beam state (all device arrays)."""

    st: jnp.ndarray      # (B, W, n_cols) uint32 packed beam state
    buf: jnp.ndarray     # (B, W, L) int32 per-beam transcript char ids
    lens: jnp.ndarray    # (B, W) int32 chars valid in buf
    skip: jnp.ndarray    # (B,) int32 warmup frames left to neutralize


class DeviceStreamingBeam:
    """Factory for the pool's on-device beam: init / chunk step / reset.

    All methods are pure jit-friendly functions of their inputs; the
    caller (serve/streams.py StreamPool) owns the carry and composes
    `chunk` with the encoder step inside one jitted pool tick."""

    def __init__(self, *, blank: int, beam_width: int = 16,
                 space: int = -1, cutoff_top_n: int = 8,
                 word_lm: Optional[WordLMTables] = None,
                 alpha: float = 0.5, beta: float = 1.5,
                 wlm_probes: int = 8, max_chars: int = 512,
                 skip_frames: int = 0):
        self.blank = blank
        self.w = beam_width
        self.space = space
        self.cutoff_top_n = cutoff_top_n
        self.word_lm = word_lm
        self.alpha = alpha
        self.beta = beta
        self.wlm_probes = wlm_probes
        self.max_chars = max_chars
        # encoder warmup lookahead: the first `skip_frames` output frames
        # of a fresh stream come from zero-padded context; they are
        # neutralized to certain-blank on device (the greedy tier drops
        # them on host, serve/streams.py) — a certain blank adds log 1
        # and emits nothing, so scores and transcripts are unaffected
        self.skip_frames = skip_frames

    def init(self, bsz: int) -> BeamCarry:
        return BeamCarry(
            st=init_packed_state(bsz, self.w, self.word_lm),
            buf=jnp.zeros((bsz, self.w, self.max_chars), jnp.int32),
            lens=jnp.zeros((bsz, self.w), jnp.int32),
            skip=jnp.full((bsz,), self.skip_frames, jnp.int32))

    def reset_rows(self, carry: BeamCarry, mask: jnp.ndarray) -> BeamCarry:
        """Re-initialize the slots where mask (B,) is True."""
        fresh = self.init(carry.st.shape[0])
        m3 = mask[:, None, None]
        return BeamCarry(st=jnp.where(m3, fresh.st, carry.st),
                         buf=jnp.where(m3, fresh.buf, carry.buf),
                         lens=jnp.where(mask[:, None], fresh.lens,
                                        carry.lens),
                         skip=jnp.where(mask, fresh.skip, carry.skip))

    def chunk(self, carry: BeamCarry, log_probs: jnp.ndarray
              ) -> Tuple[BeamCarry, jnp.ndarray, jnp.ndarray]:
        """Advance every slot's beam over one chunk of (B, T_c, V+1)
        log-probs. Returns (carry', best_ids (B, L), best_len (B,)) —
        the current best hypothesis per slot, for incremental partials."""
        bsz, t_c, v1 = log_probs.shape
        w = self.w
        if self.skip_frames:
            # neutralize remaining warmup frames to certain-blank
            warm = jnp.arange(t_c)[None, :] < carry.skip[:, None]
            blank_row = jnp.full((v1,), -1e30,
                                 log_probs.dtype).at[self.blank].set(0.0)
            log_probs = jnp.where(warm[:, :, None], blank_row[None, None],
                                  log_probs)
        new_skip = jnp.maximum(carry.skip - t_c, 0)
        st, parents, chars = device_beam_search(
            log_probs, jnp.full((bsz,), t_c, jnp.int32),
            beam_width=w, blank=self.blank, space=self.space,
            cutoff_top_n=self.cutoff_top_n, word_lm=self.word_lm,
            alpha=self.alpha, beta=self.beta, wlm_probes=self.wlm_probes,
            carry_state=carry.st, return_raw=True)

        # chunk-local traceback for ALL W final beams (pointer doubling,
        # as reconstruct_best_path): suffix[t, b, j] = ancestor of final
        # beam j after step t
        identity = jnp.broadcast_to(
            jnp.arange(w, dtype=parents.dtype)[None, None], (1, bsz, w))
        cmaps = jnp.concatenate([parents[1:], identity], axis=0)

        def compose(a, b):
            return jnp.take_along_axis(b, a, axis=-1)

        suffix = jax.lax.associative_scan(compose, cmaps, reverse=True,
                                          axis=0)             # (T_c, B, W)
        path_chars = jnp.take_along_axis(chars, suffix, axis=2)
        start_parent = jnp.take_along_axis(parents[0], suffix[0],
                                           axis=-1)           # (B, W)

        # compact the chunk's emitted chars (char >= 0) to the front, in
        # time order, per final beam
        pc = jnp.transpose(path_chars, (1, 2, 0))             # (B, W, T_c)
        vd = pc >= 0
        t_idx = jnp.arange(t_c)
        order = jnp.argsort(jnp.where(vd, t_idx[None, None],
                                      t_c + t_idx[None, None]), axis=2)
        appended = jnp.take_along_axis(jnp.where(vd, pc, 0), order, axis=2)
        n_app = vd.sum(axis=2).astype(jnp.int32)              # (B, W)

        # transcript buffers: new_buf[j] = old_buf[parent(j)] ++ appended
        parent_buf = jnp.take_along_axis(
            carry.buf, start_parent[:, :, None], axis=1)      # (B, W, L)
        parent_len = jnp.take_along_axis(carry.lens, start_parent, axis=1)
        l_idx = jnp.arange(self.max_chars)[None, None]        # (1, 1, L)
        app_pos = l_idx - parent_len[:, :, None]
        app_g = jnp.take_along_axis(
            appended, jnp.clip(app_pos, 0, t_c - 1), axis=2)
        new_buf = jnp.where(
            l_idx < parent_len[:, :, None], parent_buf,
            jnp.where(app_pos < n_app[:, :, None], app_g, 0))
        new_lens = jnp.minimum(parent_len + n_app, self.max_chars)

        carry2 = BeamCarry(st=st, buf=new_buf, lens=new_lens,
                           skip=new_skip)
        total = packed_beam_totals(st, word_lm=self.word_lm,
                                   alpha=self.alpha, beta=self.beta,
                                   wlm_probes=self.wlm_probes)
        best = jnp.argmax(total, axis=1)                      # (B,)
        best_ids = jnp.take_along_axis(
            new_buf, best[:, None, None], axis=1)[:, 0]       # (B, L)
        best_len = jnp.take_along_axis(new_lens, best[:, None],
                                       axis=1)[:, 0]
        return carry2, best_ids, best_len

    def render(self, labels, ids, length) -> str:
        """Host-side text render of one slot's best hypothesis (canonical
        identity ignores leading/trailing/duplicate spaces)."""
        text = "".join(labels[i] for i in ids[:length])
        if self.space >= 0:
            text = " ".join(text.split())
        return text
