"""Multi-stream online serving: N concurrent real-time streams per chip.

`OnlineTranscriber._step` is a pure function of (state, chunk), so N
streams batch by simply vmapping it: states stack into batched pytrees and
one TPU dispatch advances every live stream by one chunk. A slot manager
assigns websocket sessions to slots; idle slots are fed silence (their
outputs are ignored) so shapes stay static.

Incremental text: each slot carries a greedy-collapse state (last emitted
argmax id) so partial transcripts stream out as frames are emitted.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vietasr_tpu.streaming_online import OnlineTranscriber


class IncrementalGreedy:
    """Greedy CTC collapse across chunk boundaries."""

    def __init__(self, labels, blank: int):
        self.labels = labels
        self.blank = blank
        self.last = -1
        self.ids: List[int] = []

    def feed(self, log_probs: np.ndarray) -> str:
        """Feed (T, V) new frames; returns newly emitted text."""
        from vietasr_tpu.ops.greedy import ctc_collapse

        preds = np.argmax(log_probs, axis=-1)
        new = ctc_collapse(preds, blank=self.blank, prev=self.last)
        if len(preds):
            self.last = int(preds[-1])
        self.ids.extend(new)
        return "".join(self.labels[i] for i in new)

    @property
    def text(self) -> str:
        return "".join(self.labels[i] for i in self.ids)


class IncrementalBeam:
    """Streaming prefix beam search per slot (beam-quality partials).

    Unlike greedy, the best beam can REVISE earlier output; a revision is
    emitted as "\\r" + full current hypothesis (clients replace the line).
    """

    def __init__(self, labels, blank: int, *, beam_width: int = 16,
                 lm=None, alpha: float = 0.5, beta: float = 1.5):
        from vietasr_tpu.ops.beam_search import StreamingPrefixBeam

        self._dec = StreamingPrefixBeam(labels, beam_width=beam_width,
                                        lm=lm, alpha=alpha, beta=beta)
        self._emitted = ""

    def feed(self, log_probs: np.ndarray) -> str:
        self._dec.feed(np.asarray(log_probs))
        cur = self._dec.best()
        if cur == self._emitted:
            return ""
        if cur.startswith(self._emitted):
            new = cur[len(self._emitted):]
        else:
            new = "\r" + cur
        self._emitted = cur
        return new

    @property
    def text(self) -> str:
        return self._dec.best()


class StreamPool:
    """Fixed pool of streaming slots advanced by one vmapped TPU step.

    `transcriber` is any stateful online transcriber exposing
    `init_state` / `_step_impl` / `prefix_frames` / `out_frames` / `cfg`:
    streaming_online.OnlineTranscriber (QuartzNet ring-buffer streams) or
    streaming_conformer.ConformerOnlineTranscriber (chunked-causal
    Conformer; fixes chunk_samples to its attention chunk)."""

    def __init__(self, transcriber: OnlineTranscriber, *, slots: int = 8,
                 chunk_samples: int = 3200, decoder: str = "greedy",
                 lm_path: Optional[str] = None, beam_width: int = 16,
                 lm_alpha: float = 0.5, lm_beta: float = 1.5,
                 wire_encoding: str = "ulaw"):
        if wire_encoding not in ("ulaw", "alaw"):
            raise ValueError("wire_encoding must be 'ulaw' or 'alaw'")
        self.wire_encoding = wire_encoding   # decode law for uint8 chunks
        self.ot = transcriber
        self.slots = slots
        required = getattr(transcriber, "required_chunk_samples", None)
        if required is not None and chunk_samples != required:
            # chunked-causal encoders consume a fixed attention chunk
            chunk_samples = required
        self.chunk_samples = chunk_samples
        self.decoder_kind = decoder
        self._lm = None
        if decoder == "beam_host" and lm_path:
            # legacy host tier: one pure-Python StreamingPrefixBeam per
            # slot (kept for parity testing; ~90x fewer sessions/chip
            # than the device beam)
            from vietasr_tpu.ops.lm import NGramLM

            self._lm = NGramLM(lm_path)
        self._beam_kw = dict(beam_width=beam_width, lm=self._lm,
                             alpha=lm_alpha, beta=lm_beta)
        self._dsb = None
        if decoder == "beam" and lm_path \
                and " " not in transcriber.cfg.labels:
            # word-LM fusion needs a separator label to complete words;
            # without one the device beam cannot apply it — keep the host
            # prefix beam (which scores only the trailing partial) for
            # this degenerate label set
            decoder = self.decoder_kind = "beam_host"
            from vietasr_tpu.ops.lm import NGramLM

            self._lm = NGramLM(lm_path)
            self._beam_kw["lm"] = self._lm
        if decoder == "beam":
            # quality-default serving tier: batched ON-DEVICE beam, state
            # carried across chunks in device arrays — one vmapped beam
            # step per tick next to the encoder step (the reference
            # decodes every request with a host W=50 LM beam, app.py:27)
            from vietasr_tpu.ops.streaming_beam import DeviceStreamingBeam

            labels = transcriber.cfg.labels
            word_lm = None
            wlm_probes = 8
            if lm_path:
                from vietasr_tpu.ops.lm import load_lm, word_lm_tables

                word_lm, wlm_probes = word_lm_tables(load_lm(lm_path),
                                                     labels)
            self._dsb = DeviceStreamingBeam(
                blank=transcriber.cfg.num_classes, beam_width=beam_width,
                space=labels.index(" ") if " " in labels else -1,
                cutoff_top_n=8, word_lm=word_lm, alpha=lm_alpha,
                beta=lm_beta, wlm_probes=wlm_probes,
                skip_frames=transcriber.prefix_frames)
            self.beam_carry = self._dsb.init(slots)
            self._reset_beam_rows = jax.jit(self._dsb.reset_rows)
            self._emitted: Dict[int, str] = {}
        # ONE jitted program per tick: vmapped step + masked state commit
        # (un-fed slots keep their state). Committing inside jit matters:
        # an eager tree_map of jnp.where over the ~dozens of state leaves
        # costs one dispatch each on a remote-attached chip.
        skip_first = bool(getattr(transcriber, "skip_first_step", False))

        def pool_step(states, batch, fed, pad, tail, treal, virgin):
            if batch.dtype == jnp.uint8:
                # G.711 wire format (mu-law by default, A-law via
                # wire_encoding="alaw"): 8x fewer host->device bytes than
                # f32 (the link, not compute, bounds multi-stream
                # serving); decoded on chip
                from vietasr_tpu.ops.g711 import (alaw_decode_f32,
                                                  ulaw_decode_f32)

                dec = alaw_decode_f32 if self.wire_encoding == "alaw" \
                    else ulaw_decode_f32
                batch = dec(batch)
            elif batch.dtype == jnp.int16:
                # int16 wire format: 4x fewer host->device bytes than f32
                batch = batch.astype(jnp.float32) / 32768.0
            # virgin slots: reflect-fill the audio carry from their first
            # chunk so boundary frames (and the causal running stats they
            # seed) match the offline featurizer exactly
            seeded = jax.vmap(transcriber.seed_carry)(states, batch)
            states = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    virgin.reshape((virgin.shape[0],)
                                   + (1,) * (a.ndim - 1)), a, b),
                seeded, states)
            # enc-skip transcribers (chunked conformer): the all-junk
            # first step must not commit encoder state (see
            # ConformerOnlineTranscriber.skip_first_step)
            eskip = virgin & skip_first
            new_states, lp = jax.vmap(transcriber._step_impl)(states, batch,
                                                              pad, tail,
                                                              treal, eskip)

            def commit(new, old):
                mask = fed.reshape((fed.shape[0],) + (1,) * (new.ndim - 1))
                return jnp.where(mask, new, old)

            return jax.tree_util.tree_map(commit, new_states, states), lp

        self._pool_step = jax.jit(pool_step)

        if self._dsb is not None:
            # beam tick: encoder + device beam chunk + masked commits,
            # ONE jitted program (each eager op is a full-latency
            # dispatch on a remote-attached chip)
            def pool_step_beam(states, carry, batch, fed, pad, tail,
                               treal, virgin):
                new_states, lp = pool_step(states, batch, fed, pad, tail,
                                           treal, virgin)
                carry2, best_ids, best_len = self._dsb.chunk(carry, lp)

                def commit(new, old):
                    mask = fed.reshape((fed.shape[0],)
                                       + (1,) * (new.ndim - 1))
                    return jnp.where(mask, new, old)

                carry2 = jax.tree_util.tree_map(commit, carry2, carry)
                return new_states, carry2, best_ids, best_len

            self._pool_step_beam = jax.jit(pool_step_beam)
        single = transcriber.init_state()
        self.states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (slots,) + x.shape), single)
        self._single_template = single
        self.decoders: Dict[int, IncrementalGreedy] = {}
        self.skip: Dict[int, int] = {}
        self._free = list(range(slots))
        self._virgin = set()                 # slots awaiting first chunk
        self._lock = threading.Lock()

    def open(self) -> Optional[int]:
        """Claim a slot for a new stream; None if the pool is full."""
        with self._lock:
            if not self._free:
                return None
            slot = self._free.pop()
            self._reset_slot(slot)
            self._virgin.add(slot)
            if self.decoder_kind == "beam":
                mask = np.zeros((self.slots,), bool)
                mask[slot] = True
                self.beam_carry = self._reset_beam_rows(
                    self.beam_carry, jnp.asarray(mask))
                self._emitted[slot] = ""
            elif self.decoder_kind == "beam_host":
                self.decoders[slot] = IncrementalBeam(
                    self.ot.cfg.labels, self.ot.cfg.num_classes,
                    **self._beam_kw)
                self.skip[slot] = self.ot.prefix_frames
            else:
                self.decoders[slot] = IncrementalGreedy(
                    self.ot.cfg.labels, self.ot.cfg.num_classes)
                self.skip[slot] = self.ot.prefix_frames
        return slot

    def close(self, slot: int) -> str:
        """Release a slot; returns its final transcript."""
        if self.decoder_kind == "beam":
            text = self._emitted.get(slot, "")
        else:
            text = self.decoders[slot].text if slot in self.decoders else ""
        with self._lock:
            self.decoders.pop(slot, None)
            self.skip.pop(slot, None)
            if self.decoder_kind == "beam":
                self._emitted.pop(slot, None)
            self._free.append(slot)
        return text

    def _reset_slot(self, slot: int):
        fresh = self._single_template
        self.states = jax.tree_util.tree_map(
            lambda batched, s: batched.at[slot].set(s), self.states, fresh)

    def flush(self, slot: int, *, return_pieces: bool = False,
              tail_done: bool = False):
        """Drain the model's lookahead by feeding silence until the frames
        for all real audio have been emitted; returns the text that
        surfaced during the drain (or, with return_pieces, the per-chunk
        emissions — each piece is one protocol message: plain text appends,
        a "\\r"-prefixed piece replaces the whole line)."""
        frames_per_chunk = self.ot.out_frames(self.chunk_samples)
        silence = np.zeros(self.chunk_samples, np.float32)
        emitted = []
        # first a TAIL step (the offline featurizer's end reflect
        # padding, synthesized from the slot's audio carry), then PAD
        # steps: the encoder advances on zero FEATURES (offline
        # end-of-utterance conv padding) — featurized silence instead
        # is a multi-sigma outlier under causal running stats and would
        # contaminate the last RF/2 of real outputs. tail_done=True
        # skips the tail (the caller already fed the final chunk with
        # tail_slots/tail_real: the true mid-chunk utterance end)
        if not tail_done:
            emitted.append(self.feed({slot: silence},
                                     tail_slots=(slot,))[slot])
        for _ in range(self.ot.prefix_frames // max(frames_per_chunk, 1) + 1):
            emitted.append(self.feed({slot: silence},
                                     pad_slots=(slot,))[slot])
        return emitted if return_pieces else "".join(emitted)

    def feed(self, inputs: Dict[int, np.ndarray],
             pad_slots=(), tail_slots=(),
             tail_real=None) -> Dict[int, str]:
        """Advance the FED slots one chunk; `inputs` maps slot -> audio
        chunk (exactly chunk_samples long): float waveform in [-1, 1],
        raw int16 PCM (shipped to the device as-is and scaled on chip —
        4x fewer host->device bytes), or uint8 G.711 mu-law (decoded on
        chip — 8x fewer bytes, the telephony wire format; all fed chunks
        in one tick must share a dtype). Un-fed slots run through
        the vmapped step on silence (shapes stay static) but their state
        rows are NOT committed, so concurrent sessions never push phantom
        audio through each other's encoder state. Thread-safe: the
        read-modify-write of the pooled state is serialized under the
        pool lock. Returns newly emitted text per fed slot.

        `pad_slots`: slots whose chunk this tick is a FLUSH pad — their
        encoder advances on zero features with the featurizer state
        frozen (see flush)."""
        from vietasr_tpu.utils.typing import assert_waveform

        arrs = {s: np.asarray(c) for s, c in inputs.items()}
        i16 = bool(arrs) and all(a.dtype == np.int16 for a in arrs.values())
        u8 = bool(arrs) and all(a.dtype == np.uint8 for a in arrs.values())
        wire = np.uint8 if u8 else np.int16 if i16 else np.float32
        batch = np.zeros((self.slots, self.chunk_samples), wire)
        if u8:                                      # G.711 code for 0
            batch[:] = 0xFF if self.wire_encoding == "ulaw" else 0xD5
        fed = np.zeros((self.slots,), bool)
        for slot, chunk in arrs.items():
            if chunk.dtype == np.uint8 and not u8:
                from vietasr_tpu.audio.g711 import alaw_decode, ulaw_decode

                dec = alaw_decode if self.wire_encoding == "alaw" \
                    else ulaw_decode
                chunk = dec(chunk).astype(np.float32) / 32768.0
            if chunk.dtype == np.int16 and not i16:
                chunk = chunk.astype(np.float32) / 32768.0
            if chunk.dtype not in (np.int16, np.uint8):
                assert_waveform(chunk, port="stream.chunk")
            if len(chunk) != self.chunk_samples:
                raise ValueError(
                    f"chunk must be exactly {self.chunk_samples} samples")
            batch[slot] = chunk
            fed[slot] = True
        pad = np.zeros((self.slots,), bool)
        for slot in pad_slots:
            pad[slot] = True
        tail = np.zeros((self.slots,), bool)
        for slot in tail_slots:
            tail[slot] = True
        treal = np.zeros((self.slots,), np.int32)
        for slot, r in (tail_real or {}).items():
            treal[slot] = r
        virgin = np.zeros((self.slots,), bool)
        for slot in arrs:
            if slot in self._virgin and slot not in pad_slots:
                virgin[slot] = True
                self._virgin.discard(slot)

        with self._lock:
            if self.decoder_kind == "beam":
                # device beam: the tick returns each slot's current best
                # hypothesis; the host only diffs strings for the wire
                # protocol (append pieces, or "\r" + full on a revision)
                self.states, self.beam_carry, best_ids, best_len = \
                    self._pool_step_beam(self.states, self.beam_carry,
                                         jnp.asarray(batch),
                                         jnp.asarray(fed),
                                         jnp.asarray(pad),
                                         jnp.asarray(tail),
                                         jnp.asarray(treal),
                                         jnp.asarray(virgin))
                best_ids = np.asarray(best_ids)
                best_len = np.asarray(best_len)
                labels = self.ot.cfg.labels
                out = {}
                for slot in inputs:
                    cur = self._dsb.render(labels, best_ids[slot],
                                           int(best_len[slot]))
                    prev = self._emitted.get(slot, "")
                    if cur == prev:
                        out[slot] = ""
                    elif cur.startswith(prev):
                        out[slot] = cur[len(prev):]
                    else:
                        out[slot] = "\r" + cur
                    self._emitted[slot] = cur
                return out
            self.states, lp = self._pool_step(
                self.states, jnp.asarray(batch), jnp.asarray(fed),
                jnp.asarray(pad), jnp.asarray(tail), jnp.asarray(treal),
                jnp.asarray(virgin))
            lp = np.asarray(lp)
            out: Dict[int, str] = {}
            for slot in inputs:
                frames = lp[slot]
                drop = min(self.skip.get(slot, 0), len(frames))
                if drop:
                    self.skip[slot] -= drop
                    frames = frames[drop:]
                if len(frames):
                    out[slot] = self.decoders[slot].feed(frames)
                else:
                    out[slot] = ""
        return out
