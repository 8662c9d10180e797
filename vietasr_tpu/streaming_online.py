"""True online (stateful) streaming inference.

The reference's "streaming" is fake: the web demo buffers the whole
utterance and runs batch inference (app.py:58-69). Chunked long-form
(streaming.py) recomputes overlap. This module does REAL streaming: a
jitted step `(state, audio_chunk) -> (state, new_log_probs)` where every
conv layer carries a ring buffer of its last kernel-1 input frames, so
each audio sample is convolved exactly once and outputs are EXACT —
identical to the offline forward (up to normalization, see below) with
algorithmic latency = receptive_field/2 (~6.4 s for quartznet12x1_vi).

Mechanics: every "same"-padded conv becomes a VALID conv over
[carry ++ chunk]; the residual 1x1 taps the carry-concatenated input at the
conv-center offset k//2; the new carry is the last k-1 frames. The stride-2
prologue keeps phase by requiring even chunk lengths.

Normalization (SURVEY §5.7 deviation, CLOSED in round 5): per-feature
stats are CAUSAL per-frame running stats (frame t normalized over frames
0..t). The offline featurizer implements the same statistics as
normalize="causal_per_feature" (features._normalize), so a model TRAINED
with that mode is served here with matched normalization — no
train/serve distribution shift. Exactness tests still run the conv
machinery with normalize="".

Works for stride-1/dilation-1 separable QuartzNet blocks + the dense k=1
epilogue + head (i.e. the shipped configs). BN must be folded (inference).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vietasr_tpu.config import EncoderConfig, ModelConfig
from vietasr_tpu.frontend.features import FeaturizerConfig, _windowed_dft_matrix
from vietasr_tpu.frontend.mel import mel_filterbank
from vietasr_tpu.models.layers import depthwise_conv1d, pointwise_conv


class StreamingFeaturizer:
    """Stateful chunked log-mel frontend shared by every online encoder
    (QuartzNet ring-buffer streaming below, Conformer chunked streaming in
    streaming_conformer.py).

    State is a flat 5-tuple of arrays `(audio, preemph_last, norm_count,
    norm_s1, norm_s2)` so callers can embed it in their own state
    pytrees. `step(fields, chunk)` consumes a raw-sample chunk (multiple
    of hop) and emits exactly `len(chunk)/hop` frames whose centers land
    on the offline hop grid; normalization is causal running stats (the
    documented SURVEY §5.7 deviation) or disabled."""

    def __init__(self, fc: FeaturizerConfig, *, causal_norm: bool = True,
                 junk_align: int = 1):
        if fc.frame_splicing != 1:
            raise NotImplementedError(
                "online streaming requires frame_splicing == 1")
        self.fc = fc
        self.causal_norm = causal_norm
        self._dft = jnp.asarray(_windowed_dft_matrix(fc))
        self._mel = jnp.asarray(mel_filterbank(
            fc.sample_rate, fc.fft_length, fc.features, fc.lowfreq,
            fc.highfreq).T)
        # audio carry length: must satisfy L === n_fft//2 (mod hop) so
        # that emitted frame centers land on the offline hop grid, AND
        # junk_frames === 0 (mod junk_align) so the consumer's temporal
        # subsampling grid (stride-2 prologue, 4x frame stacking, chunk
        # grid) stays phase-aligned with the offline forward — the
        # encoder sets junk_align to its stride/subsample product
        n_fft, hop = fc.fft_length, fc.hop_length
        base = n_fft - hop
        self.audio_carry = base + ((n_fft // 2 - base) % hop)
        j0 = -(-(self.audio_carry - n_fft // 2) // hop)
        self.audio_carry += ((-j0) % max(junk_align, 1)) * hop

    @property
    def junk_frames(self) -> int:
        """Emitted frames at stream start whose centers fall BEFORE the
        audio (callers fold this into their prefix drop): emitted frame f
        centers at absolute sample f*hop - (carry - n_fft/2), so the
        pre-audio count is ceil((carry - n_fft/2) / hop). Round 5 fixed
        an off-by-one here: the old floor+1 form overcounted by one
        exactly when carry - n_fft/2 is a hop multiple — true for the
        shipped 512/160 featurizer — silently shifting "aligned" frames
        by one and keeping one polluted boundary frame in the causal
        stats."""
        fc = self.fc
        return -(-(self.audio_carry - fc.fft_length // 2)
                 // fc.hop_length)

    def reflect_carry(self, first_chunk: jnp.ndarray) -> jnp.ndarray:
        """Audio-carry contents that make the stream's boundary frames
        equal the OFFLINE featurizer's bit for bit.

        Offline reflect-pads n_fft/2 samples of the PREEMPHASIZED signal
        before the waveform (features.log_mel_features: preemph, then
        reflect pad) — with a zero carry the first ~2 real frames come
        out quieter by up to ~16 log-mel units, outliers that permanently
        contaminate the causal running stats (round-5 root cause of the
        streaming-garbage finding).

        The carry holds RAW samples that step() preemphasizes in-stream,
        so the tail cells c_j must satisfy c_j - p*c_{j-1} = xp[half-j]
        (the offline reflected preemph values) AND c_last = 0 (so the
        first real sample preemphasizes against zero, matching offline's
        untouched xp[0] = x[0]). Solving the recurrence backward from
        the zero junction gives the closed form
        c_m = -sum_{j>m} T_j p^{m-j}, computed here via a scaled reverse
        cumsum. Cells before the tail only feed pre-audio (junk) frames,
        whose outputs are dropped."""
        fc = self.fc
        half = fc.fft_length // 2
        if first_chunk.shape[0] <= half:
            raise ValueError(
                f"first chunk must exceed n_fft/2={half} samples to "
                "build the reflect carry")
        carry = jnp.zeros((self.audio_carry,), jnp.float32)
        p = fc.preemph
        if not p:
            return carry.at[self.audio_carry - half:].set(
                first_chunk[half:0:-1])
        x = first_chunk[: half + 1]
        xp = x - p * jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])
        # targets per tail cell j in [0, half): T_j = xp[half - j]
        t = xp[half:0:-1]                                 # (half,)
        j = jnp.arange(half, dtype=jnp.float32)
        # c_m = -sum_{j > m} T_j p^{m-j}  ->  scaled reverse cumsum
        a = t * p ** (-j)                                 # T_j p^{-j}
        s = jnp.cumsum(a[::-1])[::-1] - a                 # sum_{j > m} a_j
        c = -(p ** j) * s
        carry = carry.at[self.audio_carry - half:].set(c)
        if self.audio_carry > half:
            # cell 0's preemph reads the cell before the tail: set it so
            # pre(cell 0) = T_0 as well (that cell's own preemphed value
            # only feeds pre-audio junk windows)
            carry = carry.at[self.audio_carry - half - 1].set(
                (c[0] - t[0]) / p)
        return carry

    @property
    def tail_valid_frames(self) -> int:
        """Frames in the end-reflect tail step whose centers are still
        inside the audio: frames needing up to n_fft/2 future samples."""
        return -(-(self.fc.fft_length // 2) // self.fc.hop_length)

    def end_reflect_tail(self, carry: jnp.ndarray) -> jnp.ndarray:
        """Raw samples that extend the stream with the offline
        featurizer's END reflect padding: offline pads n_fft/2 samples
        of reflect(xp) after the waveform; the stream must feed raw y
        with preemph(y | last x) == that suffix. Forward recurrence
        y_i = T_i + p*y_{i-1} (stable), T_i = xp[N-2-i], solved in
        closed form via a scaled cumsum over the audio carry's tail."""
        fc = self.fc
        half = fc.fft_length // 2
        if carry.shape[0] < half + 2:
            raise ValueError("audio carry shorter than n_fft/2 + 2")
        p = fc.preemph
        x = carry[-(half + 2):]                     # x[N-half-2 .. N-1]
        if not p:
            return x[-2:1:-1]                       # plain end reflect
        xp = x[1:] - p * x[:-1]                     # xp[N-half-1 .. N-1]
        t = xp[-2::-1]                              # T_i = xp[N-2-i]
        i = jnp.arange(half, dtype=jnp.float32)
        # y_i = sum_{k<=i} T_k p^{i-k} + p^{i+1} x_{N-1}
        a = t * p ** (-i)
        y = (p ** i) * jnp.cumsum(a) + (p ** (i + 1)) * x[-1]
        return y

    def init_fields(self):
        fc = self.fc
        return (jnp.zeros((self.audio_carry,), jnp.float32),
                jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32),
                jnp.zeros((fc.features,), jnp.float32),
                jnp.zeros((fc.features,), jnp.float32))

    def step(self, fields, chunk: jnp.ndarray):
        """fields: the 5-tuple; chunk: (S,) raw samples, S a multiple of
        hop. Returns (new_fields, (S/hop, n_mels) frames)."""
        audio, preemph_last, norm_count, norm_s1, norm_s2 = fields
        fc = self.fc
        hop, n_fft = fc.hop_length, fc.fft_length
        x = jnp.concatenate([audio, chunk])
        # preemphasis continuous across chunks (preemph_last = the raw
        # sample just before the carry window)
        prev = jnp.concatenate([preemph_last[None], x[:-1]])
        xp = x - fc.preemph * prev
        # frames fully contained in [carry ++ chunk]: convolve only the
        # region that produces the emitted frames — windows starting
        # deeper are recomputed next step anyway (with the junk-aligned
        # conformer carry the full buffer costs ~2x the needed DFT work)
        n_frames = chunk.shape[0] // hop
        need = (n_frames - 1) * hop + n_fft
        spec = jax.lax.conv_general_dilated(
            xp[None, :need, None], self._dft.reshape(n_fft, 1, -1),
            window_strides=(hop,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"))[0]
        n_bins = n_fft // 2 + 1
        power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2
        mel = jnp.log(power @ self._mel + fc.log_zero_guard_value)

        if self.causal_norm:
            # PER-FRAME running stats: frame t is normalized over frames
            # 0..t only, exactly the offline normalize="causal_per_feature"
            # cumsum formulation (features._normalize) — training with
            # that mode and serving through here see the same statistics.
            # Carried fields: norm_count = frames PROCESSED (incl. junk);
            # norm_s1/norm_s2 = raw Σx/Σx² over ACCUMULATED frames.
            #
            # The stream's first `junk_frames` outputs come from the zero
            # audio carry: their log-mel is ~log(guard) ≈ -16, an extreme
            # outlier vs real frames. Including them in the running stats
            # permanently contaminated mean/var (round-5 debug: feature
            # error vs offline still 1-2σ at utterance END; the trained
            # causal model decoded streams to EMPTY at offline WER 0.09).
            # They are EXCLUDED from accumulation — the post-junk stats
            # then equal the offline causal stats frame for frame — and
            # normalized with whatever stats exist (their encoder outputs
            # are dropped by the prefix logic regardless).
            g = norm_count + jnp.arange(n_frames, dtype=jnp.float32)
            keep = (g >= float(self.junk_frames)).astype(mel.dtype)  # (n,)
            eff0 = jnp.maximum(norm_count - float(self.junk_frames), 0.0)
            cnt = eff0 + jnp.cumsum(keep)                      # (n,)
            mel_k = mel * keep[:, None]
            s1 = norm_s1 + jnp.cumsum(mel_k, axis=0)           # (n, M)
            s2 = norm_s2 + jnp.cumsum(mel_k * mel_k, axis=0)
            cnt_safe = jnp.maximum(cnt, 1.0)[:, None]
            mean = s1 / cnt_safe
            var = jnp.maximum(s2 / cnt_safe - mean * mean, 0.0) \
                * (cnt_safe / jnp.maximum(cnt_safe - 1.0, 1.0))
            from vietasr_tpu.frontend.features import \
                CAUSAL_STD_GUARD

            std = jnp.sqrt(var) + CAUSAL_STD_GUARD
            # junk frames OUTPUT zero as well: with empty stats they would
            # normalize to mel/1e-5 ~ +-1e6 and poison every conv ring
            # buffer for half the receptive field; zero is exactly what
            # the offline forward's left conv padding provides there
            out = ((mel - mean) / std) * keep[:, None]
            new_norm = (norm_count + float(n_frames), s1[-1], s2[-1])
        else:
            g = norm_count + jnp.arange(n_frames, dtype=jnp.float32)
            keep = (g >= float(self.junk_frames)).astype(mel.dtype)
            out = mel * keep[:, None]
            new_norm = (norm_count + float(n_frames), norm_s1, norm_s2)

        new_fields = (x[-self.audio_carry:], x[-(self.audio_carry + 1)]) \
            + new_norm
        return new_fields, out                       # (n_frames, n_mels)


@dataclasses.dataclass
class StreamState:
    """All carries. Shapes are static; the object is a pytree."""

    audio: jnp.ndarray                  # (n_fft - hop,) raw-sample carry
    preemph_last: jnp.ndarray           # () last raw sample
    norm_count: jnp.ndarray             # () frames seen
    norm_s1: jnp.ndarray                # (n_mels,) running Σx
    norm_s2: jnp.ndarray                # (n_mels,) running Σx²
    feat_pos: jnp.ndarray               # () feature frames processed
    real_feat_end: jnp.ndarray          # () frames before flush began
    blocks: Tuple[jnp.ndarray, ...]     # per conv block: (k-1, C) carry


def tree_flatten_state(s):  # registered below
    return ((s.audio, s.preemph_last, s.norm_count, s.norm_s1, s.norm_s2,
             s.feat_pos, s.real_feat_end, s.blocks), None)


jax.tree_util.register_pytree_node(
    StreamState, tree_flatten_state,
    lambda aux, ch: StreamState(*ch))


class OnlineTranscriber:
    """Stateful streaming over a folded QuartzNet."""

    def __init__(self, cfg: ModelConfig, folded_variables: dict,
                 *, causal_norm: bool = True):
        if cfg.architecture != "quartznet":
            raise NotImplementedError("online streaming: quartznet only")
        self.cfg = cfg
        self.variables = folded_variables
        self.causal_norm = causal_norm
        stride_prod = 1
        for b in cfg.encoder.blocks:
            stride_prod *= b.stride
        self._sf = StreamingFeaturizer(cfg.featurizer,
                                       causal_norm=causal_norm,
                                       junk_align=stride_prod)
        for b in cfg.encoder.blocks[1:]:
            if b.stride != 1 or b.dilation != 1 or b.repeat != 1:
                raise NotImplementedError(
                    "online streaming requires stride/dilation/repeat 1 "
                    "after the prologue")
        # offline-grid phase: each strided conv must consume the junk
        # region an integral number of strides (guaranteed for the
        # shipped configs: even junk + even half-kernels)
        j = self._sf.junk_frames
        for b in cfg.encoder.blocks:
            half = (b.effective_kernel - 1) // 2
            if (j + half) % b.stride:
                raise NotImplementedError(
                    f"stride {b.stride} block with half-kernel {half} "
                    f"breaks offline grid alignment at junk={j}")
            j = (j + half) // b.stride
        self._audio_carry = self._sf.audio_carry
        # per-layer pre-audio output counts (the prefix_frames recurrence,
        # evaluated after each block): output positions < _junk_after[i]
        # of block i fall before the audio and are force-zeroed in the
        # step when conv_mask is on — the offline forward has literal
        # zero conv padding there, while computed f(0) activations carry
        # folded-BN biases through ReLU and contaminate every output
        # within RF/2 of the stream start (round-5 root cause #2 of the
        # streaming-garbage finding; #1 was the flush, #3 the norm stats)
        self._junk_after = []
        self._stride_after = []
        j, cum = self._sf.junk_frames, 1
        for b in cfg.encoder.blocks:
            half = (b.effective_kernel - 1) // 2
            j = -(-(j + half) // b.stride)
            cum *= b.stride
            self._junk_after.append(j)
            self._stride_after.append(cum)
        self._step = jax.jit(self._step_impl)

    @property
    def prefix_frames(self) -> int:
        """Encoder frames at stream start that correspond to the zero
        context before the audio (callers drop them): the streaming output
        equals the offline forward of [zeros ++ audio] — this is the length
        of the zeros region in output frames.

        Recurrence: a valid conv (kernel k, stride s) over a stream with J
        leading zero-context frames emits ceil((J + (k-1)/2) / s) outputs
        whose centers fall inside that region.
        """
        # featurizer junk frames: carry-over beyond the offline center pad
        j = self._sf.junk_frames
        for b in self.cfg.encoder.blocks:
            half = (b.effective_kernel - 1) // 2
            j = -(-(j + half) // b.stride)
        return j

    def out_frames(self, samples: int) -> int:
        """Encoder frames emitted per `samples`-long raw chunk."""
        from vietasr_tpu.streaming import encoder_stride

        stride = encoder_stride(self.cfg.encoder)
        return samples // (self.cfg.featurizer.hop_length * stride)

    # ------------------------------------------------------------------

    def init_state(self) -> StreamState:
        fc = self.cfg.featurizer
        carries = []
        c_in = fc.features
        for b in self.cfg.encoder.blocks:
            k = b.effective_kernel
            carries.append(jnp.zeros((k - 1, c_in), jnp.float32))
            c_in = b.filters
        audio, pre, cnt, s1, s2 = self._sf.init_fields()
        return StreamState(
            audio=audio, preemph_last=pre,
            norm_count=cnt, norm_s1=s1, norm_s2=s2,
            feat_pos=jnp.zeros((), jnp.int32),
            real_feat_end=jnp.zeros((), jnp.int32),
            blocks=tuple(carries),
        )

    def seed_carry(self, state: StreamState,
                   first_chunk: jnp.ndarray) -> StreamState:
        """State with the audio carry reflect-filled from the stream's
        first chunk (StreamingFeaturizer.reflect_carry) — makes boundary
        frame values offline-identical. stream() applies it itself; pool
        callers apply it to virgin slots."""
        return dataclasses.replace(
            state, audio=self._sf.reflect_carry(first_chunk))

    def _featurize_chunk(self, state: StreamState, chunk: jnp.ndarray):
        """chunk: (S,) raw samples, S a multiple of hop. Emits S/hop frames."""
        fields = (state.audio, state.preemph_last, state.norm_count,
                  state.norm_s1, state.norm_s2)
        (audio, pre, cnt, s1, s2), out = self._sf.step(fields, chunk)
        new_state = dataclasses.replace(
            state, audio=audio, preemph_last=pre,
            norm_count=cnt, norm_s1=s1, norm_s2=s2)
        return new_state, out                        # (n_frames, n_mels)

    def _block_chunk(self, carry, x, params, bcfg):
        """x: (T, C_in) new frames. Returns (new_carry, out (T_out, C_out))."""
        k = bcfg.effective_kernel
        xin = jnp.concatenate([carry, x], axis=0)    # (k-1+T, C)
        sub = params["sub"][0]
        if bcfg.separable:
            y = depthwise_conv1d(xin[None], sub["dw_w"],
                                 stride=bcfg.stride)[0]
            y = pointwise_conv(y[None], sub["pw_w"])[0] + sub["b"]
        else:
            from vietasr_tpu.models.layers import dense_conv1d

            y = dense_conv1d(xin[None], sub["conv_w"],
                             stride=bcfg.stride)[0] + sub["b"]
        if params["res"]:
            pane = params["res"][0]
            # residual taps the conv-center-aligned input slice
            start = k // 2
            if bcfg.stride == 1:
                x_res = jax.lax.dynamic_slice_in_dim(
                    xin, start, y.shape[0], axis=0)
            else:
                x_res = xin[start : start + y.shape[0] * bcfg.stride
                            : bcfg.stride]
            r = pointwise_conv(x_res[None], pane["conv_w"])[0] + pane["b"]
            y = y + r
        y = jnp.maximum(y, 0.0)
        new_carry = xin[-(k - 1):] if k > 1 else carry
        return new_carry, y

    def _step_impl(self, state: StreamState, chunk: jnp.ndarray,
                   is_pad=False, is_tail=False, tail_real=0,
                   enc_skip=False):
        del enc_skip          # QuartzNet junk << chunk: no skip step
        """One chunk step. Two flush modes (traced bools):

        is_tail=True — the END-REFLECT step, run once when the audio
        ends: the fed chunk is replaced by [end_reflect_tail(carry) ++
        zeros], reproducing the offline featurizer's right-side reflect
        padding, so the last boundary frames (windows crossing the
        utterance end) get their offline values; only tail_valid_frames
        of them count as real (real_feat_end advances by that).

        is_pad=True — pure drain: the encoder advances on ZERO features
        (offline right conv padding) with the featurizer frozen.
        Feeding silence AUDIO instead of either would normalize to
        multi-sigma outlier frames and contaminate every output within
        half the receptive field of the stream end."""
        is_pad = jnp.asarray(is_pad, bool)
        is_tail = jnp.asarray(is_tail, bool)
        tail_real = jnp.asarray(tail_real, jnp.int32)
        # tail step: the chunk's first tail_real samples are the FINAL
        # real audio; the end-reflect splices in right after them, so
        # the utterance can end anywhere on the hop grid instead of at
        # a chunk boundary (trailing digital silence fed as audio
        # measurably degrades decodes — see docs/heldout_wer.md)
        half = self._sf.fc.fft_length // 2
        buf = jnp.concatenate([state.audio, chunk])
        seg = jax.lax.dynamic_slice(
            buf, (state.audio.shape[0] + tail_real - (half + 2),),
            (half + 2,))
        refl = self._sf.end_reflect_tail(seg)
        pos = jnp.arange(chunk.shape[0])
        rel = pos - tail_real
        masked = jnp.where(pos < tail_real, chunk, 0.0)
        tail_chunk = jnp.where(
            (rel >= 0) & (rel < half),
            refl[jnp.clip(rel, 0, half - 1)], masked)
        chunk = jnp.where(is_tail, tail_chunk, chunk)
        new_state, feats = self._featurize_chunk(state, chunk)
        feats = jnp.where(is_pad, 0.0, feats)
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(is_pad, old, new), new_state, state)
        feat_pos = state.feat_pos
        n = feats.shape[0]
        # real_feat_end: the utterance's true feature length, from which
        # each block's offline output length follows (ceil by strides).
        # Normal steps: all emitted frames are real. Tail step: only the
        # frames whose centers precede the audio end. Pad steps: frozen.
        hop = self._sf.fc.hop_length
        # offline frame count of the full utterance, in stream coords:
        # feat_pos frames were emitted from fed samples; the carry still
        # holds the final `junk` frames' worth; the tail chunk adds
        # ceil(tail_real / hop) more real frames
        tail_end = feat_pos + self._sf.junk_frames \
            + (tail_real + hop - 1) // hop
        real_end = jnp.where(
            is_pad, state.real_feat_end,
            jnp.where(is_tail, tail_end, feat_pos + n))
        state = dataclasses.replace(state, feat_pos=feat_pos + n,
                                    real_feat_end=real_end)
        # feature-level end mask: frames at/after the real end are
        # outside the utterance — offline sets them to pad_value (0)
        fidx = feat_pos + jnp.arange(n)
        feats = jnp.where((fidx >= real_end)[:, None], 0.0, feats)
        x = feats
        new_carries = []
        real_len = jnp.maximum(real_end - self._sf.junk_frames, 0)
        for i, bcfg in enumerate(self.cfg.encoder.blocks):
            carry, x = self._block_chunk(
                state.blocks[i], x, self.variables["params"]["encoder"][i],
                bcfg)
            real_len = (real_len + bcfg.stride - 1) // bcfg.stride
            if self.cfg.encoder.conv_mask:
                # offline zeroes every layer's activations OUTSIDE the
                # utterance (mask_padding in quartznet_apply + zero conv
                # padding): computed f(0) activations would instead carry
                # the folded-BN bias through ReLU and contaminate every
                # output within RF/2 of either stream boundary (for 12x1
                # that is 6.4 s — the whole output, typically; round-5
                # root cause of the streaming-garbage finding). Zero this
                # block's outputs at pre-audio positions (< _junk_after)
                # and beyond the utterance's per-block offline length.
                # Position-based, NOT chunk-based: deeper blocks lag, so
                # real positions still emit during flush pad steps.
                pos0 = feat_pos // self._stride_after[i]
                idx = pos0 + jnp.arange(x.shape[0])
                bad = (idx < self._junk_after[i]) \
                    | (idx >= self._junk_after[i] + real_len)
                x = jnp.where(bad[:, None], 0.0, x)
            new_carries.append(carry)
        dec = self.variables["params"]["decoder"]
        logits = x @ dec["w"] + dec["b"]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        state = dataclasses.replace(state, blocks=tuple(new_carries))
        return state, log_probs

    # ------------------------------------------------------------------

    def stream(self, chunks, *, drop_prefix: bool = True,
               flush: bool = False, true_samples: Optional[int] = None
               ) -> np.ndarray:
        """Feed raw-sample chunks (each a multiple of 2*hop samples);
        returns the concatenated emitted log-probs (zero-context prefix
        frames dropped unless drop_prefix=False).

        flush=True drains the decoder's algorithmic latency (half the
        receptive field) after the last chunk: one end-reflect TAIL step
        (the offline featurizer's right reflect padding), then pad steps
        on zero FEATURES (the offline right conv padding) — the streamed
        output then matches the offline forward end to end.

        true_samples (implies flush): the utterance's REAL length when
        the final chunk is zero-padded to the chunk grid. The chunk
        containing the end runs as the tail step with the reflect
        spliced at the true end — trailing digital silence fed as audio
        measurably degrades decodes (docs/heldout_wer.md: offline WER
        0.085 -> 0.255 on ≤0.2 s of trailing zeros)."""
        hop = self.cfg.featurizer.hop_length
        state = self.init_state()
        outs: List[np.ndarray] = []
        chunk_len = 0
        first = True
        fed = 0
        did_tail = False
        for chunk in chunks:
            if len(chunk) % (2 * hop) != 0:
                raise ValueError(
                    f"chunk length {len(chunk)} must be a multiple of "
                    f"2*hop={2 * hop} (even frame count keeps the stride-2 "
                    f"prologue phase); pad the final chunk")
            chunk_len = len(chunk)
            if first:
                state = self.seed_carry(state,
                                        jnp.asarray(chunk, jnp.float32))
                first = False
            if true_samples is not None \
                    and fed + len(chunk) > true_samples:
                # the chunk containing the true end: tail step
                r = max(true_samples - fed, 0)
                state, lp = self._step(state,
                                       jnp.asarray(chunk, jnp.float32),
                                       False, True, r)
                did_tail = True
                if lp.shape[0]:
                    outs.append(np.asarray(lp))
                break
            fed += len(chunk)
            state, lp = self._step(state, jnp.asarray(chunk, jnp.float32))
            if lp.shape[0]:
                outs.append(np.asarray(lp))
        if (flush or true_samples is not None) and chunk_len:
            zero = jnp.zeros((chunk_len,), jnp.float32)
            per_chunk = max(self.out_frames(chunk_len), 1)
            if not did_tail:
                # audio ended exactly on the chunk grid: pure-reflect tail
                state, lp = self._step(state, zero, False, True)
                if lp.shape[0]:
                    outs.append(np.asarray(lp))
            for _ in range(-(-self.prefix_frames // per_chunk)):
                state, lp = self._step(state, zero, True)
                if lp.shape[0]:
                    outs.append(np.asarray(lp))
        if not outs:
            return np.zeros((0, 1))
        out = np.concatenate(outs, axis=0)
        return out[self.prefix_frames:] if drop_prefix else out
