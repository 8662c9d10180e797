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

    def __init__(self, fc: FeaturizerConfig, *, causal_norm: bool = True):
        if fc.frame_splicing != 1:
            raise NotImplementedError(
                "online streaming requires frame_splicing == 1")
        self.fc = fc
        self.causal_norm = causal_norm
        self._dft = jnp.asarray(_windowed_dft_matrix(fc))
        self._mel = jnp.asarray(mel_filterbank(
            fc.sample_rate, fc.fft_length, fc.features, fc.lowfreq,
            fc.highfreq).T)
        # audio carry length: must satisfy L === n_fft//2 (mod hop) so that
        # emitted frame centers land on the offline hop grid
        n_fft, hop = fc.fft_length, fc.hop_length
        base = n_fft - hop
        self.audio_carry = base + ((n_fft // 2 - base) % hop)

    @property
    def junk_frames(self) -> int:
        """Frames at stream start computed from the zero carry beyond the
        offline center pad (callers fold this into their prefix drop)."""
        fc = self.fc
        return (self.audio_carry - fc.fft_length // 2) // fc.hop_length + 1

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
        # frames fully contained in [carry ++ chunk]
        n_frames = chunk.shape[0] // hop
        spec = jax.lax.conv_general_dilated(
            xp[None, :, None], self._dft.reshape(n_fft, 1, -1),
            window_strides=(hop,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"))[0]
        spec = spec[:n_frames]
        n_bins = n_fft // 2 + 1
        power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2
        mel = jnp.log(power @ self._mel + fc.log_zero_guard_value)

        if self.causal_norm:
            # PER-FRAME running stats: frame t is normalized over frames
            # 0..t only, exactly the offline normalize="causal_per_feature"
            # cumsum formulation (features._normalize) — training with
            # that mode and serving through here see the same statistics.
            # Carried fields are raw sums (count, Σx, Σx²).
            cnt = norm_count + jnp.arange(1, n_frames + 1,
                                          dtype=jnp.float32)   # (n,)
            s1 = norm_s1 + jnp.cumsum(mel, axis=0)             # (n, M)
            s2 = norm_s2 + jnp.cumsum(mel * mel, axis=0)
            cnt_safe = jnp.maximum(cnt, 1.0)[:, None]
            mean = s1 / cnt_safe
            var = jnp.maximum(s2 / cnt_safe - mean * mean, 0.0) \
                * (cnt_safe / jnp.maximum(cnt_safe - 1.0, 1.0))
            std = jnp.sqrt(var) + 1e-5
            out = (mel - mean) / std
            new_norm = (cnt[-1], s1[-1], s2[-1])
        else:
            new_norm = (norm_count, norm_s1, norm_s2)
            out = mel

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
    blocks: Tuple[jnp.ndarray, ...]     # per conv block: (k-1, C) carry


def tree_flatten_state(s):  # registered below
    return ((s.audio, s.preemph_last, s.norm_count, s.norm_s1, s.norm_s2,
             s.blocks), None)


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
        self._sf = StreamingFeaturizer(cfg.featurizer,
                                       causal_norm=causal_norm)
        for b in cfg.encoder.blocks[1:]:
            if b.stride != 1 or b.dilation != 1 or b.repeat != 1:
                raise NotImplementedError(
                    "online streaming requires stride/dilation/repeat 1 "
                    "after the prologue")
        self._audio_carry = self._sf.audio_carry
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
            blocks=tuple(carries),
        )

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

    def _step_impl(self, state: StreamState, chunk: jnp.ndarray):
        state, feats = self._featurize_chunk(state, chunk)
        x = feats
        new_carries = []
        for i, bcfg in enumerate(self.cfg.encoder.blocks):
            carry, x = self._block_chunk(
                state.blocks[i], x, self.variables["params"]["encoder"][i],
                bcfg)
            new_carries.append(carry)
        dec = self.variables["params"]["decoder"]
        logits = x @ dec["w"] + dec["b"]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        state = dataclasses.replace(state, blocks=tuple(new_carries))
        return state, log_probs

    # ------------------------------------------------------------------

    def stream(self, chunks, *, drop_prefix: bool = True) -> np.ndarray:
        """Feed raw-sample chunks (each a multiple of 2*hop samples);
        returns the concatenated emitted log-probs (zero-context prefix
        frames dropped unless drop_prefix=False)."""
        hop = self.cfg.featurizer.hop_length
        state = self.init_state()
        outs: List[np.ndarray] = []
        for chunk in chunks:
            if len(chunk) % (2 * hop) != 0:
                raise ValueError(
                    f"chunk length {len(chunk)} must be a multiple of "
                    f"2*hop={2 * hop} (even frame count keeps the stride-2 "
                    f"prologue phase); pad the final chunk")
            state, lp = self._step(state, jnp.asarray(chunk, jnp.float32))
            if lp.shape[0]:
                outs.append(np.asarray(lp))
        if not outs:
            return np.zeros((0, 1))
        out = np.concatenate(outs, axis=0)
        return out[self.prefix_frames:] if drop_prefix else out
