"""Stateful chunked streaming for the Conformer encoder.

The reference has no Conformer at all (README TODO,
/root/reference/README.md:68-71) and no true streaming (app.py buffers
whole utterances). This module completes the beyond-reference Conformer
with the production streaming mode used by cache-aware ASR systems
(WeNet/U2-style): the model is configured chunked-causal
(`ConformerConfig.chunk_size > 0` — chunk-limited attention with
`left_chunks` of left context, left-padded depthwise conv and conv2d
subsampling, models/conformer.py), and inference advances one chunk at a
time through a jitted step carrying per-layer caches:

- conv2d subsampling: 2 input-time rows carried per stage (valid conv
  over [carry ++ chunk] == offline left-padded conv),
- per block: the last `left_chunks * chunk_size` frames of the
  post-FF1 residual stream (the attention key/value source) with a
  valid-count, and the last conv_kernel-1 frames of the GLU output
  (depthwise conv carry),
- BatchNorm runs in eval mode (running stats) — streaming is inference.

Outputs are EXACT: chunk-by-chunk emissions equal the offline
`conformer_apply` forward of the same chunked-causal model on the full
utterance (asserted to fp32 tolerance by tests/test_streaming_conformer.py),
because every module is either per-frame, carry-exact, or sees exactly
the same masked context. Algorithmic latency = one chunk.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vietasr_tpu.config import ConformerConfig, ModelConfig
from vietasr_tpu.models.conformer import rel_pos_encoding_range
from vietasr_tpu.models.layers import batchnorm_apply


@dataclasses.dataclass
class ConformerStreamState:
    """All carries; a pytree with static shapes."""

    sub1: jnp.ndarray                    # (2, F, 1) stage-1 time carry
    sub2: jnp.ndarray                    # (2, F/2, C) stage-2 time carry
    kv: Tuple[jnp.ndarray, ...]          # per block (L, D) post-FF1 cache
    kv_len: jnp.ndarray                  # () valid cached frames (shared)
    conv: Tuple[jnp.ndarray, ...]        # per block (k-1, D) GLU carry


jax.tree_util.register_pytree_node(
    ConformerStreamState,
    lambda s: ((s.sub1, s.sub2, s.kv, s.kv_len, s.conv), None),
    lambda aux, ch: ConformerStreamState(*ch))


def _ln(x, p, eps=1e-5):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _lin(x, p):
    return x @ p["w"] + p["b"]


def _swish(x):
    return x * jax.nn.sigmoid(x)


class ConformerStream:
    """Chunk-at-a-time inference over a chunked-causal Conformer.

    Feed FEATURE chunks of exactly 4 * chunk_size mel frames
    (the conv2d subsampling is 4x); each step emits chunk_size frames of
    CTC log-probs. For raw-audio streaming compose with the featurizer
    carry logic in streaming_online.py (chunk = 4 * chunk_size * hop
    samples; per-utterance normalization becomes causal running stats,
    the documented SURVEY §5.7 deviation).
    """

    def __init__(self, cfg: ModelConfig, variables: dict):
        if cfg.architecture != "conformer":
            raise ValueError("ConformerStream requires a conformer config")
        ccfg: ConformerConfig = cfg.conformer
        if ccfg.chunk_size <= 0:
            raise ValueError(
                "streaming requires a chunked-causal model "
                "(ConformerConfig.chunk_size > 0); full-context conformers "
                "attend to the whole utterance and cannot stream exactly")
        self.cfg = cfg
        self.ccfg = ccfg
        self.variables = variables
        self.feat_in = cfg.featurizer.features * cfg.featurizer.frame_splicing
        self.c_out = ccfg.chunk_size                      # frames emitted
        self.t_in = 4 * ccfg.chunk_size                   # mel frames fed
        self.l_ctx = ccfg.left_chunks * ccfg.chunk_size
        # positional encodings for offsets (L + il) - j, il in [0, C),
        # j in [0, L + C): [L+C-1 ... -(C-1)], identical values to the
        # offline _rel_pos_encoding at equal offsets
        c, l = self.c_out, self.l_ctx
        self._pos = jnp.asarray(rel_pos_encoding_range(
            l + c - 1, -(c - 1), ccfg.d_model))
        # shift gather: position[il, j] = raw[il, (C-1) - il + j]
        self._pos_idx = jnp.asarray(
            (c - 1) - np.arange(c)[:, None] + np.arange(l + c)[None, :],
            jnp.int32)
        self._step = jax.jit(self._step_impl)

    # ------------------------------------------------------------------

    def init_state(self) -> ConformerStreamState:
        p = self.variables["params"]
        f = self.feat_in
        d = self.ccfg.d_model
        k = self.ccfg.conv_kernel
        n = self.ccfg.num_blocks
        if self.ccfg.subsampling_mode == "stack":
            # frame stacking has no cross-chunk context: empty carries
            sub1 = jnp.zeros((0, f, 1), jnp.float32)
            sub2 = jnp.zeros((0, 1, 1), jnp.float32)
        else:
            c_sub = p["sub1"]["w"].shape[-1]
            f2 = (f + 2 - 3) // 2 + 1
            sub1 = jnp.zeros((2, f, 1), jnp.float32)
            sub2 = jnp.zeros((2, f2, c_sub), jnp.float32)
        return ConformerStreamState(
            sub1=sub1,
            sub2=sub2,
            kv=tuple(jnp.zeros((self.l_ctx, d), jnp.float32)
                     for _ in range(n)),
            kv_len=jnp.zeros((), jnp.int32),
            conv=tuple(jnp.zeros((k - 1, d), jnp.float32)
                       for _ in range(n)),
        )

    # ------------------------------------------------------------------

    def _sub_stage(self, carry, x, p):
        """x (T, F, Cin), carry (2, F, Cin): causal-in-time conv2d k3 s2.
        Valid conv over [carry ++ x] == offline time pad (2, 0)."""
        xin = jnp.concatenate([carry, x], axis=0)[None]    # (1,T+2,F,Cin)
        y = jax.lax.conv_general_dilated(
            xin, p["w"], window_strides=(2, 2), padding=[(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + p["b"]
        y = jnp.maximum(y, 0.0)
        return xin[0, -2:], y

    def _mhsa_chunk(self, x_cur, cache, kv_len, p, cur_valid=None):
        """x_cur (C, D) current post-FF1 frames (pre-LN), cache (L, D)."""
        ccfg = self.ccfg
        h = ccfg.num_heads
        d = ccfg.d_model
        dh = d // h
        c, l = self.c_out, self.l_ctx
        full = jnp.concatenate([cache, x_cur], axis=0)     # (S, D)
        y = _ln(full, p["ln"])
        q = _lin(y[l:], p["q"]).reshape(c, h, dh)
        k = _lin(y, p["k"]).reshape(l + c, h, dh)
        v = _lin(y, p["v"]).reshape(l + c, h, dh)
        pos = (self._pos @ p["pos"]["w"]).reshape(-1, h, dh)

        qu = q + p["u"][None]
        qv = q + p["vb"][None]
        content = jnp.einsum("ihe,jhe->hij", qu, k)
        raw = jnp.einsum("ihe,lhe->hil", qv, pos)          # (H, C, Lp)
        position = jnp.take_along_axis(
            raw, jnp.broadcast_to(self._pos_idx[None], (h, c, l + c)),
            axis=-1)
        scores = (content + position) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        # cache is right-aligned: key j < L valid iff j >= L - kv_len;
        # current-chunk keys beyond cur_valid (past the utterance end in
        # the final chunk) are masked like offline's length mask
        jpos = jnp.arange(l + c)
        valid = jpos >= (l - kv_len)
        if cur_valid is not None:
            valid = valid & ((jpos < l) | (jpos - l < cur_valid))
        scores = jnp.where(valid[None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("hij,jhe->ihe", attn, v).reshape(c, d)
        return _lin(out, p["out"])

    def _conv_chunk(self, x, carry, p, stats, vmask=None):
        y = _ln(x, p["ln"])
        y = _lin(y, p["pw1"])
        a, g = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(g)                          # GLU (C, D)
        if vmask is not None:
            y = y * vmask                # offline masks conv input by lens
        k, d = p["dw"].shape
        yin = jnp.concatenate([carry, y], axis=0)          # (k-1+C, D)
        z = jax.lax.conv_general_dilated(
            yin[None], p["dw"].reshape(k, 1, d), window_strides=(1,),
            padding=[(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=d)[0]
        z, _ = batchnorm_apply(z[None], p["bn"], stats["conv_bn"],
                               training=False)
        z = _swish(z[0])
        z = _lin(z, p["pw2"])
        return yin[-(k - 1):], z

    def _ffn(self, x, p):
        return _lin(_swish(_lin(_ln(x, p["ln"]), p["in"])), p["out"])

    def _step_impl(self, state: ConformerStreamState, feats: jnp.ndarray,
                   cur_valid=None):
        """feats (4*chunk_size, F) mel frames -> (state, (chunk_size, V+1))
        log-probs. cur_valid (traced count): output frames of THIS chunk
        that are inside the utterance — frames beyond it are masked the
        way the offline forward's length mask does (final-chunk ends)."""
        p = self.variables["params"]
        stats = self.variables["batch_stats"]
        vmask = None
        if cur_valid is not None:
            cur_valid = jnp.asarray(cur_valid, jnp.int32)
            vmask = (jnp.arange(self.c_out) < cur_valid)[:, None] \
                .astype(jnp.float32)
        if self.ccfg.subsampling_mode == "stack":
            s1, s2 = state.sub1, state.sub2
            y = feats.reshape(self.c_out, -1)              # (C, 4F)
        else:
            s1, y = self._sub_stage(state.sub1, feats[..., None], p["sub1"])
            s2, y = self._sub_stage(state.sub2, y, p["sub2"])
            y = y.reshape(y.shape[0], -1)
        x = _lin(y, p["proj"])                             # (C, D)
        if vmask is not None:
            x = x * vmask                # offline: x = x * length_mask

        new_kv: List[jnp.ndarray] = []
        new_conv: List[jnp.ndarray] = []
        for bi, bp in enumerate(p["blocks"]):
            x = x + 0.5 * self._ffn(x, bp["ff1"])
            new_kv.append(jnp.concatenate(
                [state.kv[bi], x], axis=0)[-self.l_ctx:])
            x = x + self._mhsa_chunk(x, state.kv[bi], state.kv_len,
                                     bp["mhsa"], cur_valid)
            carry, conv = self._conv_chunk(x, state.conv[bi], bp["conv"],
                                           stats["blocks"][bi], vmask)
            new_conv.append(carry)
            x = x + conv
            x = x + 0.5 * self._ffn(x, bp["ff2"])
            x = _ln(x, bp["final_ln"])

        logits = _lin(x, p["decoder"])
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        new_state = ConformerStreamState(
            sub1=s1, sub2=s2, kv=tuple(new_kv),
            kv_len=jnp.minimum(state.kv_len + self.c_out, self.l_ctx),
            conv=tuple(new_conv))
        return new_state, log_probs

    # ------------------------------------------------------------------

    def stream(self, feat_chunks) -> np.ndarray:
        """Feed (4*chunk_size, F) mel-frame chunks; returns concatenated
        (T_out, V+1) log-probs."""
        state = self.init_state()
        outs: List[np.ndarray] = []
        for ch in feat_chunks:
            ch = jnp.asarray(ch, jnp.float32)
            if ch.shape[0] != self.t_in:
                raise ValueError(
                    f"feature chunk must be exactly {self.t_in} frames "
                    f"(4 * chunk_size); pad the final chunk")
            state, lp = self._step(state, ch)
            outs.append(np.asarray(lp))
        if not outs:
            return np.zeros((0, 1), np.float32)
        return np.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# raw-audio online transcriber (StreamPool-compatible)


@dataclasses.dataclass
class ConformerOnlineState:
    """Featurizer carry 5-tuple + encoder caches; a static-shape pytree."""

    feat: Tuple[jnp.ndarray, ...]
    enc: ConformerStreamState


jax.tree_util.register_pytree_node(
    ConformerOnlineState,
    lambda s: ((s.feat, s.enc), None),
    lambda aux, ch: ConformerOnlineState(*ch))


class ConformerOnlineTranscriber:
    """Raw-audio real-time streaming over a chunked-causal Conformer.

    Same duck-typed interface as streaming_online.OnlineTranscriber
    (`init_state` / `_step_impl` / `prefix_frames` / `out_frames` / `cfg`)
    so serve.streams.StreamPool batches N concurrent Conformer sessions
    with one vmapped TPU step. Each step consumes EXACTLY
    `required_chunk_samples` = 4 * chunk_size * hop raw samples
    (one attention chunk; e.g. 0.64 s at chunk_size=16, 10 ms hop) and
    emits chunk_size frames of CTC log-probs. Featurizer normalization is
    causal running stats (the SURVEY §5.7 streaming deviation).

    The reference has nothing comparable: its demo buffers the whole
    utterance and runs batch inference (/root/reference/app.py:58-69).
    """

    def __init__(self, cfg: ModelConfig, variables: dict,
                 *, causal_norm: bool = True):
        from vietasr_tpu.streaming_online import StreamingFeaturizer

        self._enc = ConformerStream(cfg, variables)
        self.cfg = cfg
        self.variables = variables
        # junk_align = 4*chunk_size: the pre-audio junk region fills the
        # ENTIRE first attention chunk, so (a) the 4x frame-stacking
        # grid AND the attention chunk grid stay phase-aligned with the
        # offline forward, and (b) the whole first step can be run with
        # the ENCODER FROZEN (skip_first_step): its junk frames never
        # enter the KV cache or conv carries — offline chunk 0 has no
        # left context, and a bias-propagated junk chunk in the cache
        # measurably degraded streamed decodes (round 5:
        # stream6_v2 streaming WER 0.224 vs offline 0.000 before this)
        self._sf = StreamingFeaturizer(
            cfg.featurizer, causal_norm=causal_norm,
            junk_align=4 * max(cfg.conformer.chunk_size, 1))
        self.required_chunk_samples = \
            self._enc.t_in * cfg.featurizer.hop_length
        # the first stream step covers exactly the junk region
        self.skip_first_step = (
            self._sf.junk_frames == self._enc.t_in)
        self._step = jax.jit(self._step_impl)

    @property
    def prefix_frames(self) -> int:
        """Output frames at stream start attributable to the featurizer's
        zero-context carry: the first j mel frames are junk and the causal
        4x subsample emits one frame per 4 inputs, so ceil(j/4) output
        frames lead the audible content (callers drop them). With
        skip_first_step this is exactly one chunk's outputs (the frozen
        first step still emits placeholder frames)."""
        return -(-self._sf.junk_frames // 4)

    def out_frames(self, samples: int) -> int:
        """Encoder frames emitted per `samples`-long raw chunk."""
        return samples // (self.cfg.featurizer.hop_length * 4)

    def init_state(self) -> ConformerOnlineState:
        return ConformerOnlineState(feat=self._sf.init_fields(),
                                    enc=self._enc.init_state())

    def seed_carry(self, state: ConformerOnlineState,
                   first_chunk: jnp.ndarray) -> ConformerOnlineState:
        """State with the audio carry reflect-filled from the stream's
        first chunk (see streaming_online.StreamingFeaturizer
        .reflect_carry)."""
        feat = (self._sf.reflect_carry(first_chunk),) + tuple(state.feat[1:])
        return ConformerOnlineState(feat=feat, enc=state.enc)

    def _step_impl(self, state: ConformerOnlineState, chunk: jnp.ndarray,
                   is_pad=False, is_tail=False, tail_real=0,
                   enc_skip=False, cur_valid=None):
        """is_pad=True (traced bool): flush step on ZERO features with the
        featurizer state frozen — see OnlineTranscriber._step_impl.
        is_tail=True: the fed chunk is replaced (beyond its tail_real
        real samples) by the end-reflect tail synthesized from the audio
        carry. enc_skip=True: the FEATURIZER advances but the encoder
        state does not commit and the emitted frames are placeholders —
        used for the all-junk first step (skip_first_step), so pre-audio
        content never enters the KV cache / conv carries."""
        is_pad = jnp.asarray(is_pad, bool)
        is_tail = jnp.asarray(is_tail, bool)
        enc_skip = jnp.asarray(enc_skip, bool)
        tail_real = jnp.asarray(tail_real, jnp.int32)
        half = self._sf.fc.fft_length // 2
        buf = jnp.concatenate([state.feat[0], chunk])
        seg = jax.lax.dynamic_slice(
            buf, (state.feat[0].shape[0] + tail_real - (half + 2),),
            (half + 2,))
        refl = self._sf.end_reflect_tail(seg)
        pos = jnp.arange(chunk.shape[0])
        rel = pos - tail_real
        masked = jnp.where(pos < tail_real, chunk, 0.0)
        tail_chunk = jnp.where(
            (rel >= 0) & (rel < half),
            refl[jnp.clip(rel, 0, half - 1)], masked)
        chunk = jnp.where(is_tail, tail_chunk, chunk)
        feat, frames = self._sf.step(state.feat, chunk)
        frames = jnp.where(is_pad, 0.0, frames)
        feat = jax.tree_util.tree_map(
            lambda new, old: jnp.where(is_pad, old, new), feat, state.feat)
        enc, lp = self._enc._step_impl(state.enc, frames, cur_valid)
        enc = jax.tree_util.tree_map(
            lambda new, old: jnp.where(enc_skip, old, new), enc,
            state.enc)
        return ConformerOnlineState(feat=feat, enc=enc), lp

    def stream(self, chunks, *, drop_prefix: bool = True,
               true_samples=None) -> np.ndarray:
        """Feed raw-sample chunks of exactly `required_chunk_samples`;
        returns concatenated (T_out, V+1) log-probs.

        true_samples: the utterance's REAL sample count when the final
        chunk is zero-padded — the end-containing chunk runs as the
        reflect-tail step and the output is trimmed to the true frame
        count (wire padding fed as audio degrades decodes)."""
        hop = self.cfg.featurizer.hop_length
        t_out = self._enc.c_out
        true_out = None
        if true_samples is not None:
            true_out = -(-(-(-true_samples // hop)) // 4)

        def valid_for(step_idx):
            # step 0 is the junk/skip step; step k>=1 emits offline
            # output frames [(k-1)*t_out, k*t_out)
            if true_out is None:
                return None
            return np.int32(np.clip(true_out - (step_idx - 1) * t_out,
                                    0, t_out))

        state = self.init_state()
        outs: List[np.ndarray] = []
        first = True
        fed = 0
        step_idx = 0
        did_tail = False
        for chunk in chunks:
            if len(chunk) != self.required_chunk_samples:
                raise ValueError(
                    f"chunk must be exactly {self.required_chunk_samples} "
                    f"samples (4 * chunk_size * hop); pad the final chunk")
            if first:
                state = self.seed_carry(state,
                                        jnp.asarray(chunk, jnp.float32))
            skip = first and self.skip_first_step
            first = False
            if true_samples is not None \
                    and fed + len(chunk) > true_samples:
                r = max(true_samples - fed, 0)
                state, lp = self._step(state,
                                       jnp.asarray(chunk, jnp.float32),
                                       False, True, r, skip,
                                       valid_for(step_idx))
                outs.append(np.asarray(lp))
                fed += len(chunk)
                did_tail = True
                step_idx += 1
                break
            state, lp = self._step(state, jnp.asarray(chunk, jnp.float32),
                                   False, False, 0, skip,
                                   valid_for(step_idx))
            outs.append(np.asarray(lp))
            fed += len(chunk)
            step_idx += 1
        if true_samples is not None and outs:
            # drain the featurizer's junk-frames lag: the final output
            # frames (incl. the end reflect held in the audio carry)
            # emerge one step later; keep draining while real frames
            # remain
            zero = jnp.zeros((self.required_chunk_samples,), jnp.float32)
            if not did_tail:
                state, lp = self._step(state, zero, False, True, 0,
                                       False, valid_for(step_idx))
                outs.append(np.asarray(lp))
                step_idx += 1
            while (step_idx - 1) * t_out < true_out:
                state, lp = self._step(state, zero, False, False, 0,
                                       False, valid_for(step_idx))
                outs.append(np.asarray(lp))
                step_idx += 1
        if not outs:
            return np.zeros((0, 1), np.float32)
        out = np.concatenate(outs, axis=0)
        if drop_prefix:
            out = out[self.prefix_frames:]
        if true_out is not None:
            out = out[: true_out]
        return out
