"""Attention seq2seq infrastructure (RNN encoder/decoder + generators).

Capability port of the reference common backend pieces the LAS experiments
build on: EncoderRNN/DecoderRNN (nemo/backends/pytorch/common/rnn.py:32,197),
Attention (common/parts.py:9), SequenceEmbedding (common/other.py:17), and
the autoregressive GreedySearch/BeamSearch generators (common/search.py:14,88).

TPU-first shape: GRU steps run under lax.scan with static lengths + masks;
the autoregressive generators scan over a fixed max_len with finished-beam
freezing (no dynamic shapes, batch > 1 throughout — the reference's
generators are batch-capable too but eager).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vietasr_tpu.models.layers import xavier_uniform


def _gru_init(rng, in_dim: int, hidden: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "wi": xavier_uniform(k1, (in_dim, 3 * hidden), in_dim, 3 * hidden),
        "wh": xavier_uniform(k2, (hidden, 3 * hidden), hidden, 3 * hidden),
        "bi": jnp.zeros((3 * hidden,), jnp.float32),
        "bh": jnp.zeros((3 * hidden,), jnp.float32),
    }


def _gru_step(p, h, x):
    """Standard GRU cell (torch gate ordering: reset, update, new)."""
    gi = x @ p["wi"] + p["bi"]
    gh = h @ p["wh"] + p["bh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def init_encoder_rnn(rng, in_dim: int, hidden: int):
    return {"gru": _gru_init(rng, in_dim, hidden)}


def encoder_rnn_apply(params, x, lengths):
    """x (B, T, D) -> (outputs (B, T, H), final_state (B, H)); padded steps
    hold the state (masked scan)."""
    b, t, _ = x.shape
    hidden = params["gru"]["wh"].shape[0]

    def step(h, inp):
        x_t, valid = inp
        h_new = _gru_step(params["gru"], h, x_t)
        h = jnp.where(valid[:, None], h_new, h)
        return h, h

    valid = (jnp.arange(t)[None, :] < lengths[:, None]).T       # (T, B)
    h0 = jnp.zeros((b, hidden), x.dtype)
    h_final, outs = jax.lax.scan(step, h0, (jnp.swapaxes(x, 0, 1), valid))
    return jnp.swapaxes(outs, 0, 1), h_final


def init_attention(rng, hidden: int):
    return {"w": xavier_uniform(rng, (hidden, hidden), hidden, hidden)}


def attention_apply(params, query, keys, key_lengths):
    """Luong general attention: query (B, H), keys (B, S, H) ->
    (context (B, H), weights (B, S)) with length masking
    (reference Attention, common/parts.py:9-51)."""
    scores = jnp.einsum("bh,bsh->bs", query @ params["w"], keys)
    mask = jnp.arange(keys.shape[1])[None, :] < key_lengths[:, None]
    scores = jnp.where(mask, scores, -1e30)
    weights = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum("bs,bsh->bh", weights, keys)
    return context, weights


def init_decoder_rnn(rng, vocab: int, hidden: int):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "embed": 0.1 * jax.random.normal(k1, (vocab, hidden)),
        "gru": _gru_init(k2, hidden, hidden),
        "attn": init_attention(k3, hidden),
        "out": {"w": xavier_uniform(k4, (2 * hidden, vocab),
                                    2 * hidden, vocab),
                "b": jnp.zeros((vocab,), jnp.float32)},
    }


def decoder_rnn_step(params, h, token, enc_outputs, enc_lengths):
    """One autoregressive step -> (new_h, log_probs (B, V))."""
    emb = params["embed"][token]                                # (B, H)
    h = _gru_step(params["gru"], h, emb)
    context, _ = attention_apply(params["attn"], h, enc_outputs, enc_lengths)
    logits = jnp.concatenate([h, context], axis=-1) @ params["out"]["w"] \
        + params["out"]["b"]
    return h, jax.nn.log_softmax(logits, axis=-1)


def decoder_rnn_apply(params, targets, init_state, enc_outputs, enc_lengths):
    """Teacher-forced decode: targets (B, L) -> log_probs (B, L, V)."""

    def step(h, tok):
        h, lp = decoder_rnn_step(params, h, tok, enc_outputs, enc_lengths)
        return h, lp

    _, lps = jax.lax.scan(step, init_state, jnp.swapaxes(targets, 0, 1))
    return jnp.swapaxes(lps, 0, 1)


# ---------------------------------------------------------------------------
# autoregressive generators (reference common/search.py)


def greedy_generate(params, init_state, enc_outputs, enc_lengths, *,
                    bos_id: int, eos_id: int, max_len: int):
    """GreedySearch equivalent: (tokens (B, max_len), lengths (B,))."""
    b = enc_outputs.shape[0]

    def step(carry, _):
        h, tok, done, length = carry
        h_new, lp = decoder_rnn_step(params, h, tok, enc_outputs,
                                     enc_lengths)
        nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        h = jnp.where(done[:, None], h, h_new)
        new_done = done | (nxt == eos_id)
        length = length + jnp.where(done, 0, 1)
        return (h, nxt, new_done, length), nxt

    init = (init_state, jnp.full((b,), bos_id, jnp.int32),
            jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32))
    (_, _, _, lengths), toks = jax.lax.scan(step, init, None,
                                            length=max_len)
    return jnp.swapaxes(toks, 0, 1), lengths


def beam_generate(params, init_state, enc_outputs, enc_lengths, *,
                  bos_id: int, eos_id: int, max_len: int, beam_width: int,
                  len_penalty: float = 0.0):
    """BeamSearch equivalent: returns the best (tokens (B, max_len),
    scores (B,)). Beams are a flattened (B*W) batch under one scan."""
    b, s, h_dim = enc_outputs.shape
    w = beam_width
    vocab = params["out"]["b"].shape[0]

    def tile(x):
        return jnp.repeat(x, w, axis=0)

    enc_t = tile(enc_outputs)
    len_t = tile(enc_lengths)
    h0 = tile(init_state)
    # beam 0 live, others dead so the first expansion seeds distinct tokens
    scores0 = jnp.tile(jnp.asarray([0.0] + [-1e30] * (w - 1)), b)

    def step(carry, t):
        h, tok, scores, done, toks_so_far = carry
        h_new, lp = decoder_rnn_step(params, h, tok, enc_t, len_t)  # (BW, V)
        lp = jnp.where(done[:, None],
                       jax.nn.one_hot(eos_id, vocab) * 0.0
                       + jnp.where(jnp.arange(vocab) == eos_id, 0.0, -1e30),
                       lp)
        cand = scores[:, None] + lp                                # (BW, V)
        cand = cand.reshape(b, w * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, w)               # (B, W)
        parent = top_idx // vocab                                  # (B, W)
        token = (top_idx % vocab).astype(jnp.int32)
        flat_parent = (parent
                       + jnp.arange(b)[:, None] * w).reshape(b * w)
        h = jnp.where(done[flat_parent][:, None], h[flat_parent],
                      h_new[flat_parent])
        new_done = done[flat_parent] | (token.reshape(-1) == eos_id)
        toks_so_far = toks_so_far[flat_parent].at[:, t].set(
            token.reshape(-1))
        return (h, token.reshape(-1), top_scores.reshape(-1), new_done,
                toks_so_far), None

    init = (h0, jnp.full((b * w,), bos_id, jnp.int32), scores0,
            jnp.zeros((b * w,), bool),
            jnp.zeros((b * w, max_len), jnp.int32))
    (h, tok, scores, done, toks), _ = jax.lax.scan(
        step, init, jnp.arange(max_len))

    lengths = jnp.sum((toks != eos_id) & (toks != 0), axis=1)
    if len_penalty:
        scores = scores / ((lengths.astype(jnp.float32) + 1e-6)
                           ** len_penalty)
    scores = scores.reshape(b, w)
    best = jnp.argmax(scores, axis=1)
    toks = toks.reshape(b, w, max_len)
    return (jnp.take_along_axis(toks, best[:, None, None], axis=1)[:, 0],
            jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0])


# ---------------------------------------------------------------------------
# LAS glue: Jasper/QuartzNet encoder -> RNN decoder bridge


def init_jasper_rnn_connector(rng, in_channels: int, out_channels: int):
    """1x1 conv + BatchNorm bridging encoder features to the seq2seq
    hidden size (reference JasperRNNConnector,
    /root/reference/nemo/collections/asr/las/misc.py:11-59)."""
    k = xavier_uniform(rng, (in_channels, out_channels),
                       fan_in=in_channels, fan_out=out_channels)
    return {
        "w": k,
        "b": jnp.zeros((out_channels,), jnp.float32),
        "scale": jnp.ones((out_channels,), jnp.float32),
        "bias": jnp.zeros((out_channels,), jnp.float32),
        "mean": jnp.zeros((out_channels,), jnp.float32),
        "var": jnp.ones((out_channels,), jnp.float32),
    }


def jasper_rnn_connector_apply(params, feats, lengths, *,
                               training: bool = False, momentum: float = 0.9,
                               eps: float = 1e-5):
    """(B, T, C_in) encoder features -> (B, T, C_out) for the RNN decoder.

    The reference applies Conv1d(k=1) + BatchNorm1d then transposes to
    (B, T, D); here features are already time-major (NWC) so the 1x1 conv
    is a matmul. BatchNorm statistics are masked to valid frames. Returns
    (out, new_params) — new_params carries updated running stats when
    training (pass the result back in, pure-functional style).
    """
    x = jnp.einsum("btc,cd->btd", feats, params["w"]) + params["b"]
    mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])[..., None]
    if training:
        n = jnp.maximum(jnp.sum(mask), 1).astype(jnp.float32)
        mean = jnp.sum(jnp.where(mask, x, 0.0), axis=(0, 1)) / n
        var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0), axis=(0, 1)) / n
        new_params = dict(params)
        new_params["mean"] = momentum * params["mean"] + (1 - momentum) * mean
        new_params["var"] = momentum * params["var"] + (1 - momentum) * var
    else:
        mean, var = params["mean"], params["var"]
        new_params = params
    x = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] \
        + params["bias"]
    return jnp.where(mask, x, 0.0), new_params


def las_evaluate(generated_ids, target_texts, labels, *, eos_id: int,
                 pad_id: int = 0):
    """WER/CER over autoregressive generations (reference las/helpers.py
    process_evaluation_batch/epoch, reduced to the metrics that matter:
    decode ids up to EOS, corpus WER + CER against the target texts)."""
    import numpy as np

    from vietasr_tpu.train.metrics import word_error_rate

    ids = np.asarray(generated_ids)
    hyps = []
    for row in ids:
        chars = []
        for t in row:
            if int(t) == eos_id:
                break
            if int(t) == pad_id:
                continue
            if 0 <= int(t) < len(labels):
                chars.append(labels[int(t)])
        hyps.append("".join(chars))
    return {
        "wer": word_error_rate(hyps, list(target_texts), use_cer=False),
        "cer": word_error_rate(hyps, list(target_texts), use_cer=True),
        "hypotheses": hyps,
    }
