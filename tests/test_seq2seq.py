"""Seq2seq infra: GRU parity vs torch, attention masking, teacher forcing,
greedy/beam generators (incl. a copy-task convergence check)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from vietasr_tpu.models.seq2seq import (
    attention_apply,
    beam_generate,
    decoder_rnn_apply,
    encoder_rnn_apply,
    greedy_generate,
    init_attention,
    init_decoder_rnn,
    init_encoder_rnn,
)
from vietasr_tpu.ops.losses import sequence_loss


def test_gru_matches_torch():
    rng = np.random.RandomState(0)
    b, t, d, h = 2, 6, 4, 8
    params = init_encoder_rnn(jax.random.PRNGKey(0), d, h)
    x = rng.randn(b, t, d).astype(np.float32)
    lens = np.array([t, t], np.int32)
    outs, final = encoder_rnn_apply(params, jnp.asarray(x),
                                    jnp.asarray(lens))

    cell = torch.nn.GRU(d, h, batch_first=True)
    sd = {
        "weight_ih_l0": torch.tensor(np.asarray(params["gru"]["wi"]).T),
        "weight_hh_l0": torch.tensor(np.asarray(params["gru"]["wh"]).T),
        "bias_ih_l0": torch.tensor(np.asarray(params["gru"]["bi"])),
        "bias_hh_l0": torch.tensor(np.asarray(params["gru"]["bh"])),
    }
    cell.load_state_dict(sd)
    with torch.no_grad():
        want, want_h = cell(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(outs), want.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), want_h[0].numpy(),
                               atol=1e-5)


def test_encoder_masks_padding():
    params = init_encoder_rnn(jax.random.PRNGKey(1), 4, 8)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 10, 4).astype(np.float32)
    full, h_full = encoder_rnn_apply(params, jnp.asarray(x),
                                     jnp.array([6]))
    short, h_short = encoder_rnn_apply(params, jnp.asarray(x[:, :6]),
                                       jnp.array([6]))
    np.testing.assert_allclose(np.asarray(h_full), np.asarray(h_short),
                               atol=1e-6)


def test_attention_masks_and_normalizes():
    params = init_attention(jax.random.PRNGKey(2), 8)
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    keys = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    ctx, w = attention_apply(params, q, keys, jnp.array([5, 2]))
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-6)
    assert np.all(np.asarray(w)[1, 2:] < 1e-9)


@pytest.fixture(scope="module")
def copy_model():
    """Train a tiny seq2seq on the copy task (input ids -> same ids)."""
    vocab, hidden, length = 8, 32, 5
    bos, eos = 1, 2
    rng_np = np.random.RandomState(0)
    enc_p = init_encoder_rnn(jax.random.PRNGKey(0), hidden, hidden)
    dec_p = init_decoder_rnn(jax.random.PRNGKey(1), vocab, hidden)
    emb = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (vocab, hidden))
    params = {"enc": enc_p, "dec": dec_p, "in_emb": emb}

    def make_batch(b=16):
        seq = rng_np.randint(3, vocab, size=(b, length)).astype(np.int32)
        return jnp.asarray(seq)

    def loss_fn(params, seq):
        x = params["in_emb"][seq]
        lens = jnp.full((seq.shape[0],), seq.shape[1], jnp.int32)
        enc_out, h = encoder_rnn_apply(params["enc"], x, lens)
        tgt_in = jnp.concatenate(
            [jnp.full((seq.shape[0], 1), 1, jnp.int32), seq[:, :-1]], axis=1)
        lps = decoder_rnn_apply(params["dec"], tgt_in, h, enc_out, lens)
        return sequence_loss(lps, seq, lens, pad_id=0)

    opt = optax.adam(5e-3)
    state = opt.init(params)
    step = jax.jit(lambda p, s, batch: _update(p, s, batch, loss_fn, opt))
    for i in range(150):
        params, state, loss = step(params, state, make_batch())
    assert float(loss) < 0.3, float(loss)
    return params, vocab, length, bos, eos


def _update(params, state, batch, loss_fn, opt):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch)
    updates, state = opt.update(grads, state, params)
    return optax.apply_updates(params, updates), state, loss


def test_greedy_generate_copies(copy_model):
    params, vocab, length, bos, eos = copy_model
    rng = np.random.RandomState(7)
    seq = jnp.asarray(rng.randint(3, vocab, size=(4, length)).astype(np.int32))
    x = params["in_emb"][seq]
    lens = jnp.full((4,), length, jnp.int32)
    enc_out, h = encoder_rnn_apply(params["enc"], x, lens)
    toks, out_lens = greedy_generate(params["dec"], h, enc_out, lens,
                                     bos_id=bos, eos_id=eos,
                                     max_len=length)
    acc = float(jnp.mean((toks[:, :length] == seq).astype(jnp.float32)))
    assert acc > 0.8, acc


def test_beam_generate_at_least_greedy(copy_model):
    params, vocab, length, bos, eos = copy_model
    rng = np.random.RandomState(8)
    seq = jnp.asarray(rng.randint(3, vocab, size=(4, length)).astype(np.int32))
    x = params["in_emb"][seq]
    lens = jnp.full((4,), length, jnp.int32)
    enc_out, h = encoder_rnn_apply(params["enc"], x, lens)
    toks, scores = beam_generate(params["dec"], h, enc_out, lens,
                                 bos_id=bos, eos_id=eos, max_len=length,
                                 beam_width=4)
    acc = float(jnp.mean((toks[:, :length] == seq).astype(jnp.float32)))
    assert acc > 0.8, acc
    assert np.isfinite(np.asarray(scores)).all()


# ---------------------------------------------------------------------------
# LAS glue: encoder-features -> connector -> decoder (las/misc.py:11)


def test_jasper_rnn_connector_shapes_and_masking():
    from vietasr_tpu.models.seq2seq import (init_jasper_rnn_connector,
                                            jasper_rnn_connector_apply)

    p = init_jasper_rnn_connector(jax.random.PRNGKey(0), 12, 8)
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 12))
    lens = jnp.asarray([10, 6, 0])
    out, p2 = jasper_rnn_connector_apply(p, feats, lens, training=True)
    assert out.shape == (3, 10, 8)
    # padding frames are zeroed
    assert float(jnp.abs(out[1, 6:]).max()) == 0.0
    assert float(jnp.abs(out[2]).max()) == 0.0
    # running stats moved
    assert float(jnp.abs(p2["mean"]).max()) > 0.0
    # inference mode uses running stats, leaves params untouched
    out_eval, p3 = jasper_rnn_connector_apply(p2, feats, lens, training=False)
    assert p3 is p2
    assert out_eval.shape == (3, 10, 8)


@pytest.mark.slow
def test_las_end_to_end_convergence():
    """Acoustic-ish features -> connector -> attention decoder memorizes a
    tiny labelled set (the LAS experiment wiring, las/misc.py + helpers)."""
    from vietasr_tpu.models.seq2seq import (init_jasper_rnn_connector,
                                            jasper_rnn_connector_apply,
                                            las_evaluate)

    vocab, hidden, t_len, y_len, b = 8, 24, 12, 4, 8
    bos, eos = 1, 2
    rng = np.random.RandomState(0)
    # fixed "acoustic" features per class-sequence sample
    feats_np = rng.randn(b, t_len, 10).astype(np.float32)
    targets_np = rng.randint(3, vocab, size=(b, y_len)).astype(np.int32)
    feats = jnp.asarray(feats_np)
    targets = jnp.asarray(targets_np)
    lens = jnp.full((b,), t_len, jnp.int32)
    tlens = jnp.full((b,), y_len, jnp.int32)

    params = {
        "conn": init_jasper_rnn_connector(jax.random.PRNGKey(0), 10, hidden),
        "dec": init_decoder_rnn(jax.random.PRNGKey(1), vocab, hidden),
    }

    def loss_fn(params, feats):
        enc_out, _ = jasper_rnn_connector_apply(params["conn"], feats, lens,
                                                training=False)
        h0 = jnp.mean(enc_out, axis=1)
        tgt_in = jnp.concatenate(
            [jnp.full((b, 1), bos, jnp.int32), targets[:, :-1]], axis=1)
        lps = decoder_rnn_apply(params["dec"], tgt_in, h0, enc_out, lens)
        return sequence_loss(lps, targets, tlens, pad_id=0)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = jax.jit(lambda p, s: _update(p, s, feats, loss_fn, opt))
    for _ in range(200):
        params, state, loss = step(params, state)
    assert float(loss) < 0.2, float(loss)

    enc_out, _ = jasper_rnn_connector_apply(params["conn"], feats, lens,
                                            training=False)
    h0 = jnp.mean(enc_out, axis=1)
    gen, _ = greedy_generate(params["dec"], h0, enc_out, lens,
                             bos_id=bos, eos_id=eos, max_len=y_len)
    labels = [str(i) for i in range(vocab)]
    refs = ["".join(str(int(c)) for c in row) for row in targets_np]
    result = las_evaluate(gen, refs, labels, eos_id=eos)
    assert result["cer"] < 0.1, result
