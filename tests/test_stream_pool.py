"""Multi-stream pool: vmapped streaming must match single-stream results,
slots must be isolated, and incremental greedy must match offline collapse."""

import numpy as np
import pytest

import jax

from vietasr_tpu.serve.streams import IncrementalGreedy, StreamPool
from vietasr_tpu.streaming_online import OnlineTranscriber

from test_streaming_online import small_model


def test_incremental_greedy_matches_batch_collapse():
    from vietasr_tpu.ops.greedy import ctc_collapse

    rng = np.random.RandomState(0)
    lp = rng.randn(40, 5).astype(np.float32)
    inc = IncrementalGreedy(["a", "b", "c", " "], blank=4)
    for i in range(0, 40, 7):
        inc.feed(lp[i:i + 7])
    want = ctc_collapse(np.argmax(lp, -1), blank=4)
    assert inc.ids == want


@pytest.fixture(scope="module")
def pool_setup():
    cfg, variables = small_model(normalize="")
    ot = OnlineTranscriber(cfg, variables, causal_norm=False)
    return cfg, ot


def test_pool_matches_single_stream(pool_setup):
    cfg, ot = pool_setup
    pool = StreamPool(ot, slots=4, chunk_samples=3200)
    rng = np.random.RandomState(0)
    sig_a = (rng.randn(16000) * 0.1).astype(np.float32)
    sig_b = (rng.randn(16000) * 0.1).astype(np.float32)

    # single-stream references
    chunks_a = [sig_a[i:i + 3200] for i in range(0, 16000, 3200)]
    chunks_b = [sig_b[i:i + 3200] for i in range(0, 16000, 3200)]
    ref_a = ot.stream(chunks_a)
    ref_b = ot.stream(chunks_b)

    sa = pool.open()
    sb = pool.open()
    assert sa != sb
    outs_a, outs_b = [], []
    state_lp = {sa: [], sb: []}
    for ca, cb in zip(chunks_a, chunks_b):
        pool.feed({sa: ca, sb: cb})
    # compare via decoder ids after full feed: replay reference through
    # IncrementalGreedy on the dropped-prefix frames
    ref_dec_a = IncrementalGreedy(cfg.labels, cfg.num_classes)
    ref_dec_a.feed(ref_a)
    ref_dec_b = IncrementalGreedy(cfg.labels, cfg.num_classes)
    ref_dec_b.feed(ref_b)
    assert pool.decoders[sa].ids == ref_dec_a.ids
    assert pool.decoders[sb].ids == ref_dec_b.ids

    t_a = pool.close(sa)
    assert t_a == ref_dec_a.text
    # slot reuse after close resets state
    sc = pool.open()
    assert sc == sa
    for ca in chunks_a:
        pool.feed({sc: ca})
    assert pool.decoders[sc].ids == ref_dec_a.ids


def test_pool_int16_wire_format_matches_float(pool_setup):
    """Raw PCM16 chunks (the websocket wire format) ship to the device
    unscaled and must decode identically to pre-scaled float chunks."""
    cfg, ot = pool_setup
    pool = StreamPool(ot, slots=2, chunk_samples=3200)
    rng = np.random.RandomState(7)
    pcm = (rng.randn(16000) * 3000).astype(np.int16)
    chunks_i = [pcm[i:i + 3200] for i in range(0, 16000, 3200)]
    chunks_f = [c.astype(np.float32) / 32768.0 for c in chunks_i]

    si = pool.open()
    for c in chunks_i:
        pool.feed({si: c})
    ids_i = list(pool.decoders[si].ids)
    pool.close(si)

    sf = pool.open()
    for c in chunks_f:
        pool.feed({sf: c})
    assert pool.decoders[sf].ids == ids_i
    # mixed dtypes in one tick promote int16 on host, same result
    pool.close(sf)
    sa, sb = pool.open(), pool.open()
    out = pool.feed({sa: chunks_i[0], sb: chunks_f[0]})
    assert set(out) == {sa, sb}


def test_pool_ulaw_wire_format_matches_int16(pool_setup):
    """uint8 G.711 mu-law chunks (8x fewer wire bytes) decode ON DEVICE
    and must produce the same ids as feeding the decoded PCM16."""
    from vietasr_tpu.audio.g711 import ulaw_decode, ulaw_encode

    cfg, ot = pool_setup
    pool = StreamPool(ot, slots=2, chunk_samples=3200)
    rng = np.random.RandomState(9)
    codes = ulaw_encode((rng.randn(16000) * 3000).astype(np.int16))
    pcm = ulaw_decode(codes)
    chunks_u = [codes[i:i + 3200] for i in range(0, 16000, 3200)]
    chunks_i = [pcm[i:i + 3200] for i in range(0, 16000, 3200)]

    su = pool.open()
    for c in chunks_u:
        pool.feed({su: c})
    ids_u = list(pool.decoders[su].ids)
    pool.close(su)

    si = pool.open()
    for c in chunks_i:
        pool.feed({si: c})
    assert pool.decoders[si].ids == ids_u
    pool.close(si)


def test_pool_alaw_wire_format(pool_setup):
    from vietasr_tpu.audio.g711 import alaw_decode, alaw_encode

    cfg, ot = pool_setup
    pool = StreamPool(ot, slots=2, chunk_samples=3200,
                      wire_encoding="alaw")
    rng = np.random.RandomState(11)
    codes = alaw_encode((rng.randn(6400) * 3000).astype(np.int16))
    pcm = alaw_decode(codes)

    su = pool.open()
    for i in range(0, 6400, 3200):
        pool.feed({su: codes[i:i + 3200]})
    ids_u = list(pool.decoders[su].ids)
    pool.close(su)

    si = pool.open()
    for i in range(0, 6400, 3200):
        pool.feed({si: pcm[i:i + 3200]})
    assert pool.decoders[si].ids == ids_u
    pool.close(si)

    with pytest.raises(ValueError, match="wire_encoding"):
        StreamPool(ot, slots=1, wire_encoding="opus")


def test_pool_beam_decoder_with_word_lm(tmp_path):
    """decoder='beam' + lm_path builds the DEVICE beam with fused word-LM
    tables (the CLI serve path: --stream-decoder beam --lm-path ...).
    Needs a space label — word completion is what the LM scores."""
    from vietasr_tpu.ops.lm import train_ngram_arpa

    cfg, variables = small_model(normalize="", labels=("a", "b", "c", " "))
    ot = OnlineTranscriber(cfg, variables, causal_norm=False)
    arpa = tmp_path / "w.arpa"
    words = [" ".join(cfg.labels[0] * 2 for _ in range(3))] * 4
    train_ngram_arpa(words, str(arpa), order=3, char_level=False)
    pool = StreamPool(ot, slots=2, chunk_samples=3200, decoder="beam",
                      lm_path=str(arpa), beam_width=8,
                      lm_alpha=0.4, lm_beta=1.0)
    assert pool._dsb is not None
    assert pool._dsb.word_lm is not None     # tables, not a host NGramLM
    assert pool._dsb.alpha == 0.4 and pool._dsb.beta == 1.0
    s = pool.open()
    rng = np.random.RandomState(3)
    for i in range(3):
        pool.feed({s: (rng.randn(3200) * 0.1).astype(np.float32)})
    assert isinstance(pool.close(s), str)


def test_pool_beam_host_decoder_with_word_lm(pool_setup, tmp_path):
    """decoder='beam_host' keeps the per-slot IncrementalBeam tier."""
    from vietasr_tpu.ops.lm import train_ngram_arpa
    from vietasr_tpu.serve.streams import IncrementalBeam

    cfg, ot = pool_setup
    arpa = tmp_path / "w.arpa"
    words = [" ".join(cfg.labels[0] * 2 for _ in range(3))] * 4
    train_ngram_arpa(words, str(arpa), order=3, char_level=False)
    pool = StreamPool(ot, slots=2, chunk_samples=3200, decoder="beam_host",
                      lm_path=str(arpa), beam_width=8,
                      lm_alpha=0.4, lm_beta=1.0)
    assert pool._lm is not None
    s = pool.open()
    dec = pool.decoders[s]
    assert isinstance(dec, IncrementalBeam)
    assert dec._dec.lm is pool._lm
    assert dec._dec.alpha == 0.4 and dec._dec.beta == 1.0
    rng = np.random.RandomState(3)
    for i in range(3):
        pool.feed({s: (rng.randn(3200) * 0.1).astype(np.float32)})
    assert isinstance(pool.close(s), str)


def test_pool_capacity_and_bad_chunk(pool_setup):
    _, ot = pool_setup
    pool = StreamPool(ot, slots=2, chunk_samples=3200)
    s1, s2 = pool.open(), pool.open()
    assert pool.open() is None          # full
    with pytest.raises(ValueError, match="exactly"):
        pool.feed({s1: np.zeros(100, np.float32)})
    pool.close(s1)
    assert pool.open() is not None      # freed
