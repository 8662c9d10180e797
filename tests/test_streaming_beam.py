"""Streaming beam search: chunked feeding must equal whole-utterance
decoding, and the StreamPool beam decoder must match it."""

import numpy as np
import pytest

from vietasr_tpu.ops.beam_search import StreamingPrefixBeam, prefix_beam_search
from vietasr_tpu.ops.lm import NGramLM, train_ngram_arpa
from vietasr_tpu.serve.streams import IncrementalBeam, StreamPool
from vietasr_tpu.streaming_online import OnlineTranscriber

from test_streaming_online import small_model


@pytest.mark.parametrize("seed", range(3))
def test_chunked_feed_equals_whole(seed):
    rng = np.random.RandomState(seed)
    labels = ["a", "b", "c", " "]
    t, v1 = 30, 5
    logits = rng.randn(t, v1).astype(np.float32) * 2
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    want = prefix_beam_search(lp, labels, beam_width=32,
                              token_min_logp=-50.0)
    dec = StreamingPrefixBeam(labels, beam_width=32, token_min_logp=-50.0)
    for i in range(0, t, 7):
        dec.feed(lp[i:i + 7])
    assert dec.best() == want


def test_chunked_feed_with_lm(tmp_path):
    corpus = ["ab ba", "ba ab", "abab"] * 3
    arpa = str(tmp_path / "lm.arpa")
    train_ngram_arpa(corpus, arpa, order=2)
    lm = NGramLM(arpa)
    rng = np.random.RandomState(5)
    labels = ["a", "b", " "]
    logits = rng.randn(12, 4).astype(np.float32) * 2
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    want = prefix_beam_search(lp, labels, beam_width=32, lm=lm, alpha=0.7,
                              beta=0.5, token_min_logp=-50.0)
    dec = StreamingPrefixBeam(labels, beam_width=32, lm=lm, alpha=0.7,
                              beta=0.5, token_min_logp=-50.0)
    dec.feed(lp[:5])
    dec.feed(lp[5:])
    assert dec.best() == want


def test_incremental_beam_revisions_consistent():
    rng = np.random.RandomState(1)
    labels = ["a", "b", "c", " "]
    logits = rng.randn(20, 5).astype(np.float32) * 2
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    inc = IncrementalBeam(labels, blank=4, beam_width=32)
    emitted = ""
    for i in range(0, 20, 4):
        delta = inc.feed(lp[i:i + 4])
        if delta.startswith("\r"):
            emitted = delta[1:]
        else:
            emitted += delta
    assert emitted == inc.text
    assert inc.text == prefix_beam_search(lp, labels, beam_width=32)


def test_pool_with_beam_decoder():
    """decoder='beam' is now the batched ON-DEVICE beam: the pool's final
    transcript must equal the offline device beam over the emitted
    frames (ops/streaming_beam.py carries state across chunks)."""
    from vietasr_tpu.ops.device_beam import device_beam_transcripts

    cfg, variables = small_model(normalize="")
    ot = OnlineTranscriber(cfg, variables, causal_norm=False)
    pool = StreamPool(ot, slots=2, chunk_samples=3200, decoder="beam",
                      beam_width=16)
    rng = np.random.RandomState(0)
    sig = (rng.randn(16000) * 0.1).astype(np.float32)
    chunks = [sig[i:i + 3200] for i in range(0, 16000, 3200)]
    slot = pool.open()
    for c in chunks:
        pool.feed({slot: c})
    frames = np.asarray(ot.stream(chunks))
    space = cfg.labels.index(" ") if " " in cfg.labels else -1
    want = device_beam_transcripts(
        frames[None], np.array([frames.shape[0]], np.int32), cfg.labels,
        impl="xla", beam_width=16, cutoff_top_n=8, space=space)
    assert pool.close(slot) == want[0]


def test_pool_with_host_beam_decoder():
    """decoder='beam_host' keeps the legacy per-slot Python prefix beam
    (parity tier)."""
    cfg, variables = small_model(normalize="")
    ot = OnlineTranscriber(cfg, variables, causal_norm=False)
    pool = StreamPool(ot, slots=2, chunk_samples=3200, decoder="beam_host",
                      beam_width=16)
    rng = np.random.RandomState(0)
    sig = (rng.randn(16000) * 0.1).astype(np.float32)
    chunks = [sig[i:i + 3200] for i in range(0, 16000, 3200)]
    slot = pool.open()
    for c in chunks:
        pool.feed({slot: c})
    frames = ot.stream(chunks)
    want = prefix_beam_search(frames, cfg.labels,
                              beam_width=16)
    assert pool.decoders[slot].text == want
    pool.close(slot)
