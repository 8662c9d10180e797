"""On-device streaming beam (ops/streaming_beam.py): chunk-carried state
must reproduce the offline device beam search exactly, word-LM fusion
included, and slot lifecycle (reset) must isolate sessions."""

import numpy as np
import pytest

from vietasr_tpu.ops.device_beam import device_beam_transcripts
from vietasr_tpu.ops.lm import load_lm, train_ngram_arpa, word_lm_tables
from vietasr_tpu.ops.streaming_beam import DeviceStreamingBeam

LABELS = ["a", "b", "c", " "]
BLANK = len(LABELS)
SPACE = LABELS.index(" ")


def _rand_lp(rng, bsz, t, v1, scale=2.0):
    logits = rng.randn(bsz, t, v1).astype(np.float32) * scale
    return np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))


def _stream_texts(beam, lp, chunk):
    bsz, t, _ = lp.shape
    carry = beam.init(bsz)
    ids = lens = None
    for i in range(0, t, chunk):
        carry, ids, lens = beam.chunk(carry, lp[:, i:i + chunk])
    return [beam.render(LABELS, np.asarray(ids)[b], int(lens[b]))
            for b in range(bsz)]


@pytest.mark.parametrize("seed,chunk", [(0, 5), (1, 8), (2, 40)])
def test_chunked_equals_offline(seed, chunk):
    rng = np.random.RandomState(seed)
    lp = _rand_lp(rng, 3, 40, BLANK + 1)
    beam = DeviceStreamingBeam(blank=BLANK, beam_width=16, space=SPACE,
                               cutoff_top_n=4)
    got = _stream_texts(beam, lp, chunk)
    want = device_beam_transcripts(
        lp, np.full(3, 40, np.int32), LABELS, impl="xla", beam_width=16,
        space=SPACE, cutoff_top_n=4)
    assert got == want


def test_chunked_equals_offline_with_word_lm(tmp_path):
    corpus = ["ab cab ba", "ab ba", "cab ab ba c", "ba cab", "c ab"] * 2
    arpa = tmp_path / "w.arpa"
    train_ngram_arpa(corpus, str(arpa), order=3, char_level=False)
    tables, _ = word_lm_tables(load_lm(str(arpa)), LABELS)
    rng = np.random.RandomState(7)
    lp = _rand_lp(rng, 2, 36, BLANK + 1)
    beam = DeviceStreamingBeam(blank=BLANK, beam_width=16, space=SPACE,
                               cutoff_top_n=4, word_lm=tables,
                               alpha=0.5, beta=1.5)
    got = _stream_texts(beam, lp, 9)
    want = device_beam_transcripts(
        lp, np.full(2, 36, np.int32), LABELS, impl="xla", beam_width=16,
        space=SPACE, cutoff_top_n=4, word_lm=tables, alpha=0.5, beta=1.5)
    assert got == want


@pytest.mark.slow
def test_reset_rows_isolates_slots():
    rng = np.random.RandomState(3)
    lp1 = _rand_lp(rng, 2, 20, BLANK + 1)
    beam = DeviceStreamingBeam(blank=BLANK, beam_width=8, space=SPACE,
                               cutoff_top_n=4)
    carry = beam.init(2)
    carry, _, _ = beam.chunk(carry, lp1)
    # reset slot 0 only, then decode fresh audio on it; slot 1 keeps going
    carry = beam.reset_rows(carry, np.array([True, False]))
    assert int(carry.lens[0].max()) == 0
    assert int(carry.lens[1].max()) >= 0
    lp2 = _rand_lp(rng, 2, 20, BLANK + 1)
    carry, ids, lens = beam.chunk(carry, lp2)
    # slot 0's transcript must equal a fresh offline decode of lp2[0]
    want = device_beam_transcripts(
        lp2[:1], np.full(1, 20, np.int32), LABELS, impl="xla",
        beam_width=8, space=SPACE, cutoff_top_n=4)
    got0 = beam.render(LABELS, np.asarray(ids)[0], int(lens[0]))
    assert got0 == want[0]


def test_partials_are_monotone_refinements():
    """Across chunks the best hypothesis evolves; every returned partial
    renders cleanly and the final one matches offline."""
    rng = np.random.RandomState(11)
    lp = _rand_lp(rng, 1, 48, BLANK + 1)
    beam = DeviceStreamingBeam(blank=BLANK, beam_width=16, space=SPACE,
                               cutoff_top_n=4)
    carry = beam.init(1)
    partials = []
    for i in range(0, 48, 8):
        carry, ids, lens = beam.chunk(carry, lp[:, i:i + 8])
        partials.append(beam.render(LABELS, np.asarray(ids)[0],
                                    int(lens[0])))
    want = device_beam_transcripts(
        lp, np.full(1, 48, np.int32), LABELS, impl="xla", beam_width=16,
        space=SPACE, cutoff_top_n=4)
    assert partials[-1] == want[0]
    assert all(isinstance(p, str) for p in partials)
