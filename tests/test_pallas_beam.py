"""Fused Pallas beam kernel (ops/pallas_beam.py) must be output-identical
to the XLA scan path (ops/device_beam.py) — same prefixes, same lengths —
and therefore inherit all of the XLA path's oracle guarantees.

Runs the kernel in Pallas interpret mode on the CPU test backend; the
compiled TPU path was additionally spot-checked bit-identical on a real
v5e chip (docs/rooflines.md §3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vietasr_tpu.ops.beam_search import prefix_beam_search
from vietasr_tpu.ops.device_beam import (device_beam_search,
                                         device_beam_transcripts)
from vietasr_tpu.ops.lm import NGramLM, train_ngram_arpa, word_lm_tables
from vietasr_tpu.ops.pallas_beam import (dense_lm_from_tables,
                                         pallas_beam_search)


def softmax_logs(rng, t, v, scale=2.0):
    logits = rng.randn(t, v).astype(np.float32) * scale
    return np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))


LABELS = ["a", "b", "c", " "]
SPACE = LABELS.index(" ")


@pytest.fixture(scope="module")
def word_lm(tmp_path_factory):
    corpus = ["ab cab ba", "ab ba", "cab ab ba c", "ba cab", "c ab"] * 2
    p = tmp_path_factory.mktemp("pwlm") / "word.arpa"
    train_ngram_arpa(corpus, str(p), order=3, char_level=False)
    return NGramLM(str(p))


def run_both(lp, lens, *, dense=None, tables=None, probes=None, **kw):
    """Run XLA scan path and Pallas kernel on identical inputs."""
    xkw = dict(kw)
    xkw.pop("unk_logp", None)  # XLA path reads unk from the tables
    if tables is not None:
        xkw.update(word_lm=tables, wlm_probes=probes)
    ids_x, len_x = device_beam_search(
        jnp.asarray(lp), jnp.asarray(lens), blank=len(LABELS), **xkw)
    pkw = dict(kw)
    if dense is not None:
        pkw.update(dense_lm=dense)
    ids_p, len_p = pallas_beam_search(
        jnp.asarray(lp), jnp.asarray(lens), blank=len(LABELS),
        interpret=True, **pkw)
    return (np.asarray(ids_x), np.asarray(len_x),
            np.asarray(ids_p), np.asarray(len_p))


def assert_same_decode(ids_x, len_x, ids_p, len_p):
    np.testing.assert_array_equal(len_x, len_p)
    for b in range(ids_x.shape[0]):
        np.testing.assert_array_equal(
            ids_x[b, : len_x[b]], ids_p[b, : len_p[b]], err_msg=f"b={b}")


@pytest.mark.parametrize("seed", range(4))
def test_pallas_matches_xla_no_lm(seed):
    rng = np.random.RandomState(seed)
    t, v1 = 12, 5
    lp = np.stack([softmax_logs(rng, t, v1) for _ in range(2)])
    lens = np.array([t, t - 4])
    assert_same_decode(*run_both(
        lp, lens, beam_width=8, cutoff_top_n=3, space=SPACE))


@pytest.mark.parametrize("seed", range(3))
def test_pallas_matches_xla_word_lm(seed, word_lm):
    tables, probes = word_lm_tables(word_lm, LABELS)
    unk = float(np.asarray(tables.unk_logp))
    dense = dense_lm_from_tables(tables, unk)
    rng = np.random.RandomState(40 + seed)
    t, v1 = 14, 5
    lp = np.stack([softmax_logs(rng, t, v1, scale=1.8) for _ in range(2)])
    lens = np.array([t, 7])
    assert_same_decode(*run_both(
        lp, lens, dense=dense, tables=tables, probes=probes,
        beam_width=8, cutoff_top_n=4, space=SPACE,
        alpha=0.5, beta=1.5, unk_logp=unk))


def test_pallas_matches_host_oracle_word_lm(word_lm):
    """Anchor beyond XLA-consistency: the kernel's transcript equals the
    Python prefix-beam oracle with the same ARPA LM."""
    tables, probes = word_lm_tables(word_lm, LABELS)
    unk = float(np.asarray(tables.unk_logp))
    dense = dense_lm_from_tables(tables, unk)
    rng = np.random.RandomState(77)
    t = 14
    lp = softmax_logs(rng, t, 5, scale=1.8)
    want = prefix_beam_search(lp, LABELS, beam_width=256, lm=word_lm,
                              alpha=0.5, beta=1.5, token_min_logp=-50.0)
    ids, lens = pallas_beam_search(
        jnp.asarray(lp[None]), jnp.asarray(np.array([t])),
        blank=len(LABELS), beam_width=32, cutoff_top_n=4, space=SPACE,
        dense_lm=dense, unk_logp=unk, alpha=0.5, beta=1.5, interpret=True)
    got = "".join(LABELS[i] for i in np.asarray(ids)[0, : int(lens[0])])
    assert " ".join(got.split()) == want


@pytest.mark.parametrize("width", [
    12,
    pytest.param(50, marks=pytest.mark.slow),
    pytest.param(100, marks=pytest.mark.slow),
])
def test_pallas_matches_xla_wide_and_unaligned_widths(width, word_lm):
    """The reference's deploy widths (W=100 CLI infer.py:191, W=50 web
    app.py:27) and non-8-multiple widths must route through the blocked
    wide-W kernel paths and still match the XLA scan exactly."""
    tables, probes = word_lm_tables(word_lm, LABELS)
    unk = float(np.asarray(tables.unk_logp))
    dense = dense_lm_from_tables(tables, unk)
    rng = np.random.RandomState(900 + width)
    t, v1 = 12, 5
    lp = np.stack([softmax_logs(rng, t, v1, scale=1.5) for _ in range(2)])
    lens = np.array([t, 8])
    assert_same_decode(*run_both(
        lp, lens, dense=dense, tables=tables, probes=probes,
        beam_width=width, cutoff_top_n=3, space=SPACE,
        alpha=0.5, beta=1.5, unk_logp=unk))


@pytest.mark.parametrize("order", [
    2,
    pytest.param(4, marks=pytest.mark.slow),
    pytest.param(5, marks=pytest.mark.slow),
])
def test_pallas_matches_xla_higher_orders(order, tmp_path):
    """Fused-kernel word-LM fusion at the reference's 4/5-gram artifact
    orders (.MISSING_LARGE_BLOBS:4-6) stays bit-identical to the XLA
    scan."""
    corpus = ["ab cab ba c", "ab ba cab ba", "cab ab ba c ab",
              "ba cab ab ba", "c ab ba cab", "ab ba c cab ab"] * 2
    p = tmp_path / f"word{order}.arpa"
    train_ngram_arpa(corpus, str(p), order=order, char_level=False)
    lm = NGramLM(str(p))
    tables, probes = word_lm_tables(lm, LABELS)
    unk = float(np.asarray(tables.unk_logp))
    dense = dense_lm_from_tables(tables, unk)
    assert dense.order == order
    rng = np.random.RandomState(500 + order)
    t, v1 = 14, 5
    lp = np.stack([softmax_logs(rng, t, v1, scale=1.8) for _ in range(2)])
    lens = np.array([t, 9])
    assert_same_decode(*run_both(
        lp, lens, dense=dense, tables=tables, probes=probes,
        beam_width=16, cutoff_top_n=4, space=SPACE,
        alpha=0.5, beta=1.5, unk_logp=unk))


@pytest.mark.parametrize("width", [
    48,
    pytest.param(100, marks=pytest.mark.slow),
])
def test_pallas_wide_no_lm(width):
    rng = np.random.RandomState(width)
    t, v1 = 10, 5
    lp = np.stack([softmax_logs(rng, t, v1) for _ in range(2)])
    lens = np.array([t, t - 3])
    assert_same_decode(*run_both(
        lp, lens, beam_width=width, cutoff_top_n=3, space=SPACE))


def test_pallas_short_lengths_frozen():
    """Frames beyond each utterance's length must not change its beam."""
    rng = np.random.RandomState(5)
    t = 10
    lp = np.stack([softmax_logs(rng, t, 5) for _ in range(3)])
    lens = np.array([10, 4, 1])
    assert_same_decode(*run_both(
        lp, lens, beam_width=8, cutoff_top_n=3, space=SPACE))


def test_transcripts_impl_routing(word_lm):
    """device_beam_transcripts impl='pallas' == impl='xla' end to end."""
    tables, probes = word_lm_tables(word_lm, LABELS)
    rng = np.random.RandomState(11)
    t = 12
    lp = np.stack([softmax_logs(rng, t, 5, scale=1.8) for _ in range(2)])
    lens = np.array([12, 6])
    kw = dict(beam_width=8, cutoff_top_n=4, space=SPACE, word_lm=tables,
              wlm_probes=probes, alpha=0.5, beta=1.5)
    got_x = device_beam_transcripts(lp, lens, LABELS, impl="xla", **kw)
    got_p = device_beam_transcripts(lp, lens, LABELS, impl="pallas", **kw)
    assert got_x == got_p


def test_dense_lm_packing(word_lm):
    """Dense pack keeps exactly the occupied rows, 8-row padded, and pad
    rows can never match (key 0 / level -1)."""
    tables, _ = word_lm_tables(word_lm, LABELS)
    dense = dense_lm_from_tables(tables, float(np.asarray(tables.unk_logp)))
    n = dense.key1.shape[0]
    assert n % 8 == 0
    packed = np.asarray(tables.packed)
    occupied = int(((packed[:, 0] != 0) | (packed[:, 1] != 0)).sum())
    lv = np.asarray(dense.level)[:, 0]
    assert int((lv >= 0).sum()) == occupied
    k1 = np.asarray(dense.key1)[:, 0]
    assert (k1[lv < 0] == 0).all()


@pytest.mark.parametrize("chunk", [
    pytest.param(4, marks=pytest.mark.slow),
    8,
])
def test_pallas_chunked_lm_match_identical(chunk, word_lm):
    """Processing the dense LM table in row blocks (the large-table mode)
    must be bit-identical to the single-pass match."""
    tables, probes = word_lm_tables(word_lm, LABELS)
    unk = float(np.asarray(tables.unk_logp))
    dense = dense_lm_from_tables(tables, unk)
    assert dense.key1.shape[0] > chunk  # chunking actually engages
    rng = np.random.RandomState(123)
    t = 14
    lp = np.stack([softmax_logs(rng, t, 5, scale=1.8) for _ in range(2)])
    lens = np.array([t, 9])
    kw = dict(beam_width=8, cutoff_top_n=4, space=SPACE, blank=len(LABELS),
              dense_lm=dense, unk_logp=unk, alpha=0.5, beta=1.5,
              interpret=True)
    ids0, len0 = pallas_beam_search(
        jnp.asarray(lp), jnp.asarray(lens), lm_chunk=0, **kw)
    ids1, len1 = pallas_beam_search(
        jnp.asarray(lp), jnp.asarray(lens), lm_chunk=chunk, **kw)
    assert_same_decode(np.asarray(ids0), np.asarray(len0),
                       np.asarray(ids1), np.asarray(len1))


def test_pick_lm_chunk():
    from vietasr_tpu.ops.pallas_beam import _pick_lm_chunk
    # small tables: single pass (budget counts PADDED lanes/sublanes)
    assert _pick_lm_chunk(0, 16, 8) == 0
    assert _pick_lm_chunk(128, 16, 16) == 0
    # big tables: chunk is 8-row aligned and bounds the padded block
    for n, w, b in [(4096, 16, 8), (32768, 16, 128), (20000, 32, 16)]:
        c = _pick_lm_chunk(n, w, b)
        wp, bp = (w + 7) // 8 * 8, (b + 127) // 128 * 128
        assert c > 0 and c % 8 == 0
        assert c * wp * bp <= 1 << 18


def test_pallas_requires_space():
    lp = np.zeros((1, 4, 5), np.float32)
    with pytest.raises(ValueError, match="space"):
        pallas_beam_search(jnp.asarray(lp), jnp.asarray(np.array([4])),
                           blank=4, interpret=True)
