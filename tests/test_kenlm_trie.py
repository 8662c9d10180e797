"""KenLM TRIE / QUANT_TRIE `.binary` reader/writer (ops/kenlm_trie.py).

The reference deploys whatever `build_binary` emitted
(beam_search_decoder.py:82-87); `build_binary trie` produces the
bit-packed trie family. kenlm is not installed in this image, so
fixtures are byte-crafted by our writer from the published layout
(lm/trie.hh, util/bit_packing.hh, lm/quantize.hh) and validated by
score/reconstruction parity against the ARPA scorer — the same protocol
as the probing tests (SURVEY §2.9 "quantized-trie probability lookup").
"""

import struct

import numpy as np
import pytest

from vietasr_tpu.ops.kenlm_binary import (is_kenlm_binary,
                                          read_kenlm_binary)
from vietasr_tpu.ops.kenlm_trie import (KenLMTrie, _BitWriter,
                                        _read_bits_np, write_kenlm_trie)
from vietasr_tpu.ops.lm import (NGramLM, load_lm, train_ngram_arpa,
                                word_lm_tables)

CORPUS = ["ab cab ba", "ab ba", "cab ab ba c", "ba cab", "c ab",
          "ba ba cab", "c c ab ba"] * 2
LABELS = ["a", "b", "c", " "]


@pytest.fixture(scope="module")
def arpa(tmp_path_factory):
    p = tmp_path_factory.mktemp("ktrie") / "word.arpa"
    train_ngram_arpa(CORPUS, str(p), order=3, char_level=False)
    return str(p)


@pytest.fixture(scope="module")
def trie(arpa, tmp_path_factory):
    p = tmp_path_factory.mktemp("ktrie") / "word.trie.binary"
    write_kenlm_trie(arpa, str(p))
    return str(p)


@pytest.fixture(scope="module")
def qtrie(arpa, tmp_path_factory):
    # 8+8 bits with a small fixture: fewer distinct values than bins, so
    # quantization is EXACT and parity can be asserted tightly
    p = tmp_path_factory.mktemp("ktrie") / "word.qtrie.binary"
    write_kenlm_trie(arpa, str(p), quant_bits=(8, 8))
    return str(p)


def test_bit_packing_roundtrip():
    """LSB-first little-endian packing at arbitrary offsets (the
    util/bit_packing.hh contract the tables rely on)."""
    rng = np.random.RandomState(0)
    fields = [(int(rng.randint(0, 1 << b)), b)
              for b in [1, 7, 8, 13, 31, 32, 57, 3, 24]]
    w = _BitWriter()
    for v, b in fields:
        w.write(v, b)
    buf = np.frombuffer(w.finish(), np.uint8)
    off = 0
    for v, b in fields:
        got = _read_bits_np(buf, np.array([off], np.int64), b)[0]
        assert int(got) == v, (v, b, off)
        off += b


def test_magic_and_model_type(trie, qtrie):
    assert is_kenlm_binary(trie) and is_kenlm_binary(qtrie)
    for path, want in [(trie, 2), (qtrie, 3)]:
        with open(path, "rb") as f:
            head = f.read(108)
        (mtype,) = struct.unpack_from("<i", head, 96)
        assert mtype == want


@pytest.mark.parametrize("fixture", ["trie", "qtrie"])
def test_scores_match_arpa(fixture, request, arpa):
    """Exact hit, every backoff depth, OOV — identical to the ARPA scorer
    (f32/quant-exact fixture)."""
    ref = NGramLM(arpa)
    lm = KenLMTrie(request.getfixturevalue(fixture))
    assert lm.order == ref.order
    rng = np.random.RandomState(0)
    vocab = [w for w in ref.vocab if w not in ("<s>", "</s>", "<unk>")]
    for _ in range(200):
        n_ctx = rng.randint(0, 3)
        ctx = tuple(rng.choice(vocab + ["zz"]) for _ in range(n_ctx))
        w = rng.choice(vocab + ["qq"])
        assert lm.log_prob(w, ctx) == pytest.approx(
            ref.log_prob(w, ctx), rel=1e-5, abs=1e-5), (w, ctx)


def test_sentence_scores_match(trie, arpa):
    ref = NGramLM(arpa)
    lm = KenLMTrie(trie)
    for line in CORPUS[:5]:
        assert lm.score_sentence(line.split()) == pytest.approx(
            ref.score_sentence(line.split()), rel=1e-5, abs=1e-5)


def test_coarse_quant_error_is_bounded(arpa, tmp_path):
    """4-bit bins actually quantize (16 bins < distinct values); scores
    stay within the largest bin spread of the ARPA scores."""
    p = tmp_path / "q4.binary"
    write_kenlm_trie(arpa, str(p), quant_bits=(4, 4))
    ref = NGramLM(arpa)
    lm = KenLMTrie(str(p))
    probs = sorted(lp for lp, _ in ref.ngrams.values())
    spread = max(abs(probs[-1] - probs[0]), 1.0)
    vocab = [w for w in ref.vocab if not w.startswith("<")]
    worst = max(abs(lm.log_prob(w, (c,)) - ref.log_prob(w, (c,)))
                for w in vocab for c in vocab)
    assert worst < spread           # coarse but sane
    assert worst > 1e-7             # and it genuinely quantized


@pytest.mark.parametrize("fixture", ["trie", "qtrie"])
def test_to_ngram_lm_reconstructs_exactly(fixture, request, arpa):
    ref = NGramLM(arpa)
    rec = KenLMTrie(request.getfixturevalue(fixture)).to_ngram_lm()
    assert rec.order == ref.order
    assert set(rec.ngrams) == set(ref.ngrams)
    for g, (lp, bo) in ref.ngrams.items():
        lp2, bo2 = rec.ngrams[g]
        assert lp2 == pytest.approx(lp, rel=1e-5, abs=1e-5), g
        assert bo2 == pytest.approx(bo, rel=1e-5, abs=1e-5), g


def test_read_kenlm_binary_dispatches(trie, qtrie):
    assert isinstance(read_kenlm_binary(trie), KenLMTrie)
    assert isinstance(read_kenlm_binary(qtrie), KenLMTrie)


def test_load_lm_routes_trie_to_device_tables(trie, arpa):
    """--lm-path with a TRIE binary feeds the same decode stack as the
    ARPA. Table keys can't be compared bit-for-bit (trie word ids are
    hash-ordered, not ARPA-file-ordered), so equivalence is semantic:
    same table sizes and identical beam transcripts."""
    t_a, p_a = word_lm_tables(load_lm(arpa), LABELS)
    t_b, p_b = word_lm_tables(load_lm(trie), LABELS)
    assert p_a == p_b
    assert np.asarray(t_a.packed).shape == np.asarray(t_b.packed).shape

    from vietasr_tpu.ops.beam_search import BeamSearchDecoderLM

    rng = np.random.RandomState(3)
    logits = rng.randn(12, len(LABELS) + 1).astype(np.float32) * 1.5
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    d_a = BeamSearchDecoderLM(LABELS, lm_path=arpa, beam_width=16)
    d_b = BeamSearchDecoderLM(LABELS, lm_path=trie, beam_width=16)
    assert d_a.decode(lp) == d_b.decode(lp)


def test_array_trie_rejected(trie, tmp_path):
    data = bytearray(open(trie, "rb").read())
    data[96:100] = (4).to_bytes(4, "little")      # ARRAY_TRIE
    p = tmp_path / "array.binary"
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="ARRAY|bhiksha"):
        read_kenlm_binary(str(p))


def test_order5_trie(tmp_path):
    """Deep chain: order-5 trie with multi-level child ranges."""
    arpa5 = tmp_path / "w5.arpa"
    train_ngram_arpa(CORPUS, str(arpa5), order=5, char_level=False)
    p = tmp_path / "w5.binary"
    write_kenlm_trie(str(arpa5), str(p))
    ref = NGramLM(str(arpa5))
    lm = KenLMTrie(str(p))
    rng = np.random.RandomState(7)
    vocab = [w for w in ref.vocab if not w.startswith("<")]
    for _ in range(100):
        n_ctx = rng.randint(0, 5)
        ctx = tuple(rng.choice(vocab) for _ in range(n_ctx))
        w = rng.choice(vocab)
        assert lm.log_prob(w, ctx) == pytest.approx(
            ref.log_prob(w, ctx), rel=1e-5, abs=1e-5), (w, ctx)
    rec = lm.to_ngram_lm()
    assert set(rec.ngrams) == set(ref.ngrams)


# ---------------------------------------------------------------------------
# edge-semantics conformance vs the ARPA oracle (VERDICT r4 item 7):
# <unk>, <s>/</s> backoff, and missing-suffix paths, for BOTH binary
# families (probing + trie + quant-trie).


def _edge_cases(lm_vocab):
    """(word, context) probes hitting every backoff path class."""
    w0 = sorted(lm_vocab)[0]
    return [
        ("zzz-oov", ()),                         # OOV -> <unk> unigram
        ("zzz-oov", (w0,)),                      # OOV under context
        (w0, ("zzz-oov",)),                      # known word, OOV context
        (w0, ("<s>",)),                          # BOS context backoff:
                                                 # <s> has no unigram prob
                                                 # but a real backoff
        ("</s>", (w0,)),                         # sentence end
        ("</s>", ("<s>",)),                      # empty sentence
        (w0, ("<s>", w0)),                       # order-3 with BOS head
        (w0, (w0, w0)),                          # missing-suffix chain:
                                                 # backs off twice
        (w0, ("zzz-a", "zzz-b")),                # fully unknown context
    ]


@pytest.mark.parametrize("make", ["probing", "trie", "qtrie"])
def test_edge_semantics_match_arpa(arpa, tmp_path, make):
    from vietasr_tpu.ops.kenlm_binary import (KenLMBinary,
                                              write_kenlm_binary)

    oracle = NGramLM(arpa)
    p = tmp_path / f"edge.{make}.binary"
    if make == "probing":
        write_kenlm_binary(arpa, str(p))
        reader = KenLMBinary(str(p))
    elif make == "trie":
        write_kenlm_trie(arpa, str(p))
        reader = KenLMTrie(str(p))
    else:
        write_kenlm_trie(arpa, str(p), quant_bits=(8, 8))
        reader = KenLMTrie(str(p))
    for word, ctx in _edge_cases(oracle.vocab):
        want = oracle.log_prob(word, ctx)
        got = reader.log_prob(word, ctx)
        assert got == pytest.approx(want, abs=1e-4), (word, ctx)
    # sentence scoring (exercises BOS->first-word and last-word->EOS)
    s = sorted(oracle.vocab)[:3]
    assert reader.score_sentence(s) == pytest.approx(
        oracle.score_sentence(s), abs=1e-4)


def test_bos_backoff_weight_applies(arpa, tmp_path):
    """P(w | <s>) for a w where the bigram (<s>, w) is absent must
    include <s>'s stored BACKOFF weight — the r4 advisor found the
    trie reader dropped it (NaN-prob 'traversable blank' branch)."""
    oracle = NGramLM(arpa)
    bos_bo = oracle.ngrams.get(("<s>",), (0.0, 0.0))[1]
    # pick a word with a unigram but no (<s>, w) bigram
    cand = [w for w in oracle.vocab
            if ("<s>", w) not in oracle.ngrams and w not in ("<s>",)]
    if not cand or bos_bo == 0.0:
        pytest.skip("fixture has no BOS-backoff case")
    w = cand[0]
    p = tmp_path / "bosbo.binary"
    write_kenlm_trie(arpa, str(p))
    reader = KenLMTrie(str(p))
    want = bos_bo + oracle.log_prob(w)
    assert reader.log_prob(w, ("<s>",)) == pytest.approx(want, abs=1e-4)
