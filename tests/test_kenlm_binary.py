"""KenLM PROBING `.binary` reader/writer (ops/kenlm_binary.py).

The reference deploys its LMs as KenLM binaries
(/root/reference/.MISSING_LARGE_BLOBS:4-6, loaded at
beam_search_decoder.py:82-87). kenlm itself is not installed in this
image, so fixtures are byte-crafted by our writer from the published
layout; validation is score/round-trip equality against the ARPA scorer
on the same model, exactly as SURVEY §2.9 / VERDICT r2 item 2 prescribe.
"""

import os

import numpy as np
import pytest

from vietasr_tpu.ops.kenlm_binary import (KenLMBinary, is_kenlm_binary,
                                          murmur64a, write_kenlm_binary)
from vietasr_tpu.ops.lm import (NGramLM, load_lm, train_ngram_arpa,
                                word_lm_tables)

CORPUS = ["ab cab ba", "ab ba", "cab ab ba c", "ba cab", "c ab",
          "ba ba cab", "c c ab ba"] * 2
LABELS = ["a", "b", "c", " "]


@pytest.fixture(scope="module")
def arpa(tmp_path_factory):
    p = tmp_path_factory.mktemp("klm") / "word.arpa"
    train_ngram_arpa(CORPUS, str(p), order=3, char_level=False)
    return str(p)


@pytest.fixture(scope="module")
def binary(arpa, tmp_path_factory):
    p = tmp_path_factory.mktemp("klm") / "word.binary"
    write_kenlm_binary(arpa, str(p))
    return str(p)


def test_magic_and_sniffing(binary, arpa):
    with open(binary, "rb") as f:
        head = f.read(56)
    assert head.startswith(
        b"mmap lm http://kheafield.com/code format version 5\n\x00")
    assert is_kenlm_binary(binary)
    assert not is_kenlm_binary(arpa)
    assert not is_kenlm_binary("/nonexistent/file")


def test_murmur64a_reference_values():
    """MurmurHash64A spot values (seed 0) from the canonical algorithm."""
    # empty input: h = seed ^ (0 * m) then finalize -> 0
    assert murmur64a(b"") == 0
    # determinism + 64-bit range + tail handling across lengths
    seen = set()
    for s in [b"a", b"ab", b"abcdefg", b"abcdefgh", b"abcdefghi", b"<unk>"]:
        h = murmur64a(s)
        assert 0 <= h < 1 << 64
        seen.add(h)
    assert len(seen) == 6


def test_binary_scores_match_arpa(binary, arpa):
    """Every query class — exact hit, each backoff depth, OOV — scores
    identically (to f32 storage precision) to the ARPA scorer."""
    ref = NGramLM(arpa)
    bin_lm = KenLMBinary(binary)
    assert bin_lm.order == ref.order
    rng = np.random.RandomState(0)
    vocab = [w for w in ref.vocab if w not in ("<s>", "</s>", "<unk>")]
    queries = []
    for _ in range(200):
        n_ctx = rng.randint(0, 3)
        ctx = tuple(rng.choice(vocab + ["zz"]) for _ in range(n_ctx))
        queries.append((rng.choice(vocab + ["qq"]), ctx))
    for w, ctx in queries:
        got = bin_lm.log_prob(w, ctx)
        want = ref.log_prob(w, ctx)
        assert got == pytest.approx(want, rel=1e-5, abs=1e-5), (w, ctx)


def test_sentence_scores_match(binary, arpa):
    ref = NGramLM(arpa)
    bin_lm = KenLMBinary(binary)
    for line in CORPUS[:5]:
        got = bin_lm.score_sentence(line.split())
        want = ref.score_sentence(line.split())
        assert got == pytest.approx(want, rel=1e-5, abs=1e-5)


def test_to_ngram_lm_reconstructs_exactly(binary, arpa):
    """The hashed binary reconstructs the full explicit n-gram set."""
    ref = NGramLM(arpa)
    rec = KenLMBinary(binary).to_ngram_lm()
    assert rec.order == ref.order
    assert set(rec.ngrams) == set(ref.ngrams)
    for g, (lp, bo) in ref.ngrams.items():
        lp2, bo2 = rec.ngrams[g]
        assert lp2 == pytest.approx(lp, rel=1e-5, abs=1e-5)
        assert bo2 == pytest.approx(bo, rel=1e-5, abs=1e-5)


def test_load_lm_sniffs_and_device_tables_match(binary, arpa):
    """--lm-path with a .binary builds the SAME on-device word-LM tables
    as the ARPA (the full TPU fusion path works from the binary)."""
    t_a, p_a = word_lm_tables(load_lm(arpa), LABELS)
    t_b, p_b = word_lm_tables(load_lm(binary), LABELS)
    assert p_a == p_b
    k_a = np.asarray(t_a.packed)
    k_b = np.asarray(t_b.packed)
    assert k_a.shape == k_b.shape
    np.testing.assert_array_equal(k_a[:, :2], k_b[:, :2])   # keys identical
    np.testing.assert_allclose(k_a[:, 2:].view(np.float32),
                               k_b[:, 2:].view(np.float32),
                               rtol=1e-5, atol=1e-5)


def test_native_beam_tier_accepts_binary(binary, arpa):
    """BeamSearchDecoderLM transcribes identically from ARPA and .binary
    (binary spills a reconstructed ARPA for the C++ parser)."""
    from vietasr_tpu.ops.beam_search import BeamSearchDecoderLM

    rng = np.random.RandomState(3)
    logits = rng.randn(12, len(LABELS) + 1).astype(np.float32) * 1.5
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    d_a = BeamSearchDecoderLM(LABELS, lm_path=arpa, beam_width=16)
    d_b = BeamSearchDecoderLM(LABELS, lm_path=binary, beam_width=16)
    assert d_a.decode(lp) == d_b.decode(lp)


def test_trie_model_type_rejected(binary, tmp_path):
    data = bytearray(open(binary, "rb").read())
    # FixedWidthParameters.model_type sits after the 88-byte Sanity block:
    # u8 order + 3 pad + f32 multiplier -> offset 88 + 8
    data[96:100] = (2).to_bytes(4, "little")      # TRIE
    p = tmp_path / "trie.binary"
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="TRIE"):
        KenLMBinary(str(p))


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.binary"
    p.write_bytes(b"not a kenlm file at all, definitely not")
    with pytest.raises(ValueError, match="magic"):
        KenLMBinary(str(p))


def test_reconstruction_gate(binary):
    with pytest.raises(ValueError, match="too large"):
        KenLMBinary(binary).to_ngram_lm(max_probes=4)
