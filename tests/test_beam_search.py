"""LM + beam search correctness: ARPA backoff scoring against hand-computed
values, and prefix beam search against exhaustive marginalization."""

import itertools
import math

import numpy as np
import pytest

import jax.numpy as jnp

from vietasr_tpu.ops.beam_search import prefix_beam_search
from vietasr_tpu.ops.ctc_loss import ctc_loss
from vietasr_tpu.ops.lm import LOG10, BOS, NGramLM, train_ngram_arpa

ARPA = """\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.30103
-0.8\t</s>
-0.5\ta\t-0.2
-0.7\tb\t-0.1
-1.2\t<unk>

\\2-grams:
-0.3\t<s> a
-0.4\ta b
-0.9\tb </s>

\\end\\
"""


@pytest.fixture
def lm(tmp_path):
    p = tmp_path / "tiny.arpa"
    p.write_text(ARPA)
    return NGramLM(str(p))


def test_arpa_exact_and_backoff(lm):
    # exact bigram
    assert abs(lm.log_prob("a", (BOS,)) - (-0.3 * LOG10)) < 1e-9
    assert abs(lm.log_prob("b", ("a",)) - (-0.4 * LOG10)) < 1e-9
    # backoff: p(a|b) = backoff(b) + p(a) = -0.1 + -0.5 (log10)
    assert abs(lm.log_prob("a", ("b",)) - (-0.6 * LOG10)) < 1e-9
    # unknown word -> <unk>
    assert abs(lm.log_prob("zzz", ("a",)) - ((-0.2 + -1.2) * LOG10)) < 1e-9


def test_sentence_score(lm):
    # <s> a b </s> = p(a|<s>) + p(b|a) + p(</s>|b)
    want = (-0.3 + -0.4 + -0.9) * LOG10
    assert abs(lm.score_sentence(["a", "b"]) - want) < 1e-9


def test_trained_arpa_roundtrip(tmp_path):
    corpus = ["xin chào việt nam", "xin chào bạn", "việt nam quê hương",
              "chào việt nam"] * 3
    out = str(tmp_path / "trained.arpa")
    train_ngram_arpa(corpus, out, order=3)
    lm = NGramLM(out)
    assert lm.order == 3
    # unigram probs (with <unk>) sum to ~<= 1
    uni = [10 ** (lm.ngrams[(w,)][0] / LOG10) for w in lm.vocab
           if w not in (BOS,)]
    assert 0.5 < sum(uni) <= 1.001
    # frequent continuation beats rare one
    assert lm.log_prob("chào", ("xin",)) > lm.log_prob("quê", ("xin",))
    # seen sentence scores higher than scrambled
    good = lm.score_sentence("xin chào việt nam".split())
    bad = lm.score_sentence("nam xin hương chào".split())
    assert good > bad


def exhaustive_best(log_probs, labels, lm=None, alpha=0.5, beta=1.5):
    """Oracle: enumerate every label string up to length T, sum CTC
    alignment paths via ctc_loss, add LM fusion score, take the argmax."""
    t_max, v = log_probs.shape
    blank = v - 1
    best_text, best_score = "", -np.inf
    ids = list(range(v - 1))
    for length in range(0, t_max + 1):
        for seq in itertools.product(ids, repeat=length):
            # CTC feasibility: need T >= len + repeats
            reps = sum(1 for i in range(1, len(seq)) if seq[i] == seq[i - 1])
            if length + reps > t_max:
                continue
            tgt = np.array([list(seq)], np.int32) if length else \
                np.zeros((1, 1), np.int32)
            ll = -float(ctc_loss(
                jnp.asarray(log_probs[None]), jnp.asarray(tgt),
                jnp.asarray(np.array([t_max], np.int32)),
                jnp.asarray(np.array([length], np.int32)),
                blank=blank, reduction="none")[0])
            text = "".join(labels[i] for i in seq)
            score = ll
            if lm is not None:
                words = [w for w in text.split(" ") if w]
                for i, w in enumerate(words):
                    score += alpha * lm.log_prob(w, tuple(words[:i])) + beta
            if score > best_score:
                # render like the beam: words joined by single spaces
                best_text, best_score = " ".join(text.split()), score
    return best_text, best_score


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.slow
def test_beam_matches_exhaustive_no_lm(seed):
    rng = np.random.RandomState(seed)
    t_max, v = 5, 4                       # labels: a, b, ' ' + blank
    labels = ["a", "b", " "]
    logits = rng.randn(t_max, v).astype(np.float32) * 2
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    want, want_score = exhaustive_best(lp, labels)
    got = prefix_beam_search(lp, labels, beam_width=200,
                             token_min_logp=-50.0)
    assert got == want, (got, want, want_score)


@pytest.mark.parametrize("seed", [3, 4])
@pytest.mark.slow
def test_beam_matches_exhaustive_with_lm(seed, lm):
    rng = np.random.RandomState(seed)
    t_max, v = 5, 4
    labels = ["a", "b", " "]
    logits = rng.randn(t_max, v).astype(np.float32) * 1.5
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    want, _ = exhaustive_best(lp, labels, lm=lm, alpha=0.8, beta=0.5)
    got = prefix_beam_search(lp, labels, beam_width=400,
                             token_min_logp=-50.0, lm=lm, alpha=0.8,
                             beta=0.5)
    assert got == want


def test_beam_search_obvious_sequence():
    labels = ["h", "i", " "]
    # strong path: h h blank i -> "hi"
    lp = np.full((4, 4), -8.0, np.float32)
    for t, c in enumerate([0, 0, 3, 1]):
        lp[t, c] = -0.01
    out = prefix_beam_search(lp, labels, beam_width=10)
    assert out == "hi"
