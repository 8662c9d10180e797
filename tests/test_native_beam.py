"""Native (C++) LM + beam search: must agree with the Python oracle."""

import numpy as np
import pytest

from vietasr_tpu.ops.beam_search import prefix_beam_search
from vietasr_tpu.ops.lm import NGramLM, train_ngram_arpa

native = pytest.importorskip("vietasr_tpu.native")


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    corpus = ["xin chào việt nam", "xin chào bạn", "việt nam quê hương",
              "chào việt nam", "xin cảm ơn bạn"] * 4
    p = tmp_path_factory.mktemp("lm") / "vi.arpa"
    train_ngram_arpa(corpus, str(p), order=3)
    return str(p)


def test_native_builds():
    assert native.build_native().endswith(".so")


def test_native_lm_matches_python(arpa_path):
    py_lm = NGramLM(arpa_path)
    c_lm = native.NativeLM(arpa_path)
    assert c_lm.order == py_lm.order == 3
    cases = [("chào", ("xin",)), ("việt", ("xin", "chào")),
             ("nam", ("việt",)), ("zzz", ("xin",)), ("xin", ()),
             ("quê", ("chào", "việt"))]
    for w, ctx in cases:
        assert abs(c_lm.log_prob(w, ctx) - py_lm.log_prob(w, ctx)) < 1e-4, \
            (w, ctx)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.slow
def test_native_beam_matches_python_no_lm(seed):
    rng = np.random.RandomState(seed)
    labels = ["a", "b", "c", " "]
    t_max, v = 20, len(labels) + 1
    logits = rng.randn(t_max, v).astype(np.float32) * 2
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    want = prefix_beam_search(lp, labels, beam_width=30,
                              token_min_logp=-50.0)
    dec = native.CtcBeamNative(labels, token_min_logp=-50.0,
                                cutoff_top_n=0, beam_prune_logp=-1e9)
    got = dec.decode(lp, beam_width=30)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.slow
def test_native_beam_matches_python_with_lm(seed, arpa_path):
    rng = np.random.RandomState(100 + seed)
    labels = list(" abcdefghijklmnopqrstuvwxyzàáâãèéêìíòóôõùúýăđĩũơư")
    # use a subset for speed but keep the space + vietnamese chars
    labels = [" ", "x", "i", "n", "c", "h", "à", "o", "v", "ệ", "t", "a", "m"]
    t_max, v = 15, len(labels) + 1
    logits = rng.randn(t_max, v).astype(np.float32) * 2
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    py_lm = NGramLM(arpa_path)
    want = prefix_beam_search(lp, labels, beam_width=25, lm=py_lm,
                              alpha=0.7, beta=1.0, token_min_logp=-50.0)
    dec = native.CtcBeamNative(labels, lm_path=arpa_path, alpha=0.7,
                               beta=1.0, token_min_logp=-50.0,
                               cutoff_top_n=0, beam_prune_logp=-1e9)
    got = dec.decode(lp, beam_width=25)
    assert got == want


def test_native_beam_utf8_output(arpa_path):
    labels = [" ", "v", "i", "ệ", "t"]
    lp = np.full((6, 6), -9.0, np.float32)
    for t, c in enumerate([1, 2, 3, 4, 5, 5]):  # v i ệ t blank blank
        lp[t, c] = -0.01
    dec = native.CtcBeamNative(labels, lm_path=arpa_path)
    assert dec.decode(lp, beam_width=8) == "việt"
