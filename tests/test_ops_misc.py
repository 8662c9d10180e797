"""Tests for greedy decode, SpecAugment, tokenizer, and WER/CER metrics."""

import numpy as np

import jax
import jax.numpy as jnp

from vietasr_tpu.audio.tokenizer import CharTokenizer
from vietasr_tpu.config import SpecAugmentConfig
from vietasr_tpu.ops import (
    apply_spec_augment,
    collapse_batch,
    ctc_collapse,
    greedy_decode,
)
from vietasr_tpu.ops.greedy import greedy_transcripts
from vietasr_tpu.train.metrics import levenshtein, word_error_rate


def test_greedy_decode_matches_slow_collapse():
    rng = np.random.RandomState(0)
    b, t, v = 4, 30, 6
    blank = v - 1
    log_probs = jnp.asarray(rng.randn(b, t, v).astype(np.float32))
    lens = jnp.asarray(rng.randint(5, t + 1, size=(b,)).astype(np.int32))
    preds, keep = greedy_decode(log_probs, lens, blank=blank)
    fast = collapse_batch(preds, keep)
    raw = np.asarray(jnp.argmax(log_probs, axis=-1))
    for i in range(b):
        slow = ctc_collapse(raw[i, : int(lens[i])], blank=blank)
        np.testing.assert_array_equal(fast[i], slow)


def test_greedy_transcripts():
    labels = ["a", "b", "c"]
    blank = 3
    # "aab" -> "ab"; frames: a a blank a b
    lp = np.full((1, 5, 4), -10.0, np.float32)
    for t, c in enumerate([0, 0, blank, 0, 1]):
        lp[0, t, c] = 0.0
    out = greedy_transcripts(jnp.asarray(lp), jnp.array([5]), labels)
    assert out == ["aab"]


def test_spec_augment_masks_bands():
    cfg = SpecAugmentConfig(freq_masks=2, time_masks=2, freq_width=5,
                            time_width=8)
    x = jnp.ones((2, 40, 16))
    y = apply_spec_augment(jax.random.PRNGKey(0), x, cfg)
    y = np.asarray(y)
    assert y.shape == x.shape
    assert (y == 0).any()            # something was masked
    assert (y == 1).sum() > y.size * 0.3  # but not everything


def test_spec_cutout_rectangles():
    cfg = SpecAugmentConfig(rect_masks=5, rect_time=120, rect_freq=50)
    x = jnp.ones((1, 130, 64))
    y = np.asarray(apply_spec_augment(jax.random.PRNGKey(1), x, cfg))
    assert (y == 0).any()
    zero_frac = (y == 0).mean()
    assert 0.0 < zero_frac < 1.0


def test_tokenizer_roundtrip_vietnamese():
    labels = [' ', 'a', 'b', 'c', 'đ', 'ế']
    tok = CharTokenizer(labels)
    ids = tok.encode("đế ba")
    assert ids == [4, 5, 0, 2, 1]
    assert tok.decode(ids) == "đế ba"


def test_tokenizer_drops_unknown():
    tok = CharTokenizer(["a", "b"])
    assert tok.encode("abz") is None
    tok2 = CharTokenizer(["a", "b", "<unk>"], unk_id=2)
    assert tok2.encode("abz") == [0, 1, 2]


def test_tokenizer_multichar_special_labels():
    tok = CharTokenizer(["a", "ch", "c", "h"])
    # greedy longest-match: "ch" wins over "c","h"
    assert tok.encode("cha") == [1, 0]
    assert tok.encode("cah") == [2, 0, 3]


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([], [1, 2]) == 2
    assert levenshtein([1, 2, 3], [1, 2, 3]) == 0


def test_word_error_rate():
    # corpus-level: sum edits / sum ref words
    wer = word_error_rate(["a b c", "x"], ["a b d", "x y"])
    assert abs(wer - 2.0 / 5.0) < 1e-9
    cer = word_error_rate(["abc"], ["abd"], use_cer=True)
    assert abs(cer - 1.0 / 3.0) < 1e-9


def test_device_resampler_matches_host_polyphase():
    """ops/resample.py must equal audio/io.resample (scipy resample_poly)
    for up-, down- and rational-rate conversion, to fp32 tolerance."""
    import numpy as np

    from vietasr_tpu.audio.io import resample
    from vietasr_tpu.ops.resample import make_device_resampler

    rng = np.random.RandomState(0)
    for orig, tgt, n in [(8000, 16000, 12345), (16000, 8000, 20000),
                         (22050, 16000, 9999), (8000, 16000, 1)]:
        x = rng.randn(n).astype(np.float32)
        want = resample(x, orig, tgt)
        got = np.asarray(make_device_resampler(orig, tgt)(x))
        assert got.shape == want.shape, (orig, tgt)
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=0)
    # identity + batched input
    same = make_device_resampler(16000, 16000)
    x = rng.randn(3, 100).astype(np.float32)
    assert same(x) is x
    up2 = make_device_resampler(8000, 16000)
    got = np.asarray(up2(x))
    for i in range(3):
        np.testing.assert_allclose(got[i], resample(x[i], 8000, 16000),
                                   atol=2e-6, rtol=0)
