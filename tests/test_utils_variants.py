"""Tests: utils (logging/env/exp manager), preprocessor variants, cleaners,
classification head."""

import json
import logging
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vietasr_tpu.audio.cleaners import (clean_text, expand_numbers,
                                        number_to_words)
from vietasr_tpu.frontend.features import FeaturizerConfig
from vietasr_tpu.frontend.variants import (crop_or_pad_spectrogram,
                                           make_mfcc_featurizer,
                                           make_spectrogram_featurizer,
                                           multiply_batch, _dct_matrix)
from vietasr_tpu.models.classifier import (classification_accuracy,
                                           classifier_apply,
                                           init_classifier_head)
from vietasr_tpu.utils import (ExpManager, deprecated, get_envbool,
                               get_envint, get_logger)
from vietasr_tpu.utils.env import RequiredSettingMissing
from vietasr_tpu.utils.logging import log_once


def test_env_getters(monkeypatch):
    monkeypatch.setenv("VB", "true")
    monkeypatch.setenv("VI", "42")
    assert get_envbool("VB") is True
    assert get_envint("VI") == 42
    assert get_envint("MISSING", 7) == 7
    with pytest.raises(RequiredSettingMissing):
        get_envint("MISSING")


def test_logger_once_dedup(capsys):
    logger = get_logger()
    logger.setLevel(logging.INFO)
    for _ in range(3):
        log_once(logger, "hello-once-xyz")
    err = capsys.readouterr().err
    assert err.count("hello-once-xyz") <= 1


def test_exp_manager(tmp_path):
    em = ExpManager(str(tmp_path / "exp"), use_timestamp=False)
    assert os.path.isdir(em.checkpoint_dir)
    em.log_metrics({"loss": 1.5}, step=1)
    em.log_metrics({"loss": 1.2}, step=2)
    lines = open(os.path.join(em.work_dir, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 1.2
    assert os.path.exists(os.path.join(em.work_dir, "cmd-args.log"))


def test_deprecated_decorator():
    @deprecated(version="2.0")
    def old_fn(x):
        return x + 1

    assert old_fn(1) == 2


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(3012) == "three thousand twelve"
    assert expand_numbers("i have 21 cats") == "i have twenty one cats"


def test_clean_text_keeps_vietnamese():
    assert clean_text("Xin chào, Việt Nam! 2 người") == \
        "xin chào việt nam two người"


def test_dct_matrix_matches_scipy():
    from scipy.fftpack import dct

    x = np.random.RandomState(0).randn(64).astype(np.float32)
    want = dct(x, type=2, norm="ortho")[:13]
    got = _dct_matrix(13, 64) @ x
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mfcc_and_spectrogram_featurizers():
    cfg = FeaturizerConfig(dither=0.0, features=64)
    sig = jnp.asarray(np.random.RandomState(0).randn(2, 16000)
                      .astype(np.float32))
    lens = jnp.asarray(np.array([16000, 8000], np.int32))
    spec, sl = make_spectrogram_featurizer(cfg)(sig, lens)
    assert spec.shape[2] == 257
    mfcc, sl2 = make_mfcc_featurizer(cfg, n_mfcc=13)(sig, lens)
    assert mfcc.shape[2] == 13
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(sl2))
    # masked region zero
    assert np.all(np.asarray(mfcc)[1, int(sl[1]):] == 0)


def test_multiply_batch_and_crop_or_pad():
    f = jnp.ones((2, 10, 4))
    fl = jnp.array([10, 6])
    t = jnp.zeros((2, 3), jnp.int32)
    tl = jnp.array([3, 2])
    f2, fl2, t2, tl2 = multiply_batch(f, fl, t, tl, mult=3)
    assert f2.shape[0] == 6 and tl2.shape[0] == 6

    cropped, cl = crop_or_pad_spectrogram(f, fl, audio_length=6)
    assert cropped.shape[1] == 6 and int(cl[0]) == 6
    padded, pl = crop_or_pad_spectrogram(f, fl, audio_length=16)
    assert padded.shape[1] == 16
    assert float(padded[0, 0, 0]) == 0.0   # symmetric zero pad


def test_classifier_head():
    rng = jax.random.PRNGKey(0)
    head = init_classifier_head(rng, feat_in=8, num_classes=5)
    enc = jnp.asarray(np.random.RandomState(0).randn(4, 12, 8)
                      .astype(np.float32))
    lens = jnp.array([12, 6, 3, 12])
    logits = classifier_apply(head, enc, lens)
    assert logits.shape == (4, 5)
    probs = classifier_apply(head, enc, lens, return_logits=False)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    # accuracy helper agrees with torch topk on random data
    targets = jnp.array([0, 1, 2, 3])
    acc1, acc5 = classification_accuracy(logits, targets, top_k=(1, 5))
    assert acc5 == 1.0
    lt = torch.tensor(np.asarray(logits))
    want1 = float((lt.topk(1, dim=1).indices[:, 0]
                   == torch.tensor([0, 1, 2, 3])).float().mean())
    assert abs(acc1 - want1) < 1e-6


def test_config_export_roundtrip(tmp_path):
    """load -> export -> load is the identity on every shipped config
    (reference export_to_config/import_from_config round-trip,
    nemo/core/neural_modules.py:233-366)."""
    from vietasr_tpu.config import load_config, save_config

    for src in ("/root/reference/configs/quartznet12x1_vi.yaml",
                "/root/reference/configs/quartznet15x5.yaml",
                "configs/conformer_ctc_vi.yaml"):
        cfg = load_config(src)
        out = tmp_path / "exported.yaml"
        save_config(cfg, str(out))
        cfg2 = load_config(str(out))
        assert cfg2 == cfg, src
