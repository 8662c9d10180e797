"""Chunked-causal Conformer streaming: the stateful chunk-at-a-time
runtime (streaming_conformer.ConformerStream) must emit EXACTLY the
offline `conformer_apply` forward of the same chunked model, and the
chunked offline mode itself must be causal at chunk granularity.

The reference has no streaming encoder at all (app.py buffers whole
utterances); this is the beyond-reference WeNet/U2-style mode."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vietasr_tpu.config import (ConformerConfig, DataConfig, EncoderConfig,
                                ModelConfig, SpecAugmentConfig)
from vietasr_tpu.frontend.features import FeaturizerConfig
from vietasr_tpu.models import model_init
from vietasr_tpu.models.conformer import conformer_apply
from vietasr_tpu.streaming_conformer import ConformerStream


def make_cfg(chunk_size=4, left_chunks=1, conv_kernel=7,
             subsampling_mode="conv2d"):
    conf = ConformerConfig(num_blocks=2, d_model=32, num_heads=4,
                           ff_expansion=2, conv_kernel=conv_kernel,
                           subsampling_channels=16, dropout=0.0,
                           chunk_size=chunk_size, left_chunks=left_chunks,
                           subsampling_mode=subsampling_mode)
    return ModelConfig(
        name="tiny-stream", labels=[" ", "a", "b", "c"],
        featurizer=FeaturizerConfig(features=16, dither=0.0, pad_to=8),
        encoder=EncoderConfig(blocks=(), feat_in=16),
        spec_augment=SpecAugmentConfig(), data=DataConfig(),
        architecture="conformer", conformer=conf)


def offline(variables, cfg, feats):
    lp, lens, _ = conformer_apply(
        variables, feats[None], jnp.array([feats.shape[0]], jnp.int32),
        cfg=cfg.conformer, training=False)
    return np.asarray(lp[0])


@pytest.mark.parametrize("left_chunks,conv_kernel,sub", [
    pytest.param(1, 7, "conv2d", marks=pytest.mark.slow),
    pytest.param(2, 5, "conv2d", marks=pytest.mark.slow),
    (2, 7, "stack"),
])
def test_stream_matches_offline(left_chunks, conv_kernel, sub):
    cfg = make_cfg(chunk_size=4, left_chunks=left_chunks,
                   conv_kernel=conv_kernel, subsampling_mode=sub)
    variables = model_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n_chunks = 5
    t = 4 * cfg.conformer.chunk_size * n_chunks     # mel frames
    feats = rng.randn(t, 16).astype(np.float32)

    want = offline(variables, cfg, jnp.asarray(feats))

    stream = ConformerStream(cfg, variables)
    chunks = [feats[i * stream.t_in:(i + 1) * stream.t_in]
              for i in range(n_chunks)]
    got = stream.stream(chunks)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_offline_chunked_is_chunk_causal():
    """Changing input after chunk boundary must not change earlier
    chunks' outputs (each output chunk depends only on itself + past)."""
    cfg = make_cfg(chunk_size=4, left_chunks=1)
    variables = model_init(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    t = 4 * 4 * 3                                    # 3 chunks of mel
    a = rng.randn(t, 16).astype(np.float32)
    b = a.copy()
    b[2 * 16:] += rng.randn(16, 16).astype(np.float32)   # perturb chunk 3

    lp_a = offline(variables, cfg, jnp.asarray(a))
    lp_b = offline(variables, cfg, jnp.asarray(b))
    # output frames of chunks 1-2 (post-subsample frames 0..7) unchanged
    np.testing.assert_allclose(lp_a[:8], lp_b[:8], atol=1e-5)
    assert np.abs(lp_a[8:] - lp_b[8:]).max() > 1e-3


def test_stream_restart_and_state_independence():
    """Two interleaved streams don't share state; restarting reproduces."""
    cfg = make_cfg()
    variables = model_init(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(2)
    stream = ConformerStream(cfg, variables)
    x1 = [rng.randn(stream.t_in, 16).astype(np.float32) for _ in range(2)]
    first = stream.stream(x1)
    again = stream.stream(x1)
    np.testing.assert_allclose(first, again, atol=1e-6)


def test_stream_rejects_bad_configs():
    cfg = make_cfg(chunk_size=0)
    variables = model_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="chunk"):
        ConformerStream(cfg, variables)

    cfg = make_cfg(chunk_size=4)
    variables = model_init(jax.random.PRNGKey(0), cfg)
    stream = ConformerStream(cfg, variables)
    with pytest.raises(ValueError, match="frames"):
        stream.stream([np.zeros((7, 16), np.float32)])


def make_raw_cfg(chunk_size=4, left_chunks=2):
    cfg = make_cfg(chunk_size=chunk_size, left_chunks=left_chunks)
    feat = dataclasses.replace(cfg.featurizer, normalize="", dither=0.0,
                               pad_to=1)
    return dataclasses.replace(cfg, featurizer=feat)


def test_raw_audio_stream_matches_offline_pipeline():
    """Raw audio in, log-probs out: the online transcriber (stateful
    featurizer + chunked encoder) equals the OFFLINE featurizer + chunked
    conformer on the zero-context-prefixed signal — whole-pipeline
    streaming exactness, the claim the quartznet path makes in
    test_streaming_online, now for the conformer."""
    from vietasr_tpu.frontend.features import make_featurizer
    from vietasr_tpu.streaming_conformer import ConformerOnlineTranscriber

    cfg = make_raw_cfg()
    variables = model_init(jax.random.PRNGKey(3), cfg)
    ot = ConformerOnlineTranscriber(cfg, variables, causal_norm=False)
    # round 5: the pre-audio junk region fills the whole first chunk and
    # that step runs with the encoder FROZEN — junk never enters the KV
    # cache, so the streamed output equals the offline chunked forward
    # of the REAL frames with no junk group in any attention window
    assert ot.skip_first_step

    rng = np.random.RandomState(3)
    n_chunks = 6
    cs = ot.required_chunk_samples
    signal = (rng.randn(n_chunks * cs) * 0.1).astype(np.float32)
    chunks = [signal[i * cs:(i + 1) * cs] for i in range(n_chunks)]
    got = ot.stream(chunks)            # prefix (the frozen step) dropped

    # offline chunked forward on EXACTLY the real frames the stream saw
    # (the featurizer's offline-equality is asserted in
    # test_streaming_online)
    from vietasr_tpu.streaming_online import StreamingFeaturizer

    sf = StreamingFeaturizer(cfg.featurizer, causal_norm=False,
                             junk_align=ot._sf.junk_frames)
    assert sf.audio_carry == ot._sf.audio_carry
    fields = sf.init_fields()
    fields = (sf.reflect_carry(jnp.asarray(chunks[0])),) + fields[1:]
    frames = []
    for c in chunks:
        fields, out = sf.step(fields, jnp.asarray(c))
        frames.append(np.asarray(out))
    window = np.concatenate(frames, axis=0)[ot._sf.junk_frames:]
    want = offline(variables, cfg, jnp.asarray(window))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_conformer_stream_pool():
    """N concurrent conformer sessions batch through one vmapped step and
    stay isolated; pool output equals the single-stream transcriber."""
    from vietasr_tpu.serve.streams import IncrementalGreedy, StreamPool
    from vietasr_tpu.streaming_conformer import ConformerOnlineTranscriber

    cfg = make_raw_cfg()
    variables = model_init(jax.random.PRNGKey(4), cfg)
    ot = ConformerOnlineTranscriber(cfg, variables, causal_norm=False)
    pool = StreamPool(ot, slots=3, chunk_samples=999)   # overridden
    assert pool.chunk_samples == ot.required_chunk_samples

    rng = np.random.RandomState(4)
    cs = ot.required_chunk_samples
    sig_a = (rng.randn(4 * cs) * 0.1).astype(np.float32)
    sig_b = (rng.randn(4 * cs) * 0.1).astype(np.float32)
    chunks_a = [sig_a[i * cs:(i + 1) * cs] for i in range(4)]
    chunks_b = [sig_b[i * cs:(i + 1) * cs] for i in range(4)]

    ref_a = IncrementalGreedy(cfg.labels, cfg.num_classes)
    ref_a.feed(ot.stream(chunks_a))
    ref_b = IncrementalGreedy(cfg.labels, cfg.num_classes)
    ref_b.feed(ot.stream(chunks_b))

    sa, sb = pool.open(), pool.open()
    for ca, cb in zip(chunks_a, chunks_b):
        pool.feed({sa: ca, sb: cb})
    assert pool.decoders[sa].ids == ref_a.ids
    assert pool.decoders[sb].ids == ref_b.ids
    pool.close(sa)
    pool.close(sb)


def test_conformer_stream_pool_beam_decoder(tmp_path):
    """The CLI serve path `--stream-decoder beam_host --lm-path ...` on a
    CONFORMER pool: per-slot IncrementalBeam over the pooled chunked-causal
    encoder equals the same beam decoder driven on the single-stream
    transcriber's log-probs (decoder choice is architecture-independent;
    decoder="beam" — the device tier — is covered by
    tests/test_streaming_beam.py and test_device_streaming_beam.py)."""
    from vietasr_tpu.ops.lm import NGramLM, train_ngram_arpa
    from vietasr_tpu.serve.streams import IncrementalBeam, StreamPool
    from vietasr_tpu.streaming_conformer import ConformerOnlineTranscriber

    cfg = make_raw_cfg()
    variables = model_init(jax.random.PRNGKey(5), cfg)
    ot = ConformerOnlineTranscriber(cfg, variables, causal_norm=False)

    arpa = tmp_path / "w.arpa"
    train_ngram_arpa(["a b a", "b a b", "a a b"] * 3, str(arpa),
                     order=3, char_level=False)
    pool = StreamPool(ot, slots=2, decoder="beam_host", lm_path=str(arpa),
                      beam_width=6, lm_alpha=0.4, lm_beta=1.0)

    rng = np.random.RandomState(5)
    cs = ot.required_chunk_samples
    chunks = [(rng.randn(cs) * 0.1).astype(np.float32) for _ in range(4)]

    # reference: same incremental beam fed the single-stream log-probs
    # (prefix frames already dropped by ot.stream, as the pool does)
    ref = IncrementalBeam(cfg.labels, cfg.num_classes, beam_width=6,
                          lm=NGramLM(str(arpa)), alpha=0.4, beta=1.0)
    ref.feed(ot.stream(chunks))

    s = pool.open()
    assert isinstance(pool.decoders[s], IncrementalBeam)
    pieces = [pool.feed({s: c})[s] for c in chunks]
    assert pool.decoders[s]._dec.best() == ref._dec.best()
    # \r-revision framing reassembles to the decoder's final hypothesis
    final = ""
    for piece in pieces:
        final = piece[1:] if piece.startswith("\r") else final + piece
    assert final == pool.decoders[s]._emitted
    pool.close(s)


def test_full_context_unaffected_by_flag_default():
    """chunk_size=0 (default) keeps the original full-context behavior:
    symmetric subsample padding and full attention — regression guard
    that adding the streaming mode didn't change offline models."""
    conf = ConformerConfig(num_blocks=1, d_model=32, num_heads=4,
                           ff_expansion=2, conv_kernel=7,
                           subsampling_channels=16, dropout=0.0)
    assert conf.chunk_size == 0
    from vietasr_tpu.models.conformer import init_conformer
    variables = init_conformer(jax.random.PRNGKey(0), conf, feat_in=16,
                               num_classes=4)
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 32, 16)
                        .astype(np.float32))
    lp, lens, _ = conformer_apply(variables, feats,
                                  jnp.array([32], jnp.int32), cfg=conf)
    assert lp.shape == (1, 8, 5)
    # full-context: a late-input perturbation DOES change early outputs
    feats2 = feats.at[0, 28:].add(1.0)
    lp2, _, _ = conformer_apply(variables, feats2,
                                jnp.array([32], jnp.int32), cfg=conf)
    assert np.abs(np.asarray(lp2[0, :4] - lp[0, :4])).max() > 1e-5
