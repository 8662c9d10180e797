"""End-to-end inference facade — the `VietASR` equivalent.

Reference: infer.py:57-171 builds a lazy NmTensor DAG once and re-runs it
per utterance. Here the "graph" is a jitted function per duration bucket:
featurize -> folded-BN QuartzNet -> log-probs (+ greedy collapse). Incoming
audio is padded up to the next bucket so the number of compiled programs is
bounded and static (XLA-friendly), and batching across utterances is free.

Decoding: greedy on device; optional n-gram LM beam search via
vietasr_tpu.ops.beam_search when an LM/beam config is given (reference
BeamSearchDecoderWithLM, beam_search_decoder.py:14-102).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vietasr_tpu.audio.io import read_audio
from vietasr_tpu.config import ModelConfig, load_config
from vietasr_tpu.frontend.features import make_featurizer
from vietasr_tpu.models import model_apply, model_init
from vietasr_tpu.models.convert import variables_from_checkpoints
from vietasr_tpu.models.quartznet import fold_batchnorm, init_quartznet
from vietasr_tpu.ops.greedy import collapse_batch, greedy_decode, ids_to_text


@dataclasses.dataclass
class TranscriberOptions:
    beam_width: int = 100
    lm_path: Optional[str] = None
    lm_alpha: float = 0.5
    lm_beta: float = 1.5
    fold_bn: bool = True
    buckets_seconds: Sequence[float] = (2.0, 4.0, 6.0, 8.0, 11.0, 16.7)
    max_batch: int = 8
    # "greedy" | "beam" (host C++/Python prefix beam + word LM) |
    # "device_beam" (on-device batched beam; char-LM table or hashed
    # word-LM fusion, no host round trip)
    decoder: str = "greedy"
    device_beam_cutoff_top_n: int = 8
    # "auto": sniff the ARPA (multi-char unigrams => word LM);
    # "char" / "word" force the on-device fusion kind
    device_beam_lm: str = "auto"
    # bf16 on the MXU is ~20x faster than fp32 for this encoder with max
    # log-prob deviation ~3e-5 (measured on v5e); set None for exact fp32.
    compute_dtype: Optional[str] = "bfloat16"
    # "auto": fused Pallas frontend on TPU when the config is covered
    # (faster than the XLA chain AND fp32-accurate at serving batches,
    # see frontend/pallas_frontend.py); "fast": fused kernel with
    # single-pass bf16 DFT matmuls — 6x faster than the XLA chain at
    # B=16 (0.41 vs 2.51 ms) in the SAME accuracy class as the
    # default-precision XLA chain (O(1) error confined to spectral-floor
    # bins, transcript-neutral on real speech — rooflines §1);
    # "on"/"off" force the fp32-accurate kernel / the XLA chain.
    fused_frontend: str = "auto"


class Transcriber:
    """Config + checkpoints -> `.transcribe(np.ndarray) -> str`."""

    def __init__(
        self,
        config_file: str,
        *,
        encoder_checkpoint: Optional[str] = None,
        decoder_checkpoint: Optional[str] = None,
        variables: Optional[dict] = None,
        options: Optional[TranscriberOptions] = None,
    ):
        self.cfg: ModelConfig = load_config(config_file)
        # inference forces dither off (reference infer.py:89)
        self.cfg = dataclasses.replace(
            self.cfg,
            featurizer=dataclasses.replace(self.cfg.featurizer, dither=0.0))
        self.opts = options or TranscriberOptions()

        if variables is None:
            if encoder_checkpoint and decoder_checkpoint:
                variables = variables_from_checkpoints(
                    encoder_checkpoint, decoder_checkpoint, self.cfg.encoder)
            else:
                variables = model_init(jax.random.PRNGKey(0), self.cfg)
                # overlay whichever reference checkpoint was provided
                from vietasr_tpu.models.convert import (
                    decoder_from_state_dict, encoder_from_state_dict,
                    load_torch_state_dict)

                if encoder_checkpoint:
                    enc = encoder_from_state_dict(
                        load_torch_state_dict(encoder_checkpoint),
                        self.cfg.encoder)
                    variables["params"]["encoder"] = enc["params"]
                    variables["batch_stats"]["encoder"] = enc["batch_stats"]
                if decoder_checkpoint:
                    variables["params"]["decoder"] = decoder_from_state_dict(
                        load_torch_state_dict(decoder_checkpoint))
        if self.opts.fold_bn and self.cfg.architecture == "quartznet":
            variables = fold_batchnorm(variables, self.cfg.encoder)
        self.variables = variables

        self._featurize_xla = make_featurizer(self.cfg.featurizer)
        self._featurize_fused = None
        use_fused = self.opts.fused_frontend in ("on", "fast")
        if self.opts.fused_frontend == "auto":
            from vietasr_tpu.frontend.pallas_frontend import fused_supported

            use_fused = (jax.default_backend() not in ("cpu",)
                         and fused_supported(self.cfg.featurizer))
        if use_fused:
            from vietasr_tpu.frontend.pallas_frontend import \
                make_fused_featurizer

            precision = "default" if self.opts.fused_frontend == "fast" \
                else "highest"
            self._featurize_fused = make_fused_featurizer(
                self.cfg.featurizer, precision=precision)
        # the fused kernel wins at serving micro-batches but loses to
        # XLA's batched im2col at large B (docs/rooflines.md §1: HIGHEST
        # 1.49 vs XLA 2.51 ms at B=16, 13.4 vs 3.8 at B=128; "fast"
        # crosses over near B~96); batch is static under jit, so
        # _forward picks per traced shape
        self._fused_max_batch = \
            96 if self.opts.fused_frontend == "fast" else \
            64 if self.opts.fused_frontend == "auto" else (1 << 30)
        self._q_tables: dict = {}   # int8 serving tables (calibrate_int8)
        self._fwd_jit = jax.jit(self._forward)
        sr = self.cfg.featurizer.sample_rate
        self.buckets = [int(s * sr) for s in self.opts.buckets_seconds]
        self._decoder = None
        self._device_lm_table = None
        self._device_word_lm = None
        if self.opts.decoder == "device_beam":
            self._device_n_ctx = 2
            if self.opts.lm_path:
                from vietasr_tpu.ops.lm import (SPACE_TOKEN, char_lm_table,
                                                load_lm, word_lm_tables)

                lm = load_lm(self.opts.lm_path)   # ARPA or KenLM .binary
                kind = self.opts.device_beam_lm
                if kind == "auto":
                    specials = {"<s>", "</s>", "<unk>", SPACE_TOKEN}
                    kind = "word" if any(
                        len(w) > 1 and w not in specials
                        for w in lm.vocab) else "char"
                if kind == "word":
                    tables, probes = word_lm_tables(lm, self.cfg.labels)
                    self._device_word_lm = jax.tree_util.tree_map(
                        jnp.asarray, tables)
                    self._device_wlm_probes = probes
                else:
                    self._device_lm_table = jnp.asarray(
                        char_lm_table(lm, self.cfg.labels))
                    self._device_n_ctx = lm.order - 1
        elif self.opts.lm_path is not None or self.opts.decoder == "beam":
            from vietasr_tpu.ops.beam_search import BeamSearchDecoderLM

            self._decoder = BeamSearchDecoderLM(
                self.cfg.labels, lm_path=self.opts.lm_path,
                alpha=self.opts.lm_alpha, beta=self.opts.lm_beta,
                beam_width=self.opts.beam_width)

    # -- compiled core -----------------------------------------------------

    def _featurize(self, signal, lengths):
        """Batch-aware frontend pick (batch is static under jit)."""
        if (self._featurize_fused is not None
                and signal.shape[0] <= self._fused_max_batch):
            return self._featurize_fused(signal, lengths)
        return self._featurize_xla(signal, lengths)

    def _forward(self, variables, q_tables, signal, lengths):
        """Weights are a jit ARGUMENT (not a traced constant) so the many
        (bucket x batch) programs share one copy of the params in HBM.
        `q_tables` is the (possibly empty) int8 pointwise-conv table pytree
        from calibrate_int8 — also an argument, for the same reason."""
        feats, flens = self._featurize(signal, lengths)
        dtype = jnp.dtype(self.opts.compute_dtype) \
            if self.opts.compute_dtype else None
        kwargs = {}
        if q_tables and self.cfg.architecture == "quartznet":
            from vietasr_tpu.models.quantize import int8_pw_fn

            kwargs["pw_fn"] = int8_pw_fn(q_tables)
        log_probs, enc_lens, _ = model_apply(
            variables, feats, flens, cfg=self.cfg,
            compute_dtype=dtype, **kwargs)
        preds, keep = greedy_decode(log_probs, enc_lens,
                                    blank=self.cfg.num_classes)
        return log_probs, enc_lens, preds, keep

    def _fwd(self, signal, lengths):
        return self._fwd_jit(self.variables, self._q_tables, signal, lengths)

    def calibrate_int8(self, signals: Sequence[np.ndarray]) -> None:
        """Switch the forward path to int8 pointwise-conv GEMMs (~2x MXU
        rate on v5e), calibrating static activation scales from the given
        representative waveforms. QuartzNet + folded BN only; see
        models/quantize.py. The reference has no quantized serving path.
        """
        if self.cfg.architecture != "quartznet" or not self.opts.fold_bn:
            raise ValueError(
                "int8 serving requires a QuartzNet with fold_bn=True")
        from vietasr_tpu.models.quantize import (calibrate_activations,
                                                 quantize_quartznet)

        # one batched pass (one compile, one dispatch): pad every signal
        # to the largest needed bucket — zero padding is masked out by the
        # frontend normalization and cannot raise an abs-max
        sigs = [np.asarray(s, np.float32).reshape(-1) for s in signals]
        bl = max(self._bucket_len(len(s)) for s in sigs)
        padded = np.zeros((len(sigs), bl), np.float32)
        lens = np.zeros((len(sigs),), np.int32)
        for i, s in enumerate(sigs):
            n = min(len(s), bl)
            padded[i, :n] = s[:n]
            lens[i] = n
        feats, flens = self._featurize(jnp.asarray(padded),
                                       jnp.asarray(lens))
        dtype = jnp.dtype(self.opts.compute_dtype) \
            if self.opts.compute_dtype else None
        amaxes = calibrate_activations(self.variables, self.cfg.encoder,
                                       feats, flens, compute_dtype=dtype)
        self._q_tables = quantize_quartznet(self.variables,
                                            self.cfg.encoder, amaxes)

    def _bucket_len(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return ((n + 15999) // 16000) * 16000   # round long audio up to 1 s

    # -- public API --------------------------------------------------------

    def log_probs(self, signal: np.ndarray, lengths=None, *,
                  as_numpy: bool = True):
        """(B?, S) or (S,) waveform -> (log_probs, enc_lens).

        `lengths` gives per-row valid sample counts (default: every row is
        full length) — rows may be zero-padded beyond their length.
        as_numpy=False keeps log_probs on DEVICE (enc_lens still comes to
        host): a (B, T, V) posterior is megabytes, and over a remote-chip
        link the transfer can cost more than the forward pass — callers
        that decode on device (long-form stitch + device beam/greedy)
        should never pull it to the host."""
        if signal.ndim == 1:
            signal = signal[None]
        n = signal.shape[1]
        bl = self._bucket_len(n)
        padded = np.zeros((signal.shape[0], bl), np.float32)
        padded[:, :n] = signal
        if lengths is None:
            lengths = np.full((signal.shape[0],), n, np.int32)
        lens = jnp.asarray(np.asarray(lengths, np.int32))
        lp, el, _, _ = self._fwd(jnp.asarray(padded), lens)
        if as_numpy:
            return np.asarray(lp), np.asarray(el)
        return lp, np.asarray(el)

    def transcribe(self, signal: np.ndarray) -> str:
        """Single-utterance transcription (reference VietASR.transcribe,
        infer.py:167-171)."""
        return self.transcribe_batch([signal])[0]

    def transcribe_batch(self, signals: List[np.ndarray]) -> List[str]:
        """Batch utterances of one bucket together for MXU utilization."""
        from vietasr_tpu.utils.typing import assert_waveform

        for s in signals:
            assert_waveform(np.asarray(s), port="transcribe.signal")
        out: List[Optional[str]] = [None] * len(signals)
        order = sorted(range(len(signals)), key=lambda i: len(signals[i]))
        i = 0
        while i < len(order):
            bl = self._bucket_len(len(signals[order[i]]))
            group = []
            while (i < len(order) and len(group) < self.opts.max_batch
                   and self._bucket_len(len(signals[order[i]])) == bl):
                group.append(order[i])
                i += 1
            batch = np.zeros((len(group), bl), np.float32)
            lens = np.zeros((len(group),), np.int32)
            for row, gi in enumerate(group):
                s = np.asarray(signals[gi], np.float32)
                batch[row, : len(s)] = s[:bl]
                lens[row] = min(len(s), bl)
            lp, enc_lens, preds, keep = self._fwd(jnp.asarray(batch),
                                                  jnp.asarray(lens))
            if self.opts.decoder == "device_beam":
                from vietasr_tpu.ops.device_beam import device_beam_transcripts

                space = self.cfg.labels.index(" ") \
                    if " " in self.cfg.labels else -1
                if self._device_word_lm is not None:
                    texts = device_beam_transcripts(
                        lp, enc_lens, self.cfg.labels,
                        beam_width=self.opts.beam_width,
                        word_lm=self._device_word_lm,
                        wlm_probes=self._device_wlm_probes,
                        space=space,
                        alpha=self.opts.lm_alpha, beta=self.opts.lm_beta,
                        cutoff_top_n=self.opts.device_beam_cutoff_top_n)
                else:
                    # char-LM fusion scores raw sequences (space=-1 keeps
                    # raw-prefix identity); without any LM, canonical
                    # (space-normalized) identity matches the host oracle
                    texts = device_beam_transcripts(
                        lp, enc_lens, self.cfg.labels,
                        beam_width=self.opts.beam_width,
                        lm_table=self._device_lm_table,
                        n_ctx=self._device_n_ctx,
                        space=-1 if self._device_lm_table is not None
                        else space,
                        alpha=self.opts.lm_alpha, beta=0.0,
                        cutoff_top_n=self.opts.device_beam_cutoff_top_n)
            elif self._decoder is not None:
                texts = self._decoder.decode_batch(
                    np.asarray(lp), np.asarray(enc_lens))
            else:
                texts = [ids_to_text(ids, self.cfg.labels)
                         for ids in collapse_batch(preds, keep)]
            for row, gi in enumerate(group):
                out[gi] = texts[row]
        return out  # type: ignore

    def transcribe_long(self, signal: np.ndarray, *,
                        chunk_seconds: float = 15.0,
                        overlap_seconds: float = 2.0,
                        signal_sr: Optional[int] = None,
                        signal_encoding: Optional[str] = None) -> str:
        """Arbitrary-length audio via chunked streaming (the reference skips
        files > 10 s instead, infer.py:201-203). int16 PCM, uint8 G.711
        (signal_encoding='ulaw'/'alaw') and native-rate input are
        converted/resampled ON DEVICE on the fused path."""
        from vietasr_tpu.streaming import transcribe_long

        return transcribe_long(self, signal, chunk_seconds=chunk_seconds,
                               overlap_seconds=overlap_seconds,
                               signal_sr=signal_sr,
                               signal_encoding=signal_encoding)

    def transcribe_long_batch(self, signals: Sequence[np.ndarray], *,
                              chunk_seconds: float = 15.0,
                              overlap_seconds: float = 2.0,
                              signal_sr: Optional[int] = None,
                              signal_encoding: Optional[str] = None
                              ) -> List[str]:
        """Several long utterances, dispatched together so device round
        trips overlap compute (see streaming.transcribe_long_batch)."""
        from vietasr_tpu.streaming import transcribe_long_batch

        return transcribe_long_batch(self, signals,
                                     chunk_seconds=chunk_seconds,
                                     overlap_seconds=overlap_seconds,
                                     signal_sr=signal_sr,
                                     signal_encoding=signal_encoding)

    def transcribe_file(self, path: str) -> str:
        samples, _ = read_audio(
            path, target_sr=self.cfg.featurizer.sample_rate)
        max_bucket = self.buckets[-1]
        if len(samples) > max_bucket:
            return self.transcribe_long(samples)
        return self.transcribe(samples)
