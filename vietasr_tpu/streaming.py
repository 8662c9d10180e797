"""Long-form audio: chunked streaming inference with receptive-field overlap.

The reference simply refuses long audio (skips files > 10 s,
/root/reference/infer.py:201-203; trains only on <= 16.7 s clips). Because
QuartzNet is fully convolutional, chunking with overlap equal to the
receptive field is exact up to normalization (SURVEY.md §5.7): we split the
waveform into fixed chunks, run the normal (bucketed, static-shape) forward
on each, drop the overlap margins in encoder-frame space, concatenate the
log-probs, and decode once.

Deviation (documented): per-feature normalization becomes chunk-local
instead of utterance-global (the reference normalizes over the whole
utterance, parts/features.py:17-30). With >= 1-2 s of context per chunk the
stats are stable; tests quantify the effect.

`receptive_field_frames` computes the model's true receptive field from the
config so callers can pick an exact overlap if they want bit-stability.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

from vietasr_tpu.config import EncoderConfig


def receptive_field_frames(cfg: EncoderConfig) -> int:
    """Receptive field of the encoder in INPUT (mel-frame) units:
    rf += (k-1) * dilation * jump per conv; jump *= stride."""
    rf, jump = 1, 1
    for b in cfg.blocks:
        k = b.effective_kernel
        for _ in range(b.repeat):
            rf += (k - 1) * b.dilation * jump
            jump *= b.stride
    return rf


def encoder_stride(cfg: EncoderConfig) -> int:
    s = 1
    for b in cfg.blocks:
        s *= b.stride ** b.repeat
    return s


def chunk_spans(n_samples: int, chunk: int, overlap: int
                ) -> List[Tuple[int, int, int, int]]:
    """Split [0, n_samples) into overlapping chunks.

    Returns (start, stop, keep_from, keep_to) per chunk, where keep_* are
    sample offsets WITHIN the chunk whose outputs are retained (the stitch
    points sit mid-overlap).
    """
    if n_samples <= chunk:
        return [(0, n_samples, 0, n_samples)]
    step = chunk - 2 * overlap
    if step <= 0:
        raise ValueError("overlap too large for chunk size")
    spans = []
    start = 0
    while True:
        stop = min(start + chunk, n_samples)
        keep_from = 0 if start == 0 else overlap
        keep_to = stop - start if stop == n_samples else chunk - overlap
        spans.append((start, stop, keep_from, keep_to))
        if stop == n_samples:
            break
        start += step
    return spans


def transcribe_long(
    transcriber,
    signal: np.ndarray,
    *,
    chunk_seconds: float = 15.0,
    overlap_seconds: float = 2.0,
) -> str:
    """Chunked long-form transcription through a Transcriber."""
    log_probs, total = long_form_log_probs(
        transcriber, signal, chunk_seconds=chunk_seconds,
        overlap_seconds=overlap_seconds, device=True)
    opts = getattr(transcriber, "opts", None)
    if opts is not None and opts.decoder == "device_beam":
        from vietasr_tpu.ops.device_beam import device_beam_transcripts

        labels = transcriber.cfg.labels
        space = labels.index(" ") if " " in labels else -1
        if getattr(transcriber, "_device_word_lm", None) is not None:
            return device_beam_transcripts(
                log_probs[None, :total], np.array([total]), labels,
                beam_width=opts.beam_width,
                word_lm=transcriber._device_word_lm,
                wlm_probes=transcriber._device_wlm_probes, space=space,
                alpha=opts.lm_alpha, beta=opts.lm_beta,
                cutoff_top_n=opts.device_beam_cutoff_top_n)[0]
        return device_beam_transcripts(
            log_probs[None, :total], np.array([total]), labels,
            beam_width=opts.beam_width,
            lm_table=transcriber._device_lm_table,
            n_ctx=transcriber._device_n_ctx, alpha=opts.lm_alpha,
            beta=0.0,
            space=-1 if transcriber._device_lm_table is not None else space,
            cutoff_top_n=opts.device_beam_cutoff_top_n)[0]
    if transcriber._decoder is not None:
        return transcriber._decoder.decode(np.asarray(log_probs[:total]))
    from vietasr_tpu.ops.greedy import greedy_decode, ids_to_text

    # argmax + collapse mask on DEVICE: only the (T,) ids/mask cross the
    # link, not the (T, V) posterior (which costs more to transfer than
    # the whole forward pass on a remote-attached chip)
    import jax.numpy as jnp

    preds, keep = greedy_decode(log_probs[None], jnp.asarray([total]),
                                blank=transcriber.cfg.num_classes)
    preds = np.asarray(preds[0])
    keep = np.asarray(keep[0])
    return ids_to_text(preds[keep], transcriber.cfg.labels)


def long_form_log_probs(transcriber, signal: np.ndarray, *,
                        chunk_seconds: float, overlap_seconds: float,
                        device: bool = False
                        ) -> Tuple[np.ndarray, int]:
    """Stitched (T_total, V) log-probs for arbitrarily long audio.

    Chunks are BATCHED through the encoder in fixed-size groups (static
    shapes, one compiled program) rather than run one by one — on a 300 s
    utterance this is ~8x fewer device round trips; the chunks of one
    utterance are embarrassingly parallel because overlap is handled by
    margin-dropping, not state.

    device=True keeps the stitched posterior ON DEVICE (slice + concat
    are device ops) for callers that decode there; host-bound callers get
    numpy as before."""
    sr = transcriber.cfg.featurizer.sample_rate
    hop = transcriber.cfg.featurizer.hop_length
    enc_stride = encoder_stride(transcriber.cfg.encoder)
    # stitch points must land on the hop*stride grid or boundary frames get
    # duplicated/dropped — round chunk and overlap to that grid
    grid = hop * enc_stride
    chunk = max(int(chunk_seconds * sr) // grid, 2) * grid
    overlap = max(int(overlap_seconds * sr) // grid, 1) * grid
    spans = chunk_spans(len(signal), chunk, overlap)

    group = max(int(getattr(transcriber.opts, "max_batch", 8)), 1)
    pieces: List[np.ndarray] = [None] * len(spans)  # type: ignore
    for g0 in range(0, len(spans), group):
        g_spans = spans[g0 : g0 + group]
        batch = np.zeros((group, chunk), np.float32)
        lens = np.zeros((group,), np.int32)         # padded rows: length 0
        for i, (start, stop, _, _) in enumerate(g_spans):
            batch[i, : stop - start] = signal[start:stop]
            lens[i] = stop - start
        lp, enc_lens = transcriber.log_probs(batch, lengths=lens,
                                             as_numpy=not device)
        for i, (start, stop, keep_from, keep_to) in enumerate(g_spans):
            n_valid = int(enc_lens[i])
            # sample offsets -> encoder frames: ceil(x / hop) / enc_stride
            f_from = int(math.ceil(keep_from / hop / enc_stride))
            f_to = min(n_valid,
                       int(math.ceil(keep_to / hop / enc_stride)))
            pieces[g0 + i] = lp[i, f_from:f_to]
    if device:
        import jax.numpy as jnp

        out = jnp.concatenate(pieces, axis=0)
    else:
        out = np.concatenate(pieces, axis=0)
    return out, out.shape[0]
