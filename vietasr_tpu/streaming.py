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
from typing import List, Optional, Sequence, Tuple

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


# Above this many chunks the single fused program would hold the whole
# posterior in HBM at once; fall back to the grouped (multi-dispatch) path.
FUSED_MAX_SPANS = 64


def _longform_grid(transcriber, chunk_seconds: float,
                   overlap_seconds: float) -> Tuple[int, int, int]:
    """(chunk, overlap, grid) in samples, rounded to the stitch grid."""
    sr = transcriber.cfg.featurizer.sample_rate
    hop = transcriber.cfg.featurizer.hop_length
    grid = hop * encoder_stride(transcriber.cfg.encoder)
    chunk = max(int(chunk_seconds * sr) // grid, 2) * grid
    overlap = max(int(overlap_seconds * sr) // grid, 1) * grid
    return chunk, overlap, grid


def _longform_program(transcriber, n_spans: int, chunk: int, overlap: int,
                      want_lp: bool, in_sr: Optional[int] = None,
                      in_dtype: str = "float32"):
    """ONE jitted program for the whole long-form pipeline.

    Chunk extraction (static dynamic_slices), featurize, encoder, margin-
    drop stitch (static gather) and greedy decode all run in a single
    dispatch. The grouped path in `long_form_log_probs` issues ~n_spans
    eager slice ops plus a concat and a decode, and over a remote-attached
    chip (axon tunnel) each eager dispatch costs a round trip — measured
    ~0.56 s of pure overhead on a 300 s utterance whose forward pass takes
    ~30 ms. Programs are cached per (n_spans, want_lp, in_sr, in_dtype);
    chunk/overlap are fixed per Transcriber options so span count is the
    only free axis.

    in_sr / in_dtype describe the UPLOADED buffer: native-rate int16 PCM
    is converted and polyphase-resampled ON DEVICE (ops/resample.py) —
    over the measured ~64 MB/s host->device tunnel, shipping 8 kHz int16
    instead of host-resampled 16 kHz float32 cuts the dominant cost of
    long-form serving by 4x.
    """
    import jax
    import jax.numpy as jnp

    from vietasr_tpu.models import model_apply
    from vietasr_tpu.ops.greedy import greedy_decode

    cache = getattr(transcriber, "_longform_programs", None)
    if cache is None:
        cache = transcriber._longform_programs = {}
    key = (n_spans, chunk, overlap, want_lp, in_sr, in_dtype)
    if key in cache:
        return cache[key]

    cfg = transcriber.cfg
    sr = cfg.featurizer.sample_rate
    hop = cfg.featurizer.hop_length
    enc_stride = encoder_stride(cfg.encoder)
    grid = hop * enc_stride
    step = chunk - 2 * overlap
    ov_f = overlap // grid        # chunk/overlap are grid multiples
    chunk_f = chunk // grid
    n_pad = (n_spans - 1) * step + chunk
    resampler = None
    if in_sr is not None and in_sr != sr:
        from vietasr_tpu.ops.resample import make_device_resampler

        resampler = make_device_resampler(in_sr, sr)
    # static keep ranges in encoder-frame units (mirrors chunk_spans +
    # the ceil-division frame mapping in long_form_log_probs)
    ranges = []
    for g in range(n_spans):
        a = 0 if g == 0 else ov_f
        b = chunk_f if g == n_spans - 1 else chunk_f - ov_f
        ranges.append((a, b))
    # frames contributed by every chunk before the last, plus the last
    # chunk's dynamic share clamp(enc_len - ov_f, 0, chunk_f - ov_f)
    static_prefix = sum(b - a for a, b in ranges[:-1])

    def run(variables, flat, last_len):
        if in_dtype == "ulaw":
            from vietasr_tpu.ops.g711 import ulaw_decode_f32

            flat = ulaw_decode_f32(flat)       # 8x fewer bytes than f32
        elif in_dtype == "alaw":
            from vietasr_tpu.ops.g711 import alaw_decode_f32

            flat = alaw_decode_f32(flat)
        elif in_dtype == "int16":
            flat = flat.astype(jnp.float32) * (1.0 / 32768.0)
        if resampler is not None:
            flat = resampler(flat)[:n_pad]
        chunks = jnp.stack([
            jax.lax.dynamic_slice(flat, (g * step,), (chunk,))
            for g in range(n_spans)])
        lens = jnp.full((n_spans,), chunk, jnp.int32)
        lens = lens.at[-1].set(last_len)
        feats, flens = transcriber._featurize(chunks, lens)
        cd = getattr(transcriber.opts, "compute_dtype", None)
        dtype = jnp.dtype(cd) if cd else None
        lp, enc_lens, _ = model_apply(variables, feats, flens, cfg=cfg,
                                      compute_dtype=dtype)
        tc = lp.shape[1]
        idx = np.concatenate([
            np.arange(a, min(b, tc), dtype=np.int32) + g * tc
            for g, (a, b) in enumerate(ranges)])
        stitched = lp.reshape(n_spans * tc, lp.shape[2])[jnp.asarray(idx)]
        total = static_prefix + jnp.clip(
            enc_lens[-1] - ov_f, 0, min(chunk_f, tc) - ov_f)
        if want_lp:
            return stitched, total
        preds, keep = greedy_decode(stitched[None], total[None],
                                    blank=cfg.num_classes)
        # ONE packed output buffer: over a remote-attached chip every
        # distinct device->host pull pays a ~25 ms round trip
        return jnp.concatenate([preds[0], keep[0].astype(jnp.int32),
                                total[None]])

    fn = jax.jit(run)
    cache[key] = fn
    return fn


def _prep_longform(transcriber, signal: np.ndarray,
                   signal_sr: Optional[int], chunk: int, overlap: int,
                   signal_encoding: Optional[str] = None):
    """Host-side staging for the fused program.

    Returns (n_spans, flat_in, last_len, in_sr, in_dtype) where flat_in is
    the buffer to upload — native dtype (int16 PCM kept as int16) and
    native rate (resampled on device) — or None when the signal is not
    fused-eligible (single chunk or > FUSED_MAX_SPANS)."""
    sr = transcriber.cfg.featurizer.sample_rate
    in_sr = signal_sr if signal_sr is not None else sr
    if in_sr == sr:
        n_model = len(signal)
    else:
        g = math.gcd(int(in_sr), int(sr))
        up, down = sr // g, in_sr // g
        n_model = -(-len(signal) * up // down)      # host resample length
    spans = chunk_spans(n_model, chunk, overlap)
    if not 1 < len(spans) <= FUSED_MAX_SPANS:
        return None
    step = chunk - 2 * overlap
    n_pad = (len(spans) - 1) * step + chunk
    if in_sr == sr:
        n_pad_in = n_pad
    else:
        n_pad_in = -(-n_pad * down // up)
    if signal.dtype == np.uint8:
        if signal_encoding not in ("ulaw", "alaw"):
            raise ValueError(
                "uint8 signals are G.711 wire bytes; pass "
                "signal_encoding='ulaw' or 'alaw'")
        in_dtype = signal_encoding
        flat = np.zeros((n_pad_in,), np.uint8)
        if signal_encoding == "ulaw":
            flat[:] = 0xFF                       # mu-law silence code
        else:
            flat[:] = 0x55                       # A-law silence code
    elif signal.dtype == np.int16:
        in_dtype = "int16"
        flat = np.zeros((n_pad_in,), np.int16)
    else:
        in_dtype = "float32"
        flat = np.zeros((n_pad_in,), np.float32)
    flat[: len(signal)] = signal
    last_len = n_model - (len(spans) - 1) * step
    return len(spans), flat, last_len, in_sr, in_dtype


def transcribe_long_batch(
    transcriber,
    signals: Sequence[np.ndarray],
    *,
    chunk_seconds: float = 15.0,
    overlap_seconds: float = 2.0,
    signal_sr: Optional[int] = None,
    signal_encoding: Optional[str] = None,
) -> List[str]:
    """Fused greedy long-form decode of SEVERAL utterances, pipelined.

    All fused programs are dispatched before any result is pulled, so the
    per-call tunnel round trips (upload, dispatch, download) of utterance
    i overlap utterance i+1's compute — on a remote-attached chip this is
    ~3x the throughput of calling transcribe_long in a loop. Utterances
    that don't fit the fused path (single chunk / > FUSED_MAX_SPANS /
    non-greedy decoder) fall back to transcribe_long individually.

    signal_sr: native sample rate of `signals` if it differs from the
    model's — resampling then happens ON DEVICE. int16 PCM arrays are
    uploaded as-is and converted on device (4x fewer bytes than host-
    resampled float32 for 8 kHz PCM). uint8 arrays are G.711 wire bytes
    (pass signal_encoding='ulaw'/'alaw'): decoded on device, 8x fewer
    bytes — the native format of telephony sources.
    """
    import jax.numpy as jnp

    from vietasr_tpu.ops.greedy import ids_to_text

    chunk, overlap, _ = _longform_grid(transcriber, chunk_seconds,
                                       overlap_seconds)
    opts = getattr(transcriber, "opts", None)
    decoder = opts.decoder if opts is not None else "greedy"
    out: List[Optional[str]] = [None] * len(signals)
    pending = []                                   # (index, device packed)
    for i, signal in enumerate(signals):
        prep = None if decoder != "greedy" else _prep_longform(
            transcriber, signal, signal_sr, chunk, overlap,
            signal_encoding)
        if prep is None:
            out[i] = transcribe_long(transcriber, signal,
                                     chunk_seconds=chunk_seconds,
                                     overlap_seconds=overlap_seconds,
                                     signal_sr=signal_sr,
                                     signal_encoding=signal_encoding)
            continue
        n_spans, flat, last_len, in_sr, in_dtype = prep
        fn = _longform_program(transcriber, n_spans, chunk, overlap,
                               want_lp=False, in_sr=in_sr,
                               in_dtype=in_dtype)
        pending.append((i, fn(transcriber.variables, jnp.asarray(flat),
                              jnp.int32(last_len))))
    for i, packed in pending:
        packed = np.asarray(packed)                # single pull
        t_st = (packed.shape[0] - 1) // 2
        preds, keep = packed[:t_st], packed[t_st : 2 * t_st].astype(bool)
        out[i] = ids_to_text(preds[keep], transcriber.cfg.labels)
    return out                                     # type: ignore


def transcribe_long(
    transcriber,
    signal: np.ndarray,
    *,
    chunk_seconds: float = 15.0,
    overlap_seconds: float = 2.0,
    signal_sr: Optional[int] = None,
    signal_encoding: Optional[str] = None,
) -> str:
    """Chunked long-form transcription through a Transcriber.

    signal_sr/int16/uint8-G.711 inputs behave as in transcribe_long_batch
    (device-side resample + PCM/G.711 conversion on the fused path;
    host-side on fallbacks)."""
    chunk, overlap, _ = _longform_grid(transcriber, chunk_seconds,
                                       overlap_seconds)
    opts = getattr(transcriber, "opts", None)
    decoder = opts.decoder if opts is not None else "greedy"
    prep = _prep_longform(transcriber, signal, signal_sr, chunk, overlap,
                          signal_encoding)
    if prep is not None:
        import jax.numpy as jnp

        n_spans, flat, last_len, in_sr, in_dtype = prep
        fn = _longform_program(transcriber, n_spans, chunk, overlap,
                               want_lp=decoder != "greedy", in_sr=in_sr,
                               in_dtype=in_dtype)
        if decoder == "greedy":
            from vietasr_tpu.ops.greedy import ids_to_text

            packed = np.asarray(fn(transcriber.variables,
                                   jnp.asarray(flat),
                                   jnp.int32(last_len)))
            t_st = (packed.shape[0] - 1) // 2
            preds = packed[:t_st]
            keep = packed[t_st : 2 * t_st].astype(bool)
            return ids_to_text(preds[keep], transcriber.cfg.labels)
        log_probs, total = fn(transcriber.variables, jnp.asarray(flat),
                              jnp.int32(last_len))
        total = int(total)
    else:
        # fallback paths take model-rate float32: convert on host
        if signal.dtype == np.uint8:
            from vietasr_tpu.audio.g711 import alaw_decode, ulaw_decode

            dec = ulaw_decode if signal_encoding == "ulaw" else alaw_decode
            if signal_encoding not in ("ulaw", "alaw"):
                raise ValueError(
                    "uint8 signals are G.711 wire bytes; pass "
                    "signal_encoding='ulaw' or 'alaw'")
            signal = dec(signal).astype(np.float32) / 32768.0
        elif signal.dtype == np.int16:
            signal = signal.astype(np.float32) / 32768.0
        sr = transcriber.cfg.featurizer.sample_rate
        if signal_sr is not None and signal_sr != sr:
            from vietasr_tpu.audio.io import resample

            signal = resample(signal, signal_sr, sr)
        log_probs, total = long_form_log_probs(
            transcriber, signal, chunk_seconds=chunk_seconds,
            overlap_seconds=overlap_seconds, device=True)
    if opts is not None and opts.decoder == "device_beam":
        from vietasr_tpu.ops.device_beam import device_beam_transcripts

        labels = transcriber.cfg.labels
        space = labels.index(" ") if " " in labels else -1
        # keep the static stitched length and mask via `total`: slicing to
        # a per-utterance :total would force one beam compile per length
        if getattr(transcriber, "_device_word_lm", None) is not None:
            return device_beam_transcripts(
                log_probs[None], np.array([total]), labels,
                beam_width=opts.beam_width,
                word_lm=transcriber._device_word_lm,
                wlm_probes=transcriber._device_wlm_probes, space=space,
                alpha=opts.lm_alpha, beta=opts.lm_beta,
                cutoff_top_n=opts.device_beam_cutoff_top_n)[0]
        return device_beam_transcripts(
            log_probs[None], np.array([total]), labels,
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
