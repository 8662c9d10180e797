"""G.711 mu-law / A-law: host codec bit-exact vs audioop, device decode
bit-exact vs host, G.711 WAV reading, and the 8-bit wire formats through
the long-form and StreamPool paths. The reference read telephony wavs
via libsndfile (segment.py:89-100); the wire formats are a TPU-native
extension (docs/rooflines.md §6/§7: serving there is upload-bound)."""

import io
import struct
import warnings

import numpy as np
import pytest

import jax.numpy as jnp

from vietasr_tpu.audio.g711 import (alaw_decode, alaw_encode, ulaw_decode,
                                    ulaw_encode)
from vietasr_tpu.ops.g711 import alaw_decode_f32, ulaw_decode_f32

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import audioop


ALL_I16 = np.arange(-32768, 32768, dtype=np.int16)
ALL_CODES = np.arange(256, dtype=np.uint8)


def test_ulaw_bit_exact_vs_audioop():
    want = np.frombuffer(audioop.lin2ulaw(ALL_I16.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(ulaw_encode(ALL_I16), want)
    want = np.frombuffer(audioop.ulaw2lin(ALL_CODES.tobytes(), 2), np.int16)
    np.testing.assert_array_equal(ulaw_decode(ALL_CODES), want)


def test_alaw_bit_exact_vs_audioop():
    want = np.frombuffer(audioop.lin2alaw(ALL_I16.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(alaw_encode(ALL_I16), want)
    want = np.frombuffer(audioop.alaw2lin(ALL_CODES.tobytes(), 2), np.int16)
    np.testing.assert_array_equal(alaw_decode(ALL_CODES), want)


def test_device_decode_matches_host():
    u = jnp.asarray(ALL_CODES)
    want = ulaw_decode(ALL_CODES).astype(np.float32) / 32768.0
    np.testing.assert_array_equal(np.asarray(ulaw_decode_f32(u)), want)
    want = alaw_decode(ALL_CODES).astype(np.float32) / 32768.0
    np.testing.assert_array_equal(np.asarray(alaw_decode_f32(u)), want)


def test_float_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    x = (rng.randn(20000) * 0.2).clip(-1, 1).astype(np.float32)
    rt = ulaw_decode(ulaw_encode(x)).astype(np.float32) / 32768.0
    # mu-law quantization: relative step ~1/16 per segment => fine near 0,
    # coarse near full scale; absolute error bounded by the top-segment step
    assert np.abs(rt - x).max() < 0.032


def _g711_wav_bytes(codes: np.ndarray, sr: int, tag: int) -> bytes:
    data = codes.tobytes()
    fmt = struct.pack("<HHIIHH", tag, 1, sr, sr, 1, 8)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) \
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return out


@pytest.mark.parametrize("tag", [7, 6])
def test_read_g711_wav(tag):
    from vietasr_tpu.audio.io import read_wav

    rng = np.random.RandomState(1)
    x = (rng.randn(8000) * 0.1).astype(np.float32)
    codes = ulaw_encode(x) if tag == 7 else alaw_encode(x)
    wav = _g711_wav_bytes(codes, 8000, tag)
    got, sr = read_wav(wav)
    assert sr == 8000
    dec = (ulaw_decode if tag == 7 else alaw_decode)(codes)
    np.testing.assert_array_equal(got, dec.astype(np.float32) / 32768.0)


@pytest.mark.slow
def test_longform_ulaw_wire_matches_int16():
    """The fused long-form program ingests uint8 mu-law and decodes on
    device; transcripts must match feeding the decoded int16 directly."""
    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions

    tr = Transcriber(
        "/root/reference/configs/quartznet12x1_vi.yaml",
        options=TranscriberOptions(buckets_seconds=(2.0,), max_batch=2,
                                   compute_dtype=None))
    rng = np.random.RandomState(2)
    wave = (rng.randn(4 * 8000) * 0.1).clip(-1, 1).astype(np.float32)
    codes = ulaw_encode(wave)
    pcm = ulaw_decode(codes)                       # what the wire carries
    t_u8 = tr.transcribe_long(codes, chunk_seconds=2.0,
                              overlap_seconds=0.4, signal_sr=8000,
                              signal_encoding="ulaw")
    t_i16 = tr.transcribe_long(pcm, chunk_seconds=2.0,
                               overlap_seconds=0.4, signal_sr=8000)
    assert t_u8 == t_i16


def test_longform_uint8_requires_encoding():
    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions

    tr = Transcriber(
        "/root/reference/configs/quartznet12x1_vi.yaml",
        options=TranscriberOptions(buckets_seconds=(2.0,), max_batch=2,
                                   compute_dtype=None))
    with pytest.raises(ValueError, match="signal_encoding"):
        tr.transcribe_long(np.zeros(4 * 8000, np.uint8),
                           chunk_seconds=2.0, overlap_seconds=0.4,
                           signal_sr=8000)
