"""MP3 decode (audio/mp3.py, libmpg123 ctypes) round-trip tests.

Fixtures are REAL mp3 streams encoded in-process with the system
libmp3lame — no binary blobs checked in, no ffmpeg. Mirrors the
reference's mp3 ingestion surface (segment.py:89-100 librosa fallback,
infer.py:199-201 mp3 branch) at waveform level: decode must recover the
encoded signal up to codec delay + quantization noise.
"""

import ctypes
import ctypes.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vietasr_tpu.audio import mp3 as mp3mod
from vietasr_tpu.audio.io import read_audio, read_wav

pytestmark = pytest.mark.skipif(
    not mp3mod.available(), reason="libmpg123 not on this system")

_lame = None


def lame_encode(pcm_f32: np.ndarray, sr: int, bitrate: int = 128) -> bytes:
    """Encode mono float32 [-1,1] -> mp3 bytes via system libmp3lame."""
    global _lame
    if _lame is None:
        name = ctypes.util.find_library("mp3lame")
        if name is None:
            pytest.skip("libmp3lame not on this system")
        _lame = ctypes.CDLL(name)
        _lame.lame_init.restype = ctypes.c_void_p
        for fn in ("lame_set_num_channels", "lame_set_in_samplerate",
                   "lame_set_brate", "lame_set_mode", "lame_init_params"):
            getattr(_lame, fn).argtypes = [ctypes.c_void_p] + \
                ([ctypes.c_int] if fn != "lame_init_params" else [])
        _lame.lame_encode_buffer.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        _lame.lame_encode_flush.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        _lame.lame_close.argtypes = [ctypes.c_void_p]
    gfp = _lame.lame_init()
    _lame.lame_set_num_channels(gfp, 1)
    _lame.lame_set_in_samplerate(gfp, sr)
    _lame.lame_set_brate(gfp, bitrate)
    _lame.lame_set_mode(gfp, 3)  # MONO
    assert _lame.lame_init_params(gfp) >= 0
    pcm = np.clip(pcm_f32 * 32767.0, -32768, 32767).astype(np.int16)
    pcm = np.ascontiguousarray(pcm)
    out = ctypes.create_string_buffer(len(pcm) * 2 + 7200)
    n = _lame.lame_encode_buffer(
        gfp, pcm.ctypes.data_as(ctypes.c_void_p), None, len(pcm),
        out, len(out))
    assert n >= 0, f"lame_encode_buffer error {n}"
    tail = ctypes.create_string_buffer(7200)
    m = _lame.lame_encode_flush(gfp, tail, len(tail))
    _lame.lame_close(gfp)
    return out.raw[:n] + tail.raw[:m]


def _aligned_corr(ref: np.ndarray, dec: np.ndarray, max_lag: int = 4000):
    """Best normalized cross-correlation over codec-delay lags."""
    best = -1.0
    n = min(len(ref), len(dec) - 1) - max_lag
    r = ref[:n] - ref[:n].mean()
    rn = np.linalg.norm(r) + 1e-9
    for lag in range(max_lag):
        d = dec[lag: lag + n] - dec[lag: lag + n].mean()
        c = float(np.dot(r, d) / (rn * (np.linalg.norm(d) + 1e-9)))
        if c > best:
            best = c
    return best


@pytest.mark.parametrize("sr", [16000, 44100, 8000])
def test_sine_roundtrip(sr):
    t = np.arange(int(sr * 0.6)) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    blob = lame_encode(sig, sr)
    dec, out_sr = mp3mod.decode_mp3(blob)
    assert out_sr == sr
    # length within codec delay + one flush frame granule
    assert abs(len(dec) - len(sig)) < 4000
    assert _aligned_corr(sig, dec) > 0.98


def test_read_audio_mp3_path_and_resample(tmp_path):
    sr = 44100
    t = np.arange(int(sr * 0.5)) / sr
    sig = (0.4 * np.sin(2 * np.pi * 300.0 * t)).astype(np.float32)
    p = tmp_path / "tone.mp3"
    p.write_bytes(lame_encode(sig, sr))
    dec, out_sr = read_audio(str(p), target_sr=16000)
    assert out_sr == 16000
    assert abs(len(dec) - int(0.5 * 16000)) < 2000
    # spectral check after resample: peak stays at 300 Hz
    spec = np.abs(np.fft.rfft(dec * np.hanning(len(dec))))
    peak_hz = np.argmax(spec) * 16000 / len(dec)
    assert abs(peak_hz - 300.0) < 10.0


def test_read_wav_sniffs_extensionless_mp3_bytes():
    sr = 16000
    rng = np.random.RandomState(7)
    sig = (0.2 * rng.randn(sr // 2)).astype(np.float32)
    blob = lame_encode(sig, sr)
    assert mp3mod.looks_like_mp3(blob[:4])
    dec, out_sr = read_wav(blob)  # raw bytes, serve upload path
    assert out_sr == sr
    assert len(dec) > sr // 4


def test_real_speech_wav_through_mp3(tmp_path):
    wavs = sorted(__import__("glob").glob(
        "/root/reference/audio_samples/*.wav"))
    if not wavs:
        pytest.skip("no bundled wavs")
    sig, sr = read_audio(wavs[0], target_sr=16000)
    blob = lame_encode(sig, 16000)
    p = tmp_path / "speech.mp3"
    p.write_bytes(blob)
    dec, out_sr = read_audio(str(p))
    assert out_sr == 16000
    assert _aligned_corr(sig, dec) > 0.90


def test_garbage_mp3_fails_loud():
    with pytest.raises((ValueError, RuntimeError)):
        mp3mod.decode_mp3(b"\xff\xfb" + b"\x00" * 64)


def test_leading_junk_still_decodes():
    """Streams with junk before the first frame sync (common in
    call-center dumps; the reference's ffmpeg path handled them) decode
    via the find_frame_sync sniff + mpg123's own resync."""
    sr = 16000
    rng = np.random.RandomState(11)
    sig = (0.2 * rng.randn(sr // 2)).astype(np.float32)
    blob = lame_encode(sig, sr)
    junk = b"CALLLOG\x01\x02\x03" * 5          # no 0xFF sync bytes
    assert not mp3mod.looks_like_mp3(junk[:4])
    assert mp3mod.find_frame_sync(junk + blob) > 0
    dec, out_sr = read_wav(junk + blob)
    assert out_sr == sr
    assert len(dec) > sr // 4


def test_find_frame_sync_rejects_nonsync_bytes():
    assert mp3mod.find_frame_sync(b"\x00" * 100) == -1
    # 0xFF present but invalid header bits (reserved version+layer)
    assert mp3mod.find_frame_sync(b"ab\xff\x1f" * 10) == -1


def test_mid_stream_format_change_raises():
    """Two concatenated streams with different sample rates must raise,
    not silently mis-rate the tail."""
    rng = np.random.RandomState(5)
    a = lame_encode((0.2 * rng.randn(8000)).astype(np.float32), 16000)
    b = lame_encode((0.2 * rng.randn(4000)).astype(np.float32), 8000)
    with pytest.raises(ValueError, match="mid-stream"):
        mp3mod.decode_mp3(a + b)
