"""Web serving tests: HTTP upload + websocket mic path against a live
server with a tiny model."""

import asyncio
import io
import json
import urllib.request
import wave

import numpy as np
import pytest

from vietasr_tpu.serve import AsrServer

from test_streaming import _FakeTranscriber


def wav_bytes(samples: np.ndarray, sr: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


class _PipelineShim(_FakeTranscriber):
    """Give the fake transcriber the pipeline surface the server needs."""

    @property
    def buckets(self):
        return [16000 * 17]

    def transcribe(self, signal):
        lp, lens = self.log_probs(signal)
        from vietasr_tpu.ops.greedy import ctc_collapse, ids_to_text

        ids = ctc_collapse(np.argmax(lp[0, : int(lens[0])], -1), blank=3)
        return ids_to_text(ids, self.cfg.labels)

    def transcribe_long(self, signal, **kw):
        return self.transcribe(signal[: 16000 * 17])


@pytest.fixture(scope="module")
def server():
    s = AsrServer(_PipelineShim(), host="127.0.0.1", port=18301)
    s.start(background=True)
    import time

    time.sleep(0.3)
    yield s
    s.stop()


def test_healthz(server):
    with urllib.request.urlopen("http://127.0.0.1:18301/healthz") as r:
        assert json.load(r)["status"] == "ok"


def test_index_served(server):
    with urllib.request.urlopen("http://127.0.0.1:18301/") as r:
        page = r.read().decode()
    assert "vietasr_tpu" in page
    assert "18302" in page        # ws port substituted


def test_upload_roundtrip(server):
    rng = np.random.RandomState(0)
    data = wav_bytes(rng.randn(16000).astype(np.float32) * 0.1)
    req = urllib.request.Request("http://127.0.0.1:18301/upload", data=data,
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        out = json.load(r)
    assert "transcript" in out
    assert abs(out["duration"] - 1.0) < 0.01


def test_upload_resamples_8k(server):
    rng = np.random.RandomState(1)
    data = wav_bytes(rng.randn(8000).astype(np.float32) * 0.1, sr=8000)
    req = urllib.request.Request("http://127.0.0.1:18301/upload", data=data,
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        out = json.load(r)
    assert abs(out["duration"] - 1.0) < 0.02   # 8 kHz resampled to 16 kHz


def test_upload_garbage_is_400(server):
    req = urllib.request.Request("http://127.0.0.1:18301/upload",
                                 data=b"not a wav", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_websocket_mic_path(server):
    import websockets

    async def run():
        rng = np.random.RandomState(2)
        data = wav_bytes(rng.randn(8000).astype(np.float32) * 0.1)
        async with websockets.connect("ws://127.0.0.1:18302") as ws:
            await ws.send(data)                    # binary frame
            out1 = json.loads(await ws.recv())
            import base64

            await ws.send(json.dumps(
                {"audio": base64.b64encode(data).decode()}))
            out2 = json.loads(await ws.recv())
        return out1, out2

    out1, out2 = asyncio.run(run())
    assert "transcript" in out1
    assert out1["transcript"] == out2["transcript"]
