"""Websocket real-time streaming session against a live server."""

import asyncio
import json

import numpy as np
import pytest

from vietasr_tpu.serve import AsrServer
from vietasr_tpu.serve.streams import StreamPool
from vietasr_tpu.streaming_online import OnlineTranscriber

from test_serve import _PipelineShim
from test_streaming_online import small_model


@pytest.fixture(scope="module")
def server():
    cfg, variables = small_model(normalize="")
    ot = OnlineTranscriber(cfg, variables, causal_norm=False)
    pool = StreamPool(ot, slots=2, chunk_samples=3200)
    s = AsrServer(_PipelineShim(), host="127.0.0.1", port=18501,
                  stream_pool=pool)
    s.start(background=True)
    import time

    time.sleep(0.3)
    yield s
    s.stop()


def test_streaming_session(server):
    import websockets

    async def run():
        rng = np.random.RandomState(0)
        sig = (rng.randn(16000) * 0.1).astype(np.float32)
        pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes()
        partials, final = [], None
        async with websockets.connect("ws://127.0.0.1:18502") as ws:
            await ws.send(json.dumps({"mode": "stream"}))
            ready = json.loads(await ws.recv())
            assert ready.get("ready")
            # send in uneven network-sized pieces
            for i in range(0, len(pcm), 5000):
                await ws.send(pcm[i:i + 5000])
            await ws.send(json.dumps({"type": "end"}))
            while True:
                msg = json.loads(await ws.recv())
                if "final" in msg:
                    final = msg["final"]
                    break
                if "partial" in msg:
                    partials.append(msg["partial"])
        return partials, final

    partials, final = asyncio.run(run())
    assert final is not None
    # the final transcript contains everything the partials emitted
    assert "".join(partials) in (final or "".join(partials) + " ") \
        or final.startswith("".join(partials))


def test_streaming_session_ulaw_wire(server):
    """Same session over the 8-bit G.711 mu-law wire ({"encoding":
    "ulaw"}): half the upstream bytes, decoded on the accelerator. The
    final transcript must match a PCM16 session over the identical
    (mu-law-quantized) audio."""
    import websockets

    from vietasr_tpu.audio.g711 import ulaw_decode, ulaw_encode

    rng = np.random.RandomState(3)
    sig = (rng.randn(16000) * 0.1).astype(np.float32)
    codes = ulaw_encode(sig)
    pcm = ulaw_decode(codes).tobytes()

    async def run(first_msg, payload):
        final = None
        async with websockets.connect("ws://127.0.0.1:18502") as ws:
            await ws.send(json.dumps(first_msg))
            assert json.loads(await ws.recv()).get("ready")
            for i in range(0, len(payload), 5000):
                await ws.send(payload[i:i + 5000])
            await ws.send(json.dumps({"type": "end"}))
            while True:
                msg = json.loads(await ws.recv())
                if "final" in msg:
                    return msg["final"]

    f_ulaw = asyncio.run(run({"mode": "stream", "encoding": "ulaw"},
                             codes.tobytes()))
    f_pcm = asyncio.run(run({"mode": "stream"}, pcm))
    assert f_ulaw == f_pcm


def test_streaming_rejects_unknown_encoding(server):
    import websockets

    async def run():
        async with websockets.connect("ws://127.0.0.1:18502") as ws:
            await ws.send(json.dumps({"mode": "stream",
                                      "encoding": "opus"}))
            return json.loads(await ws.recv())

    msg = asyncio.run(run())
    assert "unsupported encoding" in msg.get("error", "")


def test_streaming_rejected_when_slots_busy(server):
    import websockets

    async def run():
        async with websockets.connect("ws://127.0.0.1:18502") as a, \
                websockets.connect("ws://127.0.0.1:18502") as b, \
                websockets.connect("ws://127.0.0.1:18502") as c:
            await a.send(json.dumps({"mode": "stream"}))
            await b.send(json.dumps({"mode": "stream"}))
            assert json.loads(await a.recv()).get("ready")
            assert json.loads(await b.recv()).get("ready")
            await c.send(json.dumps({"mode": "stream"}))
            msg = json.loads(await c.recv())
            return msg

    msg = asyncio.run(run())
    assert "busy" in msg.get("error", "")


def test_beam_revision_framing_matches_client_rules():
    """The demo page reconstructs partials with: '\\r'+text => replace,
    else append. That reconstruction must equal the decoder's current best
    after EVERY chunk — the JS protocol framing contract, server-side."""
    from vietasr_tpu.serve.streams import IncrementalBeam

    rng = np.random.RandomState(0)
    labels = ["a", "b", "c", " "]
    dec = IncrementalBeam(labels, blank=len(labels), beam_width=8)
    shown = ""
    for _ in range(12):
        logits = rng.randn(5, len(labels) + 1).astype(np.float32) * 2.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        out = dec.feed(lp)
        if out.startswith("\r"):
            shown = out[1:]
        else:
            shown += out
        assert shown == dec.text, (shown, dec.text)


def test_streaming_session_beam_pool():
    """End-to-end ws session against a BEAM-decoder pool: client framing
    rules reconstruct exactly the final transcript."""
    import time

    import websockets

    cfg, variables = small_model(normalize="")
    ot = OnlineTranscriber(cfg, variables, causal_norm=False)
    pool = StreamPool(ot, slots=1, chunk_samples=3200, decoder="beam",
                      beam_width=4)
    s = AsrServer(_PipelineShim(), host="127.0.0.1", port=18511,
                  stream_pool=pool)
    s.start(background=True)
    time.sleep(0.3)
    try:
        async def run():
            rng = np.random.RandomState(1)
            sig = (rng.randn(12800) * 0.1).astype(np.float32)
            pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes()
            shown, final = "", None
            async with websockets.connect("ws://127.0.0.1:18512") as ws:
                await ws.send(json.dumps({"mode": "stream"}))
                assert json.loads(await ws.recv()).get("ready")
                for i in range(0, len(pcm), 6400):
                    await ws.send(pcm[i:i + 6400])
                await ws.send(json.dumps({"type": "end"}))
                while True:
                    msg = json.loads(await ws.recv())
                    if "partial" in msg:
                        p = msg["partial"]
                        shown = p[1:] if p.startswith("\r") else shown + p
                    if "final" in msg:
                        final = msg["final"]
                        break
            return shown, final

        shown, final = asyncio.run(run())
        assert final is not None
        assert shown == final, (shown, final)
    finally:
        s.stop()
