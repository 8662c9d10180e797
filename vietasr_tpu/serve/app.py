"""Web demo + serving API.

Feature parity with the reference Flask+SocketIO app
(/root/reference/app.py:37-91): file upload transcription, microphone audio
over a websocket, and an HTML page tying them together — built on stdlib
http.server + the `websockets` package (Flask isn't in this image, and a
dependency-free server suits a framework anyway).

Routes:
  GET  /            -> demo page (templates/index.html)
  GET  /healthz     -> {"status": "ok"}
  POST /upload      -> body = wav bytes (or multipart), returns
                       {"filepath", "transcript"} like the reference
                       (app.py:72-91)
  ws   :{port+1}    -> each binary/base64 wav message answers
                       {"transcript": ...} (reference 'audio_to_server' /
                       'audio_to_client' events, app.py:58-69)

Incoming audio is resampled to the model rate (8 kHz call-center audio is
handled, reference app.py:66 uses librosa.load(sr=16000)).
"""

from __future__ import annotations

import asyncio
import base64
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from vietasr_tpu.audio.io import read_wav, resample

_HTML_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "index.html")


class AsrServer:
    def __init__(self, transcriber, *, host: str = "0.0.0.0",
                 port: int = 5000, record_dir: Optional[str] = None,
                 max_seconds: float = 0.0, stream_pool=None):
        self.transcriber = transcriber
        self.host = host
        self.port = port
        self.ws_port = port + 1
        self.record_dir = record_dir
        self.max_seconds = max_seconds
        # optional serve.streams.StreamPool for real-time partial results
        self.stream_pool = stream_pool
        if record_dir:
            os.makedirs(record_dir, exist_ok=True)
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._ws_loop: Optional[asyncio.AbstractEventLoop] = None
        self._lock = threading.Lock()   # one forward at a time per chip

    # ------------------------------------------------------------------

    def transcribe_wav_bytes(self, data: bytes) -> dict:
        samples, sr = read_wav(data)
        target = self.transcriber.cfg.featurizer.sample_rate
        if sr != target:
            samples = resample(samples, sr, target)
        path = None
        if self.record_dir:
            path = os.path.join(self.record_dir, f"{int(time.time()*1000)}.wav")
            with open(path, "wb") as f:
                f.write(data)
        with self._lock:
            if self.max_seconds and len(samples) > self.max_seconds * target:
                text = self.transcriber.transcribe_long(samples)
            elif len(samples) > self.transcriber.buckets[-1]:
                text = self.transcriber.transcribe_long(samples)
            else:
                text = self.transcriber.transcribe(samples)
        return {"filepath": path, "transcript": text,
                "duration": len(samples) / target}

    # ------------------------------------------------------------------
    # HTTP

    def _make_handler(server):  # noqa: N805 — closure over the server
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _json(self, code: int, obj: dict):
                body = json.dumps(obj, ensure_ascii=False).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    with open(_HTML_PATH, "rb") as f:
                        body = f.read()
                    body = body.replace(b"{{WS_PORT}}",
                                        str(server.ws_port).encode())
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/healthz":
                    self._json(200, {"status": "ok"})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/upload":
                    self._json(404, {"error": "not found"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    self._json(400, {"error": "empty body"})
                    return
                data = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("multipart/form-data"):
                    data = _extract_multipart_file(data, ctype)
                    if data is None:
                        self._json(400, {"error": "no file field"})
                        return
                try:
                    result = server.transcribe_wav_bytes(data)
                except Exception as e:  # noqa: BLE001 — report to client
                    self._json(400, {"error": f"decode failed: {e}"})
                    return
                self._json(200, result)

        return Handler

    # ------------------------------------------------------------------
    # websocket (mic streaming)

    async def _ws_handler(self, websocket):
        first = True
        async for message in websocket:
            try:
                if first and isinstance(message, str):
                    obj = json.loads(message)
                    if obj.get("mode") == "stream":
                        await self._stream_session(
                            websocket, obj.get("encoding", "pcm16"))
                        return
                first = False
                if isinstance(message, bytes):
                    data = message
                else:
                    obj = json.loads(message)
                    data = base64.b64decode(obj["audio"])
                result = await asyncio.get_event_loop().run_in_executor(
                    None, self.transcribe_wav_bytes, data)
                await websocket.send(json.dumps(result, ensure_ascii=False))
            except Exception as e:  # noqa: BLE001
                await websocket.send(json.dumps({"error": str(e)}))

    async def _stream_session(self, websocket, encoding: str = "pcm16"):
        """Real-time session: client sends raw 16 kHz binary frames —
        PCM16 by default, or 8-bit G.711 mu-law when the opening message
        carries {"encoding": "ulaw"} (half the upstream bytes; decoded on
        the accelerator). Server answers {"partial": ...} per chunk and
        {"final": ...} on {"type": "end"}. Requires a StreamPool
        (serve --streaming)."""
        if self.stream_pool is None:
            await websocket.send(json.dumps(
                {"error": "streaming disabled; start the server with a "
                          "stream pool"}))
            return
        if encoding not in ("pcm16", "ulaw"):
            await websocket.send(json.dumps(
                {"error": f"unsupported encoding {encoding!r} "
                          "(pcm16 or ulaw)"}))
            return
        slot = self.stream_pool.open()
        if slot is None:
            await websocket.send(json.dumps({"error": "all stream slots "
                                             "busy"}))
            return
        loop = asyncio.get_event_loop()
        ulaw = encoding == "ulaw"
        bytes_per = 1 if ulaw else 2
        pad_byte = b"\xff" if ulaw else b"\x00"    # mu-law code for 0
        parse = (lambda b: np.frombuffer(b, np.uint8)) if ulaw \
            else (lambda b: np.frombuffer(b, "<i2"))
        chunk_bytes = self.stream_pool.chunk_samples * bytes_per
        buf = b""
        await websocket.send(json.dumps({"ready": True, "slot": slot}))
        try:
            async for message in websocket:
                if isinstance(message, str):
                    obj = json.loads(message)
                    if obj.get("type") == "end":
                        break
                    continue
                buf += message
                while len(buf) >= chunk_bytes:
                    raw, buf = buf[:chunk_bytes], buf[chunk_bytes:]
                    # int16/mu-law pass through to the pool (decoded and
                    # scaled on device)
                    samples = parse(raw)
                    out = await loop.run_in_executor(
                        None, self.stream_pool.feed, {slot: samples})
                    if out.get(slot):
                        await websocket.send(json.dumps(
                            {"partial": out[slot]}, ensure_ascii=False))
            # flush: pad tail + drain the model lookahead with silence;
            # emissions surfaced here are still partials the client must
            # see, or its reconstructed line diverges from the final
            if buf:
                pad = buf + pad_byte * (chunk_bytes - len(buf))
                samples = parse(pad)
                out = await loop.run_in_executor(
                    None, self.stream_pool.feed, {slot: samples})
                if out.get(slot):
                    await websocket.send(json.dumps(
                        {"partial": out[slot]}, ensure_ascii=False))
            pieces = await loop.run_in_executor(
                None, lambda: self.stream_pool.flush(slot,
                                                     return_pieces=True))
            for piece in pieces:
                if piece:
                    await websocket.send(json.dumps(
                        {"partial": piece}, ensure_ascii=False))
        finally:
            final = self.stream_pool.close(slot)
            try:
                await websocket.send(json.dumps({"final": final},
                                                ensure_ascii=False))
            except Exception:  # noqa: BLE001 — client may have vanished
                pass

    def _run_ws(self):
        import websockets

        async def main():
            async with websockets.serve(self._ws_handler, self.host,
                                        self.ws_port):
                await asyncio.Future()

        self._ws_loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._ws_loop)
        try:
            self._ws_loop.run_until_complete(main())
        except RuntimeError:
            pass

    # ------------------------------------------------------------------

    def start(self, *, background: bool = False):
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._make_handler())
        ws_thread = threading.Thread(target=self._run_ws, daemon=True)
        ws_thread.start()
        if background:
            t = threading.Thread(target=self._httpd.serve_forever,
                                 daemon=True)
            t.start()
            return self
        try:
            self._httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        return self

    def stop(self):
        if self._httpd:
            self._httpd.shutdown()
        if self._ws_loop:
            self._ws_loop.call_soon_threadsafe(self._ws_loop.stop)


def _extract_multipart_file(data: bytes, content_type: str) -> Optional[bytes]:
    """Minimal multipart/form-data parser: returns the first file part."""
    marker = "boundary="
    idx = content_type.find(marker)
    if idx < 0:
        return None
    boundary = content_type[idx + len(marker):].strip().strip('"')
    delim = ("--" + boundary).encode()
    for part in data.split(delim):
        if b"filename=" not in part:
            continue
        header_end = part.find(b"\r\n\r\n")
        if header_end < 0:
            continue
        body = part[header_end + 4:]
        if body.endswith(b"\r\n"):
            body = body[:-2]
        return body
    return None


def serve(transcriber, **kwargs) -> AsrServer:
    server = AsrServer(transcriber, **kwargs)
    print(f"serving on http://{server.host}:{server.port} "
          f"(ws :{server.ws_port})")
    return server.start()
