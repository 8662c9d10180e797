"""Minimal Kaldi ark/scp feature reading.

Reference: KaldiFeatureDataLayer / KaldiFeatureDataset
(/root/reference/nemo/collections/asr/data_layer.py:193-337,
parts/dataset.py:175-302) read pre-computed features via kaldi_io. That
package isn't in this image, so the binary float-matrix ark format is
implemented directly (uncompressed "FM"/"DM" records; compressed "CM"
records raise with a clear message).
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


def _read_token(f) -> bytes:
    tok = b""
    while True:
        ch = f.read(1)
        if not ch or ch == b" ":
            break
        tok += ch
    return tok


def _read_matrix(f) -> np.ndarray:
    binary = f.read(2)
    if binary != b"\x00B":
        raise ValueError(f"expected binary kaldi header, got {binary!r} "
                         "(text-format arks are not supported)")
    mtype = _read_token(f)
    if mtype == b"CM":
        raise NotImplementedError(
            "compressed kaldi matrices (CM) not supported; regenerate with "
            "--compress=false")
    if mtype not in (b"FM", b"DM"):
        raise ValueError(f"unsupported kaldi matrix type {mtype!r}")
    dtype = np.float32 if mtype == b"FM" else np.float64

    def read_dim():
        size = struct.unpack("<b", f.read(1))[0]
        assert size == 4, size
        return struct.unpack("<i", f.read(4))[0]

    rows, cols = read_dim(), read_dim()
    data = np.frombuffer(f.read(rows * cols * dtype().itemsize), dtype=dtype)
    return data.reshape(rows, cols).astype(np.float32)


def read_ark(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (utterance_id, features (T, D)) from a binary ark file."""
    with open(path, "rb") as f:
        while True:
            key = _read_token(f)
            if not key:
                break
            yield key.decode("utf-8"), _read_matrix(f)


def read_scp(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate records via an scp index ("key ark_path:offset" lines)."""
    with open(path, "r", encoding="utf-8") as scp:
        for line in scp:
            line = line.strip()
            if not line:
                continue
            key, loc = line.split(None, 1)
            ark_path, offset = loc.rsplit(":", 1)
            with open(ark_path, "rb") as f:
                f.seek(int(offset))
                yield key, _read_matrix(f)


def write_ark(path: str, records: Dict[str, np.ndarray],
              scp_path: Optional[str] = None) -> None:
    """Write binary float-matrix ark (+ optional scp), for tests and
    interchange with Kaldi tooling."""
    scp_lines: List[str] = []
    with open(path, "wb") as f:
        for key, mat in records.items():
            f.write(key.encode("utf-8") + b" ")
            scp_lines.append(f"{key} {path}:{f.tell()}")
            f.write(b"\x00BFM ")
            mat = np.ascontiguousarray(mat, np.float32)
            for dim in mat.shape:
                f.write(struct.pack("<b", 4) + struct.pack("<i", dim))
            f.write(mat.tobytes())
    if scp_path:
        with open(scp_path, "w", encoding="utf-8") as f:
            f.write("\n".join(scp_lines) + "\n")


class KaldiFeatureDataset:
    """Pre-computed features + text from kaldi-style dirs (feats.scp,
    text), mirroring the reference KaldiFeatureDataset capabilities."""

    def __init__(self, feats_scp: str, text_path: str, tokenizer,
                 *, min_len: int = 0, max_len: int = 0):
        texts: Dict[str, str] = {}
        with open(text_path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split(None, 1)
                if len(parts) == 2:
                    texts[parts[0]] = parts[1]
        self.items: List[Tuple[str, np.ndarray, List[int]]] = []
        self.num_dropped = 0
        for key, feats in read_scp(feats_scp):
            text = texts.get(key)
            ids = tokenizer.encode(text) if text else None
            t = feats.shape[0]
            if ids is None or (min_len and t < min_len) \
                    or (max_len and t > max_len):
                self.num_dropped += 1
                continue
            self.items.append((key, feats, ids))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int):
        return self.items[i]
