"""Native (C++) components, loaded via ctypes.

The reference's native substrate was KenLM + the Baidu/pyctcdecode beam
search (SURVEY.md §2.9). Ours is one self-contained shared library,
`libctcbeam.so`, built from ctc_beam.cc on first use (g++ is in the image;
pybind11 is not, hence ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ctc_beam.cc")
_LIB = os.path.join(_DIR, "libctcbeam.so")


def build_native(force: bool = False) -> str:
    """Compile the shared library if missing or stale."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native())
        lib.vba_lm_load.restype = ctypes.c_void_p
        lib.vba_lm_load.argtypes = [ctypes.c_char_p]
        lib.vba_lm_free.argtypes = [ctypes.c_void_p]
        lib.vba_lm_order.restype = ctypes.c_int
        lib.vba_lm_order.argtypes = [ctypes.c_void_p]
        lib.vba_lm_logp.restype = ctypes.c_float
        lib.vba_lm_logp.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_char_p]
        lib.vba_beam_decode.restype = ctypes.c_int
        lib.vba_beam_decode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.c_float,
            ctypes.c_char_p, ctypes.c_int,
        ]
        _lib = lib
    return _lib


class NativeLM:
    """ctypes handle over the C++ ARPA LM."""

    def __init__(self, path: str):
        self._lib = _load()
        self._h = self._lib.vba_lm_load(path.encode())
        if not self._h:
            raise IOError(f"failed to load ARPA LM: {path}")

    @property
    def order(self) -> int:
        return self._lib.vba_lm_order(self._h)

    def log_prob(self, word: str, context: Sequence[str] = ()) -> float:
        return float(self._lib.vba_lm_logp(
            self._h, word.encode(), " ".join(context).encode()))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.vba_lm_free(self._h)
        except Exception:
            pass


class CtcBeamNative:
    """Native CTC prefix beam search with optional LM fusion."""

    def __init__(self, labels: Sequence[str], *, lm_path: Optional[str] = None,
                 alpha: float = 0.5, beta: float = 1.5,
                 token_min_logp: float = -10.0, cutoff_top_n: int = 40,
                 beam_prune_logp: float = -20.0):
        self._lib = _load()
        self.labels = list(labels)
        self.alpha = alpha
        self.beta = beta
        self.token_min_logp = token_min_logp
        # reference defaults: cutoff_top_n=40 vocabulary pruning
        # (beam_search_decoder.py:34-36)
        self.cutoff_top_n = cutoff_top_n
        self.beam_prune_logp = beam_prune_logp
        self._label_bytes = [l.encode() for l in self.labels]
        self._label_arr = (ctypes.c_char_p * len(self._label_bytes))(
            *self._label_bytes)
        self._lm = NativeLM(lm_path) if lm_path else None

    def decode(self, log_probs: np.ndarray, beam_width: int = 100) -> str:
        lp = np.ascontiguousarray(log_probs, np.float32)
        t, v = lp.shape
        assert v == len(self.labels) + 1, (v, len(self.labels))
        out = ctypes.create_string_buffer(4 * t + 16)
        n = self._lib.vba_beam_decode(
            lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, v,
            self._label_arr, len(self.labels),
            self._lm._h if self._lm else None,
            self.alpha, self.beta, beam_width, self.token_min_logp,
            self.cutoff_top_n, self.beam_prune_logp,
            out, len(out))
        if n < 0:
            raise RuntimeError("beam decode output overflow")
        return out.value.decode("utf-8")

    def decode_batch(self, log_probs: np.ndarray, lengths: np.ndarray,
                     beam_width: int = 100) -> List[str]:
        return [self.decode(log_probs[i, : int(lengths[i])], beam_width)
                for i in range(log_probs.shape[0])]
