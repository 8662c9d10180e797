"""Lightweight runtime tensor contracts.

The reference's neural type system (nemo/core/neural_types/, SURVEY §2.3)
type-checks module ports at graph-build time and raises
NeuralPortNmTensorMismatchError on mismatch. In a jit-traced framework the
compiler catches shape errors, but the *semantic* layer (is this axis
batch? are these log-probs?) is worth keeping as cheap assertions at the
public API boundaries. These run under jit (shape/dtype checks are
trace-time) and raise ContractError with a port-style message.
"""

from __future__ import annotations

from typing import Optional


class ContractError(TypeError):
    """Semantic tensor mismatch at an API boundary (the
    NeuralPortNmTensorMismatchError equivalent)."""


def _fail(port: str, expected: str, got) -> None:
    raise ContractError(
        f"port {port!r}: expected {expected}, got shape "
        f"{tuple(got.shape)} dtype {got.dtype}")


def assert_waveform(signal, *, port: str = "signal"):
    """(S,) or (B, S) float waveform — the Transcriber/serve ingestion
    contract (int16 PCM must be scaled to float first)."""
    if getattr(signal, "ndim", None) not in (1, 2):
        _fail(port, "(S,) or (B, S) float waveform", signal)
    if not str(signal.dtype).startswith("float"):
        raise ContractError(
            f"port {port!r}: expected float waveform in [-1, 1], got dtype "
            f"{signal.dtype} (scale int PCM by 1/32768 first)")


def assert_audio_batch(signal, lengths=None, *, port: str = "audio_signal"):
    """(B, S) float waveform [+ (B,) int lengths]."""
    if signal.ndim != 2 or not str(signal.dtype).startswith("float"):
        _fail(port, "(B, S) float waveform", signal)
    if lengths is not None:
        if lengths.ndim != 1 or lengths.shape[0] != signal.shape[0] \
                or not str(lengths.dtype).startswith("int"):
            _fail(f"{port}.lengths", f"({signal.shape[0]},) int", lengths)


def assert_features(feats, *, n_features: Optional[int] = None,
                    port: str = "features"):
    """(B, T, D) float features (channels LAST — NWC layout).

    Detects the reference's (B, D, T) channels-first layout passed by
    mistake: the axis-semantics check of the neural type system
    (TRANSPOSE_SAME in nemo/core/neural_types/comparison.py)."""
    if feats.ndim != 3 or not str(feats.dtype).startswith(("float", "bfloat")):
        _fail(port, "(B, T, D) float features", feats)
    if n_features is not None and feats.shape[2] != n_features:
        if feats.shape[1] == n_features:
            raise ContractError(
                f"port {port!r}: axes look TRANSPOSED — expected channels "
                f"last (B, T, {n_features}), got {tuple(feats.shape)} "
                "(channels-first, the reference's torch layout)")
        _fail(port, f"(B, T, {n_features}) features", feats)


def assert_log_probs(log_probs, *, num_classes: Optional[int] = None,
                     port: str = "log_probs"):
    """(B, T, V+1) float log-probabilities (blank = last class)."""
    if log_probs.ndim != 3 or not str(log_probs.dtype).startswith("float"):
        _fail(port, "(B, T, V+1) float log-probs", log_probs)
    if num_classes is not None and log_probs.shape[2] != num_classes + 1:
        if log_probs.shape[1] == num_classes + 1:
            raise ContractError(
                f"port {port!r}: axes look TRANSPOSED — expected "
                f"(B, T, {num_classes + 1}) with classes last, got "
                f"{tuple(log_probs.shape)}")
        _fail(port, f"(B, T, {num_classes + 1}) log-probs", log_probs)


def assert_labels(tokens, lengths=None, *, port: str = "targets"):
    """(B, L) int label ids [+ (B,) int lengths]."""
    if tokens.ndim != 2 or not str(tokens.dtype).startswith("int"):
        _fail(port, "(B, L) int labels", tokens)
    if lengths is not None and (lengths.ndim != 1
                                or lengths.shape[0] != tokens.shape[0]):
        _fail(f"{port}.lengths", f"({tokens.shape[0]},) int", lengths)
