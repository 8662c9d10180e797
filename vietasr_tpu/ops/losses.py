"""Common loss functions beyond CTC.

Reference: nemo/backends/pytorch/common/losses.py — SequenceLoss /
CrossEntropyLossNM (:106), MSELoss (:168), LossAggregatorNM (:204). These
back the classification head and any seq2seq extensions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       *, weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean softmax cross entropy; labels are int ids, optional per-example
    weights (reference CrossEntropyLossNM semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weights is not None:
        return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1e-9)
    return jnp.mean(nll)


def sequence_loss(log_probs: jnp.ndarray, targets: jnp.ndarray,
                  lengths: jnp.ndarray, *, pad_id: int = 0,
                  smoothing: float = 0.0) -> jnp.ndarray:
    """Token-level NLL over padded sequences with optional label smoothing
    (reference SequenceLoss, common/losses.py:11-103). log_probs (B, T, V)."""
    b, t, v = log_probs.shape
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    if smoothing > 0:
        uniform = -jnp.mean(log_probs, axis=-1)
        nll = (1 - smoothing) * nll + smoothing * uniform
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    mask = mask & (targets != pad_id)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def mse_loss(predictions: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((predictions - targets) ** 2)


def aggregate_losses(losses: Sequence[jnp.ndarray],
                     weights: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """Weighted sum of losses (reference LossAggregatorNM)."""
    if weights is None:
        weights = [1.0] * len(losses)
    total = jnp.zeros(())
    for loss, w in zip(losses, weights):
        total = total + w * loss
    return total
