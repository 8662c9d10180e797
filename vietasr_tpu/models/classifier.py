"""Speech classification head (speech commands / language ID).

Reference: JasperDecoderForClassification
(/root/reference/nemo/collections/asr/jasper.py:257-319) — adaptive avg/max
pool over time then a linear layer — paired with AudioToSpeechLabelDataLayer
(data_layer.py:449-607). Here: a masked pool (the reference pools over
padding too; we pool over valid frames, a documented improvement) + linear.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vietasr_tpu.models.layers import length_mask, xavier_uniform


def init_classifier_head(rng: jax.Array, feat_in: int, num_classes: int):
    w_rng, b_rng = jax.random.split(rng)
    return {
        "w": xavier_uniform(w_rng, (feat_in, num_classes), feat_in,
                            num_classes),
        "b": jax.random.uniform(b_rng, (num_classes,), jnp.float32,
                                -(feat_in ** -0.5), feat_in ** -0.5),
    }


def classifier_apply(head: dict, encoded: jnp.ndarray, enc_lens: jnp.ndarray,
                     *, pooling: str = "avg",
                     return_logits: bool = True) -> jnp.ndarray:
    """encoded: (B, T, C) from the QuartzNet encoder -> (B, num_classes)."""
    mask = length_mask(encoded.shape[1], enc_lens, encoded.dtype)
    if pooling == "avg":
        denom = jnp.maximum(enc_lens.astype(encoded.dtype), 1.0)[:, None]
        pooled = jnp.sum(encoded * mask, axis=1) / denom
    elif pooling == "max":
        pooled = jnp.max(jnp.where(mask > 0, encoded, -jnp.inf), axis=1)
    else:
        raise ValueError("pooling must be 'avg' or 'max'")
    logits = pooled @ head["w"] + head["b"]
    if return_logits:
        return logits
    return jax.nn.softmax(logits, axis=-1)


def classification_accuracy(logits, targets, top_k=(1,)) -> Tuple[float, ...]:
    """Top-k accuracies (reference metrics.py:66-99)."""
    order = jnp.argsort(logits, axis=1)[:, ::-1]
    out = []
    for k in top_k:
        correct = jnp.any(order[:, :k] == targets[:, None], axis=1)
        out.append(float(jnp.mean(correct.astype(jnp.float32))))
    return tuple(out)
