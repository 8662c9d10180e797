"""Greedy CTC decoding.

Device side: argmax over the class dim plus a "keep" mask (not a repeat of
the previous frame, not blank, within the valid length) — everything XLA
fuses into the decoder matmul epilogue. Host side: cheap collapse of the
already-masked frames into label strings.

Reference: GreedyCTCDecoder (argmax only, greedy_ctc_decoder.py:9-36) +
__ctc_decoder_predictions_tensor collapse loop (helpers.py:7-33).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def greedy_decode(log_probs: jnp.ndarray, lengths: jnp.ndarray, *, blank: int):
    """(B, T, V) log-probs -> (preds (B, T) int32, keep (B, T) bool).

    keep[b, t] is True for frames that survive CTC collapse; the host only
    has to gather preds[keep] per row to get the label sequence.
    """
    from vietasr_tpu.utils.typing import assert_log_probs

    assert_log_probs(log_probs, num_classes=blank,
                     port="greedy_decode.log_probs")
    preds = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    prev = jnp.pad(preds, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    t = preds.shape[1]
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    keep = (preds != prev) & (preds != blank) & valid
    return preds, keep


def collapse_batch(preds: np.ndarray, keep: np.ndarray) -> List[np.ndarray]:
    """Host-side gather of kept frames -> list of per-utterance label id arrays."""
    return [p[k] for p, k in zip(np.asarray(preds), np.asarray(keep))]


def ids_to_text(ids: Sequence[int], labels: Sequence[str]) -> str:
    return "".join(labels[i] for i in ids)


def ctc_collapse(pred_ids: Sequence[int], *, blank: int,
                 prev: Optional[int] = None) -> List[int]:
    """Plain collapse of a raw (uncollapsed) argmax sequence — the reference
    helpers.py:7-33 loop. `prev` carries the last frame across chunk
    boundaries for incremental decoding."""
    out: List[int] = []
    for p in pred_ids:
        if p != prev and p != blank:
            out.append(int(p))
        prev = p
    return out


def greedy_transcripts(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    labels: Sequence[str],
) -> List[str]:
    """End-to-end greedy transcription for a padded batch."""
    preds, keep = greedy_decode(log_probs, lengths, blank=len(labels))
    return [ids_to_text(ids, labels) for ids in collapse_batch(preds, keep)]
