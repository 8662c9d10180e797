"""Deployment export: serialize the jitted inference function to StableHLO.

The reference exports TorchScript/ONNX with dynamic batch/time axes derived
from neural types (/root/reference/nemo/backends/pytorch/actions.py:922-1055
deployment_export). The TPU-era equivalent is jax.export: the traced
featurize+encode+decode program serializes to portable StableHLO bytes that
any JAX/XLA runtime (or IREE etc.) can load and run without the Python
model code.

Batch/time flexibility comes from exporting per duration bucket (the same
static-shape strategy the serving path uses) or from symbolic shapes.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_transcriber(transcriber, out_dir: str, *,
                       batch_sizes: Sequence[int] = (1, 8),
                       buckets: Optional[Sequence[int]] = None) -> dict:
    """Serialize the Transcriber's forward for each (batch, bucket) shape.

    Writes {out_dir}/fwd_b{B}_s{S}.stablehlo plus a manifest.json describing
    shapes, labels, and sample rate. Returns the manifest dict.
    """
    os.makedirs(out_dir, exist_ok=True)
    buckets = list(buckets or transcriber.buckets)
    entries = []
    # weights ARE baked into the exported program (it must be self-contained)
    fn = jax.jit(lambda signal, lengths: transcriber._forward(
        transcriber.variables, transcriber._q_tables, signal, lengths))
    for b in batch_sizes:
        for s in buckets:
            signal = jnp.zeros((b, s), jnp.float32)
            lens = jnp.zeros((b,), jnp.int32)
            exp = jax_export.export(fn)(signal, lens)
            blob = exp.serialize()
            name = f"fwd_b{b}_s{s}.stablehlo"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(blob)
            entries.append({"file": name, "batch": b, "samples": s})
    manifest = {
        "model": transcriber.cfg.name,
        "sample_rate": transcriber.cfg.featurizer.sample_rate,
        "labels": transcriber.cfg.labels,
        "blank_id": transcriber.cfg.num_classes,
        "outputs": ["log_probs", "enc_lens", "greedy_preds", "keep_mask"],
        "functions": entries,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, ensure_ascii=False, indent=2)
    return manifest


def load_exported(path: str):
    """Deserialize a .stablehlo export back into a callable."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    return exp.call
