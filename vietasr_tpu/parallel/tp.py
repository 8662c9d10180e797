"""Tensor-parallel shardings for the Conformer over the 'model' mesh axis.

The reference has no TP ("ModelParallel will come later",
nemo/core/neural_modules.py:678). For models that outgrow one chip's HBM we
shard the Conformer the Megatron way over the reserved 'model' axis:

- FFN: in-projection column-sharded P(None,'model') (and its bias), out-
  projection row-sharded P('model',None) — XLA inserts the psum on the out
  matmul.
- MHSA: q/k/v/pos projections column-sharded (heads split across 'model'),
  the per-head biases u/v sharded on the head axis, the output projection
  row-sharded.
- Everything else (LayerNorms, conv module, subsampling, decoder) is
  replicated — the conv module is depthwise (tiny weights).

`shard_conformer_variables` device_puts a variable tree with these
shardings; GSPMD propagates them through the jitted step, emitting TP
collectives over ICI (scaling-book recipe: annotate, let XLA insert
collectives).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path) -> P:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    keys = [str(k) for k in keys if k is not None]
    joined = "/".join(keys)
    # FFN halves
    if "ff1/in/w" in joined or "ff2/in/w" in joined:
        return P(None, "model")
    if "ff1/in/b" in joined or "ff2/in/b" in joined:
        return P("model")
    if "ff1/out/w" in joined or "ff2/out/w" in joined:
        return P("model", None)
    # attention projections: heads split over 'model'
    for proj in ("mhsa/q/w", "mhsa/k/w", "mhsa/v/w", "mhsa/pos/w"):
        if proj in joined:
            return P(None, "model")
    if "mhsa/q/b" in joined or "mhsa/k/b" in joined or "mhsa/v/b" in joined:
        return P("model")
    if "mhsa/u" in joined or "mhsa/vb" in joined:
        return P("model", None)
    if "mhsa/out/w" in joined:
        return P("model", None)
    return P()          # replicated


def conformer_tp_shardings(variables, mesh: Mesh):
    """Pytree of NamedShardings matching `variables`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path)),
        variables)


def shard_conformer_variables(variables, mesh: Mesh):
    shardings = conformer_tp_shardings(variables, mesh)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)
