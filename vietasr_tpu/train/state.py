"""Train state: one pytree carrying everything a step mutates.

Replaces the reference's scattered trainer state (module state_dicts +
optimizer state dicts + step counter, actions.py:838-874) with a single
functional pytree that jit/shard/checkpoint all operate on.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # running counters for observability (reference logs these per step)
    skipped_steps: jnp.ndarray          # NaN/inf-guard skips (actions.py:1353-1376)

    @classmethod
    def create(cls, variables: dict, optimizer: optax.GradientTransformation
               ) -> "TrainState":
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            opt_state=optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            skipped_steps=jnp.zeros((), jnp.int32),
        )

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def num_params(self) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(self.params))
