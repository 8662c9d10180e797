"""Parameter freezing and scheduled hyperparameter annealing.

Reference parity: `NeuralModule.freeze`/`unfreeze`
(/root/reference/nemo/backends/pytorch/nm.py:66-90) and the
`UnfreezeCallback` / `ValueSetterCallback` pair
(/root/reference/nemo/core/callbacks.py:515-573) — the reference
toggles `requires_grad` from host callbacks and pokes module attributes
between steps. The TPU-first shape is different: under jit the step is
traced once, so

- freezing is an optax TRANSFORM: frozen subtrees get zero updates
  inside the compiled step (`freeze`), and scheduled UNfreezing gates
  per-leaf updates on the traced step count (`unfreeze_schedule`) — no
  retrace when a module thaws;
- value schedules are traced scalars computed from `state.step` inside
  the step (`make_value_schedule` + the `scheduled_values` hook in
  make_train_step) — annealing SpecAugment mask counts never
  recompiles.

Fine-tuning with a frozen encoder (the classic ASR use) is
`make_optimizer(...)` wrapped in `freeze(opt, ["encoder"])`.
"""

from __future__ import annotations

from typing import Callable, Mapping, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    """Pytree key path -> "encoder/0/sub/dw_w" style string."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _matches(path_s: str, prefixes: Sequence[str]) -> bool:
    return any(path_s == p or path_s.startswith(p + "/") for p in prefixes)


def freeze(optimizer: optax.GradientTransformation,
           frozen_prefixes: Sequence[str]) -> optax.GradientTransformation:
    """Zero updates for every param whose pytree path starts with one of
    `frozen_prefixes` (e.g. ["encoder"] or ["encoder/0"]). The inner
    optimizer never sees the frozen leaves, so its moment state stays
    empty for them (optax.multi_transform) — matching torch's
    requires_grad=False semantics where weight decay also stops."""

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "frozen" if _matches(_path_str(p), frozen_prefixes)
            else "train", params)

    return optax.multi_transform(
        {"train": optimizer, "frozen": optax.set_to_zero()}, label_fn)


class UnfreezeState(NamedTuple):
    count: jnp.ndarray          # steps seen
    inner: optax.OptState


def unfreeze_schedule(
    optimizer: optax.GradientTransformation,
    unfreeze_at: Mapping[str, int],
) -> optax.GradientTransformation:
    """UnfreezeCallback equivalent: params under prefix p receive no
    updates until step `unfreeze_at[p]` (0 = never frozen). Gating is a
    traced `where` on the step count, so thawing happens INSIDE the
    compiled train step — no retrace, no host intervention. Gradients
    are gated before the inner optimizer too, so moments stay zero while
    frozen (torch accumulates no grads on requires_grad=False params)."""
    prefixes = list(unfreeze_at)

    def _thresh(path) -> int:
        s = _path_str(path)
        for p in prefixes:
            if _matches(s, [p]):
                return int(unfreeze_at[p])
        return 0

    def init(params):
        return UnfreezeState(count=jnp.zeros((), jnp.int32),
                             inner=optimizer.init(params))

    def update(grads, state, params=None):
        count = state.count

        def gate(path, g):
            th = _thresh(path)
            if th <= 0:
                return g
            return jnp.where(count >= th, g, jnp.zeros_like(g))

        gated = jax.tree_util.tree_map_with_path(gate, grads)
        updates, inner = optimizer.update(gated, state.inner, params)
        updates = jax.tree_util.tree_map_with_path(gate, updates)
        return updates, UnfreezeState(count=count + 1, inner=inner)

    return optax.GradientTransformation(init, update)


def make_value_schedule(policy: str, start: float, end: float,
                        total_steps: int, *,
                        warmup_steps: int = 0) -> Callable:
    """ValueSetterCallback equivalent (callbacks.py:515-556: linear /
    exponential anneal of a module attribute over a step range), as a
    pure fn(step) -> traced scalar for the `scheduled_values` hook."""
    policy = policy.lower()

    def fn(step):
        s = jnp.clip((step - warmup_steps)
                     / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        if policy == "linear":
            return start + (end - start) * s
        if policy in ("exp", "exponential"):
            # geometric interpolation (callbacks.py ExpPolicy)
            ratio = jnp.asarray(max(end, 1e-8) / max(start, 1e-8))
            return start * ratio ** s
        raise ValueError(f"unknown value-schedule policy {policy!r}")

    return fn
