"""Learning-rate policies as jit-traceable functions of the step.

Mirrors /root/reference/nemo/utils/lr_policies.py: warmup ramp
lr * (step+1)/(warmup+1), optional hold phase, then an annealing tail
(cosine / square / square-root / inverse-square-root / polynomial), zero (or
min_lr) past total_steps. Implemented with jnp.where so schedules compose
into the jitted train step (the reference recomputes lr on host per step,
actions.py:1313-1320)."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _with_warmup(initial_lr: float, warmup_steps: int, total_steps: int,
                 min_lr: float, hold_steps: int, tail) -> Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr * (step + 1) / (warmup_steps + 1)
        after_hold = tail(step)
        lr = jnp.where(step < warmup_steps, warm,
                       jnp.where(step < warmup_steps + hold_steps,
                                 initial_lr, after_hold))
        return jnp.where(step > total_steps, min_lr, lr)

    return schedule


def warmup_cosine(initial_lr: float, total_steps: int, *,
                  warmup_steps: int = 0, warmup_ratio: Optional[float] = None,
                  hold_steps: int = 0, min_lr: float = 0.0) -> Schedule:
    """CosineAnnealing (lr_policies.py:144-147)."""
    if warmup_ratio is not None:
        warmup_steps = int(warmup_ratio * total_steps)

    def tail(step):
        mult = 0.5 * (1 + jnp.cos(jnp.pi * step / total_steps))
        return (initial_lr - min_lr) * mult + min_lr

    return _with_warmup(initial_lr, warmup_steps, total_steps, min_lr,
                        hold_steps, tail)


warmup_hold_cosine = warmup_cosine


def square_annealing(initial_lr: float, total_steps: int, *,
                     warmup_steps: int = 0, min_lr: float = 0.0) -> Schedule:
    def tail(step):
        mult = ((total_steps - step) / total_steps) ** 2
        return jnp.maximum(initial_lr * mult, min_lr)

    return _with_warmup(initial_lr, warmup_steps, total_steps, min_lr, 0, tail)


def squareroot_annealing(initial_lr: float, total_steps: int, *,
                         warmup_steps: int = 0, min_lr: float = 0.0
                         ) -> Schedule:
    def tail(step):
        mult = ((total_steps - step) / total_steps) ** 0.5
        return jnp.maximum(initial_lr * mult, min_lr)

    return _with_warmup(initial_lr, warmup_steps, total_steps, min_lr, 0, tail)


def inverse_square_root(initial_lr: float, total_steps: int, *,
                        warmup_steps: int = 0, min_lr: float = 0.0
                        ) -> Schedule:
    """InverseSquareRootAnnealing (lr_policies.py): lr / sqrt(step/warmup)."""
    w = max(warmup_steps, 1)

    def tail(step):
        return initial_lr / jnp.sqrt(jnp.maximum(step, w) / w)

    return _with_warmup(initial_lr, warmup_steps, total_steps, min_lr, 0, tail)


def polynomial_decay(initial_lr: float, total_steps: int, *,
                     warmup_steps: int = 0, hold_steps: int = 0,
                     power: float = 1.0, min_lr: float = 0.0) -> Schedule:
    def tail(step):
        frac = jnp.clip(1.0 - step / total_steps, 0.0, 1.0)
        return (initial_lr - min_lr) * frac ** power + min_lr

    return _with_warmup(initial_lr, warmup_steps, total_steps, min_lr,
                        hold_steps, tail)


_POLICIES = {
    "CosineAnnealing": warmup_cosine,
    "WarmupAnnealing": polynomial_decay,        # linear decay after warmup
    "SquareAnnealing": square_annealing,
    "SquareRootAnnealing": squareroot_annealing,
    "InverseSquareRootAnnealing": inverse_square_root,
    "PolynomialDecayAnnealing": polynomial_decay,
    "PolynomialHoldDecayAnnealing": polynomial_decay,
}


def make_schedule(name: str, initial_lr: float, total_steps: int,
                  **kwargs) -> Schedule:
    """Look up a policy by its reference class name."""
    if name not in _POLICIES:
        raise ValueError(
            f"unknown lr policy {name!r}; known: {sorted(_POLICIES)}")
    return _POLICIES[name](initial_lr, total_steps, **kwargs)
