"""Optimizers as optax gradient transformations.

Novograd is implemented from its definition (arXiv:1905.11286) with the
reference's exact update order (/root/reference/nemo/backends/pytorch/
optimizers.py:122-239): per-TENSOR scalar second moment, grad normalized by
sqrt(v)+eps, decoupled weight decay added to the normalized grad, optional
grad averaging (1-beta1), first-step second-moment bootstrap (v0 = |g|^2),
and optional LUC trust-ratio clipping (update <= luc_trust * ||w|| / ||m||).

AdamW / SGD / LAMB come from optax (same math as the reference's AdamW,
optimizers.py:27-119; the reference gets LAMB from apex). XLA fuses the
elementwise update chains, which is what apex's fused kernels bought on GPU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class NovogradState(NamedTuple):
    exp_avg: optax.Updates          # first moment, per tensor
    exp_avg_sq: optax.Updates       # scalar per tensor
    step: jnp.ndarray


def novograd(
    learning_rate,
    betas=(0.95, 0.98),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_averaging: bool = False,
    luc: bool = False,
    luc_trust: float = 1e-3,
    luc_eps: float = 1e-8,
) -> optax.GradientTransformation:
    beta1, beta2 = betas

    def init_fn(params):
        return NovogradState(
            exp_avg=jax.tree_util.tree_map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree_util.tree_map(
                lambda _: jnp.zeros((), jnp.float32), params),
            step=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("novograd requires params for weight decay/LUC")
        step = state.step + 1

        def upd(g, m, v, p):
            norm_sq = jnp.sum(jnp.square(g).astype(jnp.float32))
            v_new = jnp.where(v == 0, norm_sq, beta2 * v + (1 - beta2) * norm_sq)
            denom = jnp.sqrt(v_new) + eps
            g_hat = g / denom
            if weight_decay:
                g_hat = g_hat + weight_decay * p
            if grad_averaging:
                g_hat = g_hat * (1 - beta1)
            m_new = beta1 * m + g_hat
            return m_new, v_new

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(state.exp_avg_sq)
        flat_p = treedef.flatten_up_to(params)
        new_m, new_v, out = [], [], []
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        for g, m, v, p in zip(flat_g, flat_m, flat_v, flat_p):
            m_new, v_new = upd(g, m, v, p)
            if luc:
                data_norm = jnp.linalg.norm(p)
                grad_norm = jnp.linalg.norm(m_new)
                factor = luc_trust * data_norm / (grad_norm + luc_eps)
                factor = jnp.minimum(factor, lr)
                out.append(-factor * m_new)
            else:
                out.append(-lr * m_new)
            new_m.append(m_new)
            new_v.append(v_new)
        return (
            jax.tree_util.tree_unflatten(treedef, out),
            NovogradState(
                exp_avg=jax.tree_util.tree_unflatten(treedef, new_m),
                exp_avg_sq=jax.tree_util.tree_unflatten(treedef, new_v),
                step=step,
            ),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    name: str,
    learning_rate,
    *,
    weight_decay: float = 0.0,
    betas=None,
    momentum: float = 0.9,
    grad_clip_norm: Optional[float] = None,
    larc: bool = False,
    larc_eta: float = 0.02,
) -> optax.GradientTransformation:
    """Build the optimizer set the reference supports
    (actions.py:286-350: sgd / adam / adam_w / novograd / lamb, optional
    LARC wrapping, plus grad-norm clipping actions.py:1407-1408)."""
    name = name.lower()
    if name == "novograd":
        opt = novograd(learning_rate, betas=betas or (0.95, 0.98),
                       weight_decay=weight_decay)
    elif name == "adam":
        opt = optax.adam(learning_rate, *(betas or (0.9, 0.999)))
    elif name in ("adamw", "adam_w"):
        b = betas or (0.9, 0.999)
        opt = optax.adamw(learning_rate, b1=b[0], b2=b[1],
                          weight_decay=weight_decay)
    elif name == "sgd":
        opt = optax.sgd(learning_rate, momentum=momentum)
        if weight_decay:
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    elif name == "lamb":
        b = betas or (0.9, 0.999)
        opt = optax.lamb(learning_rate, b1=b[0], b2=b[1],
                         weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if larc and name == "sgd":
        opt = optax.chain(
            optax.scale_by_trust_ratio(trust_coefficient=larc_eta), opt)
    if grad_clip_norm:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
    return opt
