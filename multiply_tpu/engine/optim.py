"""Maskable Adam + MultiStepLR, replicating the reference's optimizer semantics.

Parity target: code/multiply_model.py:94-106 — Adam(eps=1e-8) with per-group
learning rates (model lr, body params 0.1x lr), MultiStepLR(milestones, gamma)
stepped per epoch, and torch's freeze/toggle behavior where parameters without
gradients have their Adam state left untouched (multiply_model.py:109-128).

Hand-rolled instead of optax.chain because the active-parameter mask changes
per step (joint / pose-only / delayed-pose modes) while Adam moments for
inactive leaves must not advance — jnp.where on traced mode flags keeps one
jitted step for all modes.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any  # first moments (pytree like params)
    nu: Any  # second moments
    count: Any  # per-leaf step counts (advance only when leaf is active)


def adam_init(params) -> AdamState:
    zeros = lambda p: jnp.zeros_like(p)
    counts = jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params)
    return AdamState(
        mu=jax.tree.map(zeros, params), nu=jax.tree.map(zeros, params), count=counts
    )


def adam_update(
    grads,
    state: AdamState,
    params,
    lr: jnp.ndarray,  # scalar base learning rate (schedule applied by caller)
    lr_factors,  # pytree of static per-leaf lr multipliers (or None for all-1)
    active,  # pytree of traced bools — leaves to update this step
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One Adam step over the active subset; inactive leaves are untouched."""
    if lr_factors is None:
        lr_factors = jax.tree.map(lambda p: 1.0, params)

    def upd(g, m, v, c, p, f, a):
        a = jnp.asarray(a)
        c_new = jnp.where(a, c + 1, c)
        m_new = jnp.where(a, b1 * m + (1 - b1) * g, m)
        v_new = jnp.where(a, b2 * v + (1 - b2) * g * g, v)
        c_safe = jnp.maximum(c_new, 1)
        m_hat = m_new / (1 - b1 ** c_safe.astype(jnp.float32))
        v_hat = v_new / (1 - b2 ** c_safe.astype(jnp.float32))
        step = lr * f * m_hat / (jnp.sqrt(v_hat) + eps)
        p_new = jnp.where(a, p - step, p)
        return p_new, m_new, v_new, c_new

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_c = treedef.flatten_up_to(state.count)
    flat_f = treedef.flatten_up_to(lr_factors)
    flat_a = treedef.flatten_up_to(active)

    out = [
        upd(g, m, v, c, p, f, a)
        for g, m, v, c, p, f, a in zip(
            flat_g, flat_m, flat_v, flat_c, flat_p, flat_f, flat_a
        )
    ]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    new_c = treedef.unflatten([o[3] for o in out])
    return new_p, AdamState(mu=new_m, nu=new_v, count=new_c)


def multistep_lr(
    base_lr: float, epoch: jnp.ndarray, milestones: tuple[int, ...], gamma: float
) -> jnp.ndarray:
    """MultiStepLR: lr * gamma^(#milestones passed). Epoch may be traced."""
    epoch = jnp.asarray(epoch)
    n = sum(jnp.where(epoch >= m, 1, 0) for m in milestones)
    return base_lr * (gamma ** n.astype(jnp.float32))
