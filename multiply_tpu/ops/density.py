"""VolSDF Laplace-CDF density and NeRF++ background density.

Parity target: code/lib/model/density.py — LaplaceDensity
(alpha * Laplace(0, beta).cdf(-sdf) with learnable beta, beta_min floor) and
AbsDensity (|x|) used by the inverse-sphere background.
"""

from __future__ import annotations

import jax.numpy as jnp

BETA_MIN = 1e-4


def laplace_beta(beta_param: jnp.ndarray, beta_min: float = BETA_MIN) -> jnp.ndarray:
    return jnp.abs(beta_param) + beta_min


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """sigma(sdf) = (1/beta) * Laplace(0, beta).cdf(-sdf).

    Written with expm1 exactly as the reference (density.py:20-25) for
    matching numerics: alpha * (0.5 + 0.5*sign(sdf)*expm1(-|sdf|/beta)).
    """
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def abs_density(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(x)
