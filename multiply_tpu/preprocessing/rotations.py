"""Rotation representation conversions (axis-angle / matrix / 6D) in JAX.

Parity target: preprocessing/rotation.py — the subset used by the keypoint
refinement stage's rot6D temporal loss and pose parameterization.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..body.smpl import rodrigues

axis_angle_to_matrix = rodrigues


def matrix_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): first two columns, row-major (Zhou et al.)."""
    return R[..., :3, :2].swapaxes(-1, -2).reshape(*R.shape[:-2], 6)


def rot6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt."""
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)  # b_i are columns of R


def matrix_to_axis_angle(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) axis-angle (safe near 0 and pi)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    angle = jnp.arccos(cos)
    axis = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(angle)[..., None]
    axis = axis / jnp.maximum(2.0 * sin, eps)
    return axis * angle[..., None]


def axis_angle_to_rot6d(aa: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rot6d(axis_angle_to_matrix(aa))
