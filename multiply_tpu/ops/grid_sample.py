"""Bilinear/trilinear grid sampling with exact higher-order derivatives.

TPU-native replacement for the reference's custom CUDA double-backward
grid_sample (reference: code/lib/model/grid/gridsample_cuda.{cpp,cu} +
cuda_gridsample.py — needed because the eikonal loss differentiates through
triplane feature lookups, requiring grad-of-grad). In JAX the gather+lerp
formulation is already infinitely differentiable under jax.grad∘jax.grad, so
the *capability* is a pure-XLA op; these functions also serve as the golden
reference for a future Pallas kernel (mirroring the reference's
naive_gridsample.py role in its tests).

Conventions match torch.nn.functional.grid_sample(align_corners=True,
padding_mode='border') for coords in [-1, 1].
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1, 1] -> [0, size-1] (align_corners=True)."""
    return (coord + 1.0) * (size - 1) / 2.0


def grid_sample_2d(image: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """image: (C, H, W); coords: (N, 2) as (x, y) in [-1, 1] -> (N, C)."""
    C, H, W = image.shape
    x = _unnormalize(coords[:, 0], W)
    y = _unnormalize(coords[:, 1], H)
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)

    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    v00 = image[:, y0, x0]  # (C, N)
    v01 = image[:, y0, x0 + 1]
    v10 = image[:, y0 + 1, x0]
    v11 = image[:, y0 + 1, x0 + 1]
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return out.T  # (N, C)


def grid_sample_3d(volume: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """volume: (C, D, H, W); coords: (N, 3) as (x, y, z) in [-1, 1] -> (N, C).

    torch convention: x indexes W, y indexes H, z indexes D.
    """
    C, D, H, W = volume.shape
    x = jnp.clip(_unnormalize(coords[:, 0], W), 0.0, W - 1.0)
    y = jnp.clip(_unnormalize(coords[:, 1], H), 0.0, H - 1.0)
    z = jnp.clip(_unnormalize(coords[:, 2], D), 0.0, D - 1.0)

    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(z), 0, D - 2).astype(jnp.int32)
    fx, fy, fz = x - x0, y - y0, z - z0

    def v(dz, dy, dx):
        return volume[:, z0 + dz, y0 + dy, x0 + dx]  # (C, N)

    out = (
        v(0, 0, 0) * (1 - fz) * (1 - fy) * (1 - fx)
        + v(0, 0, 1) * (1 - fz) * (1 - fy) * fx
        + v(0, 1, 0) * (1 - fz) * fy * (1 - fx)
        + v(0, 1, 1) * (1 - fz) * fy * fx
        + v(1, 0, 0) * fz * (1 - fy) * (1 - fx)
        + v(1, 0, 1) * fz * (1 - fy) * fx
        + v(1, 1, 0) * fz * fy * (1 - fx)
        + v(1, 1, 1) * fz * fy * fx
    )
    return out.T
