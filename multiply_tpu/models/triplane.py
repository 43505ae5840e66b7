"""Tri-plane feature fields for per-person identity conditioning.

Parity target: code/lib/model/triplane.py — `TriPlane` (per-person xy/xz/yz
feature planes, bilinear-sampled and averaged) and `TriPlaneMulti`
(multi-resolution pyramid + per-person adapter MLP emitting a feature and a
delta-SDF). Used with `cond: smpl_tri` (off in the shipped configs but part
of the model zoo). Sampling goes through ops/grid_sample.py, which is exactly
differentiable to any order — the reason the reference needed a custom CUDA
double-backward kernel.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_2d


def sample_triplane(planes: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """planes: (3, C, R, R) xy/xz/yz; pts: (N, 3) in [-1, 1] -> (N, C) mean."""
    xy = grid_sample_2d(planes[0], pts[:, (0, 1)])
    xz = grid_sample_2d(planes[1], pts[:, (0, 2)])
    yz = grid_sample_2d(planes[2], pts[:, (1, 2)])
    return (xy + xz + yz) / 3.0


class TriPlane(nn.Module):
    """Single-resolution tri-plane (triplane.py:63-113). One person's planes;
    stack params over persons and vmap like the other per-person nets."""

    features: int = 64
    resolution: int = 128

    @nn.compact
    def __call__(self, pts: jnp.ndarray) -> jnp.ndarray:
        planes = self.param(
            "planes",
            nn.initializers.normal(0.1),
            (3, self.features, self.resolution, self.resolution),
        )
        return sample_triplane(planes, pts)


class TriPlaneMulti(nn.Module):
    """Multi-resolution pyramid + adapter MLP -> (feature, delta_sdf)
    (triplane.py:116-252)."""

    features: int = 64
    resolutions: Sequence[int] = (32, 64, 128)
    adapter_width: int = 128

    @nn.compact
    def __call__(self, pts: jnp.ndarray, cond_pose: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        feats = []
        for r in self.resolutions:
            planes = self.param(
                f"planes_{r}",
                nn.initializers.normal(0.1),
                (3, self.features, r, r),
            )
            feats.append(sample_triplane(planes, pts))
        h = jnp.concatenate(feats, axis=-1)
        if cond_pose is not None:
            cp = jnp.broadcast_to(cond_pose, (pts.shape[0], cond_pose.shape[-1]))
            h = jnp.concatenate([h, cp], axis=-1)
        h = nn.Dense(self.adapter_width)(h)
        h = nn.softplus(h)
        h = nn.Dense(self.features + 1)(h)
        return h[:, 1:], h[:, 0]  # (feature, delta_sdf)
