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
    (triplane.py:116-252): per resolution level, three feature planes are
    bilinear-sampled and the per-plane features concatenated over levels and
    planes; a 2x256 softplus(beta=100) adapter plus a tiny-init last layer
    (uniform +-1e-5 weights, zero bias, triplane.py:178-181) emits a 64-d
    identity feature and a delta-SDF. The tiny last-layer init keeps both
    outputs ~0 at start, so the geometric SDF init survives switching the
    pyramid on. One person's params; stack over persons and vmap."""

    features: int = 64
    resolutions: Sequence[int] = (128, 64, 32, 16)
    adapter_width: int = 256

    @nn.compact
    def __call__(self, pts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        feats = []
        for r in self.resolutions:
            planes = self.param(
                f"planes_{r}",
                nn.initializers.normal(0.1),
                (3, self.features, r, r),
            )
            # concat per plane like the reference (feat_xy|feat_xz|feat_yz
            # each over all levels, triplane.py:236-240) — order inside the
            # concat is immaterial to the following dense layer
            xy = grid_sample_2d(planes[0], pts[:, (0, 1)])
            xz = grid_sample_2d(planes[1], pts[:, (0, 2)])
            yz = grid_sample_2d(planes[2], pts[:, (1, 2)])
            feats.extend([xy, xz, yz])
        h = jnp.concatenate(feats, axis=-1)
        h = nn.softplus(100.0 * nn.Dense(self.adapter_width)(h)) / 100.0
        h = nn.softplus(100.0 * nn.Dense(self.adapter_width)(h)) / 100.0
        h = nn.Dense(
            self.features + 1,
            kernel_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, -1e-5, 1e-5
            ),
            bias_init=nn.initializers.zeros,
        )(h)
        return h[:, :-1], h[:, -1]  # (feature (N,64), delta_sdf (N,))
