"""Point-sampling primitives for eikonal / bone supervision.

Parity target: code/lib/model/sampler.py — `PointInSpace` (a gaussian-local
sample per input point plus a ratio of global uniform samples) and
`PointOnBones` (points along kinematic-tree bone segments with unit occupancy,
plus joint samples with one-hot skinning weights). The reference's main
training path uses PointInSpace with global_ratio=0 (inlined in our renderer's
eikonal sampling); these standalone versions serve SDF pre-training and any
bone-supervised variants. Pure functions over a key — jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..body.smpl import SMPL_PARENTS


def default_bone_ids() -> jnp.ndarray:
    """(B, 2) [parent, child] pairs of the SMPL kinematic tree (root excluded)."""
    parents = jnp.asarray(SMPL_PARENTS)
    child = jnp.arange(1, parents.shape[0])
    return jnp.stack([parents[1:], child], axis=-1)


def sample_points_in_space(
    key: jax.Array,
    pc_input: jnp.ndarray,  # (N, 3) sampling centers
    local_sigma: float = 0.01,
    global_sigma: float = 0.5,
    global_ratio: float = 0.125,
) -> jnp.ndarray:
    """One gaussian-local sample per center + `global_ratio`·N uniform points
    in the [-global_sigma, global_sigma] cube (sampler.py:84-108)."""
    n, d = pc_input.shape
    k1, k2 = jax.random.split(key)
    local = pc_input + jax.random.normal(k1, (n, d)) * local_sigma
    n_global = int(n * global_ratio)
    if n_global == 0:
        return local
    glob = jax.random.uniform(
        k2, (n_global, d), minval=-global_sigma, maxval=global_sigma
    )
    return jnp.concatenate([local, glob], axis=0)


def sample_points_on_bones(
    key: jax.Array,
    joints: jnp.ndarray,  # (J, 3) canonical joints
    bone_ids: jnp.ndarray | None = None,  # (B, 2) [parent, child]
    num_per_bone: int = 5,
    jitter: float = 0.001,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Points along each bone segment (sampler.py:7-46).

    Returns (samples (B*num_per_bone, 3), occupancy probs (B*num_per_bone,)
    — the reference's constant 0.01 inside-bone target).
    """
    if bone_ids is None:
        bone_ids = default_bone_ids()
    starts = joints[bone_ids[:, 0]]  # (B, 3)
    dirs = joints[bone_ids[:, 1]] - starts
    t = jnp.linspace(0.0, 1.0, num_per_bone)[None, :]  # (1, n)
    t = jnp.clip(
        t + jax.random.normal(key, (bone_ids.shape[0], num_per_bone)) * jitter,
        0.0,
        1.0,
    )
    samples = starts[:, None, :] + t[..., None] * dirs[:, None, :]
    samples = samples.reshape(-1, 3)
    return samples, jnp.full((samples.shape[0],), 0.01)


def sample_joints(
    joints: jnp.ndarray,  # (J, 3)
    bone_ids: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Joint positions with one-hot GT skinning weights (sampler.py:48-79):
    every joint weighted to itself, then every bone's child joint weighted to
    the bone's parent."""
    if bone_ids is None:
        bone_ids = default_bone_ids()
    J = joints.shape[0]
    eye = jnp.eye(J)
    samples = jnp.concatenate([joints, joints[bone_ids[:, 1]]], axis=0)
    weights = jnp.concatenate([eye, eye[bone_ids[:, 0]]], axis=0)
    return samples, weights
