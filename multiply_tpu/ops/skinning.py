"""Linear blend skinning (forward + inverse) and skinning-weight queries.

Parity target: code/lib/model/deformer.py:37-89 — KNN transfer of canonical
SMPL skinning weights with distance-softmax confidence, outlier masking at
sqrt(d2) > 0.1, and forward/inverse application of the blended bone transform.
The blended 4x4 is affine, so its inverse is computed in closed form (adjugate
3x3 + translation) instead of a general matrix inverse — VPU-friendly and
exactly what autodiff needs for the J^{-T} normal transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import knn

OUTLIER_DIST = 0.1  # meters, reference deformer.py:49
DIST_CLAMP = 4.0  # squared-distance clamp, reference deformer.py:41


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 3, 3) via adjugate."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            A, -(b * i - c * h), b * f - c * e,
            B, a * i - c * g, -(a * f - c * d),
            C, -(a * h - b * g), a * e - b * d,
        ],
        axis=-1,
    ).reshape(m.shape)
    return adj * inv_det[..., None, None]


def affine_inverse(tf: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., 4, 4) affine transforms (last row assumed [0,0,0,1])."""
    R_inv = inv3x3(tf[..., :3, :3])
    t_inv = -jnp.einsum("...ij,...j->...i", R_inv, tf[..., :3, 3])
    out = jnp.zeros_like(tf)
    out = out.at[..., :3, :3].set(R_inv)
    out = out.at[..., :3, 3].set(t_inv)
    out = out.at[..., 3, 3].set(1.0)
    return out


def query_skinning_weights(
    pts: jnp.ndarray,  # (N, 3) query points (posed or canonical space)
    verts: jnp.ndarray,  # (V, 3) SMPL verts in the same space
    smpl_weights: jnp.ndarray,  # (V, J) canonical LBS weights
    k: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """KNN-blended skinning weights + outlier mask.

    Weights are stop_gradient'ed, mirroring weights.detach() in the reference
    (deformer.py:47): position gradients flow through the bone transforms, not
    through the KNN blend — which also makes the non-differentiable Pallas
    NN kernel a drop-in for the K=1 training path.
    """
    from .knn_pallas import knn_auto

    # detach at the kernel boundary: the weights are stop-grad regardless
    # (and the Pallas kernel defines no autodiff rule)
    d2, idx = knn_auto(
        jax.lax.stop_gradient(pts), jax.lax.stop_gradient(verts), k=k
    )
    d2 = jnp.minimum(d2, DIST_CLAMP)
    conf = jnp.exp(-d2)
    conf = conf / jnp.sum(conf, axis=-1, keepdims=True)  # (N,k)
    w = smpl_weights[idx]  # (N,k,J)
    weights = jnp.sum(w * conf[..., None], axis=-2)  # (N,J)
    weights = jax.lax.stop_gradient(weights)
    outlier = jnp.sqrt(d2[..., 0]) > OUTLIER_DIST
    return weights, outlier


def blend_transforms(weights: jnp.ndarray, tfs: jnp.ndarray) -> jnp.ndarray:
    """(N,J) x (J,4,4) -> (N,4,4)."""
    return jnp.einsum("pn,nij->pij", weights, tfs)


def skinning(
    x: jnp.ndarray,  # (N, 3)
    weights: jnp.ndarray,  # (N, J)
    tfs: jnp.ndarray,  # (J, 4, 4)
    inverse: bool = False,
) -> jnp.ndarray:
    """Apply (or invert) the weight-blended bone transform to points."""
    w_tf = blend_transforms(weights, tfs)
    if inverse:
        w_tf = affine_inverse(w_tf)
    return jnp.einsum("pij,pj->pi", w_tf[:, :3, :3], x) + w_tf[:, :3, 3]
