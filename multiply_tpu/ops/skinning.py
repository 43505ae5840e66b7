"""Linear blend skinning (forward + inverse) and skinning-weight queries.

Parity target: code/lib/model/deformer.py:37-89 — KNN transfer of canonical
SMPL skinning weights with distance-softmax confidence, outlier masking at
sqrt(d2) > 0.1, and forward/inverse application of the blended bone transform.
The blended 4x4 is affine, so its inverse is computed in closed form (adjugate
3x3 + translation) instead of a general matrix inverse — VPU-friendly and
exactly what autodiff needs for the J^{-T} normal transform.

Layout note (TPU): the hot paths keep the per-point transform as 12
structure-of-arrays row vectors of shape (N,) instead of an (N, 4, 4) array.
AoS puts the 4-wide matrix dims in the (8, 128) tile lanes — 97% padding
waste — and profiled at ~12 ms/step of pure layout shuffling; SoA keeps N in
the lane dimension and fuses into neighbouring elementwise work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import knn

OUTLIER_DIST = 0.1  # meters, reference deformer.py:49
DIST_CLAMP = 4.0  # squared-distance clamp, reference deformer.py:41


# ----------------------------------------------------------------------
# SoA core: blended affine as 12 rows [r00 r01 r02 t0 | r10 .. t1 | r20 .. t2]
# ----------------------------------------------------------------------


def blend_affine_rows(weights: jnp.ndarray, tfs: jnp.ndarray) -> jnp.ndarray:
    """(N, J) weights x (J, 4, 4) bone transforms -> (12, N) affine rows.

    One small MXU matmul; f32 HIGHEST (positions need mm precision)."""
    flat = tfs[:, :3, :].reshape(tfs.shape[0], 12)  # (J, 12)
    return jnp.matmul(
        flat.T, weights.T, precision=jax.lax.Precision.HIGHEST
    )  # (12, N)


def affine_apply_rows(m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply (12, N) affine rows to (N, 3) points -> (N, 3)."""
    x0, x1, x2 = x[:, 0], x[:, 1], x[:, 2]
    y0 = m[0] * x0 + m[1] * x1 + m[2] * x2 + m[3]
    y1 = m[4] * x0 + m[5] * x1 + m[6] * x2 + m[7]
    y2 = m[8] * x0 + m[9] * x1 + m[10] * x2 + m[11]
    return jnp.stack([y0, y1, y2], axis=-1)


def affine_inverse_apply_rows(m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply the INVERSE of (12, N) affine rows to (N, 3) points.

    Solves R y = (x - t) with the closed-form adjugate — never materializes
    an (N, 3, 3) inverse."""
    r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2 = m
    b0, b1, b2 = x[:, 0] - t0, x[:, 1] - t1, x[:, 2] - t2
    A = r11 * r22 - r12 * r21  # cof00
    B = r12 * r20 - r10 * r22  # cof01
    C = r10 * r21 - r11 * r20  # cof02
    det = r00 * A + r01 * B + r02 * C
    inv_det = 1.0 / det
    y0 = (A * b0 + (r02 * r21 - r01 * r22) * b1 + (r01 * r12 - r02 * r11) * b2) * inv_det
    y1 = (B * b0 + (r00 * r22 - r02 * r20) * b1 + (r02 * r10 - r00 * r12) * b2) * inv_det
    y2 = (C * b0 + (r01 * r20 - r00 * r21) * b1 + (r00 * r11 - r01 * r10) * b2) * inv_det
    return jnp.stack([y0, y1, y2], axis=-1)


def rotation_inverse_rows(m: jnp.ndarray) -> jnp.ndarray:
    """(12, N) affine rows -> (9, N) rows of R^{-1} (adjugate / det)."""
    r00, r01, r02, _t0, r10, r11, r12, _t1, r20, r21, r22, _t2 = m
    A = r11 * r22 - r12 * r21
    B = r12 * r20 - r10 * r22
    C = r10 * r21 - r11 * r20
    inv_det = 1.0 / (r00 * A + r01 * B + r02 * C)
    return jnp.stack(
        [
            A * inv_det, (r02 * r21 - r01 * r22) * inv_det, (r01 * r12 - r02 * r11) * inv_det,
            B * inv_det, (r00 * r22 - r02 * r20) * inv_det, (r02 * r10 - r00 * r12) * inv_det,
            C * inv_det, (r01 * r20 - r00 * r21) * inv_det, (r00 * r11 - r01 * r10) * inv_det,
        ]
    )


def covector_apply_rows(r9: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """n[j] = sum_i g[i] * M[i, j] for (9, N) matrix rows and (N, 3) g —
    the J^{-T} normal transform, SoA."""
    g0, g1, g2 = g[:, 0], g[:, 1], g[:, 2]
    n0 = g0 * r9[0] + g1 * r9[3] + g2 * r9[6]
    n1 = g0 * r9[1] + g1 * r9[4] + g2 * r9[7]
    n2 = g0 * r9[2] + g1 * r9[5] + g2 * r9[8]
    return jnp.stack([n0, n1, n2], axis=-1)


# ----------------------------------------------------------------------
# AoS convenience forms (mesh export, tests; not on the per-sample hot path)
# ----------------------------------------------------------------------


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


def blend_transforms(weights: jnp.ndarray, tfs: jnp.ndarray) -> jnp.ndarray:
    """(N,J) x (J,4,4) -> (N,4,4)."""
    return jnp.einsum("pn,nij->pij", weights, tfs)


# ----------------------------------------------------------------------
# skinning-weight transfer
# ----------------------------------------------------------------------


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


def skinning(
    x: jnp.ndarray,  # (N, 3)
    weights: jnp.ndarray,  # (N, J)
    tfs: jnp.ndarray,  # (J, 4, 4)
    inverse: bool = False,
) -> jnp.ndarray:
    """Apply (or invert) the weight-blended bone transform to points."""
    m = blend_affine_rows(weights, tfs)
    if inverse:
        return affine_inverse_apply_rows(m, x)
    return affine_apply_rows(m, x)
