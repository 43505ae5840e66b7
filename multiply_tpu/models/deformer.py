"""SMPL KNN-skinning deformer: posed space <-> canonical space.

Parity target: code/lib/model/deformer.py (SMPLDeformer). Skinning weights
are transferred from the K nearest posed (for inverse warps) or canonical
(for forward warps) SMPL vertices with a distance-softmax confidence and
stop-gradient (weights.detach() in the reference), then points move by the
blended per-bone transform (inverse = closed-form affine inverse).

TPU-first notes: K=1 at train time makes the blend a gather; the Jacobian of
the forward warp w.r.t. the canonical point is exactly the blended transform's
rotation block (weights are stop-grad), which `forward_gradient` in the
renderer exploits instead of autodiff loops (reference multiply.py:620-661).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..body.server import SMPLServer
from ..ops.skinning import (
    affine_apply_rows,
    affine_inverse_apply_rows,
    blend_affine_rows,
    query_skinning_weights,
)


class SMPLDeformer(NamedTuple):
    """Per-person deformer state (pytree; stack over persons + vmap).

    verts_c / weights_c are the canonical-pose SMPL verts & LBS weights for
    this person's betas (reference deformer.py:12-18).
    """

    verts_c: jnp.ndarray  # (V, 3)
    weights_c: jnp.ndarray  # (V, J)

    @staticmethod
    def create(server: SMPLServer) -> "SMPLDeformer":
        return SMPLDeformer(verts_c=server.verts_c, weights_c=server.weights_c)

    def query_weights(
        self, x: jnp.ndarray, smpl_verts: jnp.ndarray | None = None, k: int = 1
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Blended skinning weights for points `x` (N,3) + outlier mask (N,).

        `smpl_verts`: posed verts to take KNN against (deformed-space queries);
        defaults to canonical verts (canonical-space queries).
        """
        verts = self.verts_c if smpl_verts is None else smpl_verts
        return query_skinning_weights(x, verts, self.weights_c, k=k)

    def inverse(
        self,
        x_d: jnp.ndarray,  # (N,3) deformed-space points
        smpl_tfs: jnp.ndarray,  # (J,4,4) bone transforms (canonical->posed)
        smpl_verts: jnp.ndarray,  # (V,3) posed verts for the KNN
        k: int = 1,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Deformed -> canonical warp. Returns (x_c, outlier_mask)."""
        weights, outlier = self.query_weights(x_d, smpl_verts=smpl_verts, k=k)
        x_c = affine_inverse_apply_rows(blend_affine_rows(weights, smpl_tfs), x_d)
        return x_c, outlier

    def forward(
        self,
        x_c: jnp.ndarray,  # (N,3) canonical points
        smpl_tfs: jnp.ndarray,  # (J,4,4)
        k: int = 1,
    ) -> jnp.ndarray:
        """Canonical -> deformed warp (weights via canonical KNN)."""
        weights, _ = self.query_weights(x_c, k=k)
        return affine_apply_rows(blend_affine_rows(weights, smpl_tfs), x_c)

    def forward_jacobian_rows(
        self, x_c: jnp.ndarray, smpl_tfs: jnp.ndarray, k: int = 1
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(deformed points, blended affine as (12, N) SoA rows).

        Because weights are stop-grad, the exact Jacobian of the forward warp
        is the rotation block of the blended transform — no autodiff needed
        (what three reverse-mode passes compute in the reference,
        multiply.py:627-640). Rows feed `rotation_inverse_rows` /
        `covector_apply_rows` for the J^{-T} normal transform.
        """
        weights, _ = self.query_weights(x_c, k=k)
        m = blend_affine_rows(weights, smpl_tfs)
        return affine_apply_rows(m, x_c), m

    def forward_jacobian(
        self, x_c: jnp.ndarray, smpl_tfs: jnp.ndarray, k: int = 1
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """AoS form: (deformed points, (N, 3, 3) Jacobian)."""
        x_d, m = self.forward_jacobian_rows(x_c, smpl_tfs, k=k)
        jac = jnp.stack([m[0], m[1], m[2], m[4], m[5], m[6], m[8], m[9], m[10]], -1)
        return x_d, jac.reshape(-1, 3, 3)
