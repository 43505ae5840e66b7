"""Canonical-space SMPL server: scaled/translated posed bodies + bone transforms
relative to the canonical legs-spread pose.

Parity target: code/lib/model/smpl.py:6-95 (SMPLServer). Functional here — the
server precomputes canonical quantities once (host side) and `forward` is a
pure jittable function, vmappable over persons by stacking servers' canonical
arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .smpl import NUM_JOINTS, BodyModel, lbs


def canonical_pose_params(dtype=jnp.float32) -> jnp.ndarray:
    """The 72-d canonical pose: zero everywhere except legs spread by ±30°.

    Reference: code/lib/model/smpl.py:36-39 — thetas[5] = π/6 (left hip z),
    thetas[8] = -π/6 (right hip z).
    """
    thetas = jnp.zeros((NUM_JOINTS * 3,), dtype=dtype)
    thetas = thetas.at[5].set(jnp.pi / 6).at[8].set(-jnp.pi / 6)
    return thetas


class SMPLServer(NamedTuple):
    """Per-person canonical state. A pytree: stack across persons and vmap."""

    model: BodyModel
    betas: jnp.ndarray  # (10,)
    verts_c: jnp.ndarray  # (V,3) canonical posed verts
    joints_c: jnp.ndarray  # (J,3)
    tfs_c_inv: jnp.ndarray  # (J,4,4) inverse canonical absolute bone tfs
    weights_c: jnp.ndarray  # (V,J)

    @staticmethod
    def create(model: BodyModel, betas=None, v_template=None) -> "SMPLServer":
        betas = jnp.zeros((10,), jnp.float32) if betas is None else jnp.asarray(betas, jnp.float32)
        out = lbs(model, betas, canonical_pose_params(), v_template=v_template)
        return SMPLServer(
            model=model,
            betas=betas,
            verts_c=out["verts"],
            joints_c=out["joints"],
            tfs_c_inv=jnp.linalg.inv(out["A"]),
            weights_c=out["W"],
        )

    def __call__(self, scale, transl, thetas, betas=None, absolute: bool = False) -> dict:
        return smpl_server_forward(self, scale, transl, thetas, betas, absolute)


def smpl_server_forward(
    server: SMPLServer,
    scale: jnp.ndarray,  # () or (1,)
    transl: jnp.ndarray,  # (3,)
    thetas: jnp.ndarray,  # (72,)
    betas: jnp.ndarray | None = None,  # (10,)
    absolute: bool = False,
) -> dict:
    """Posed SMPL in world units. Unbatched; vmap for frames/persons.

    Returns verts (V,3), jnts (J,3), all_jnts (J+E,3), tfs (J,4,4) — bone
    transforms w.r.t. the canonical pose unless `absolute`
    (code/lib/model/smpl.py:50-95).
    """
    if betas is None:
        betas = server.betas
    scale = jnp.reshape(scale, ())

    out = lbs(server.model, betas, thetas)

    shift = transl * scale
    verts = out["verts"] * scale + shift
    jnts = out["joints"] * scale + shift
    all_jnts = out["all_joints"] * scale + shift

    tfs = out["A"]
    tfs = tfs.at[:, :3, :].multiply(scale)
    tfs = tfs.at[:, :3, 3].add(shift)
    if not absolute:
        tfs = jnp.einsum("nij,njk->nik", tfs, server.tfs_c_inv)

    return {
        "smpl_verts": verts,
        "smpl_jnts": jnts,
        "smpl_all_jnts": all_jnts,
        "smpl_tfs": tfs,
        "smpl_weights": out["W"],
    }


def stack_servers(servers: list[SMPLServer]) -> SMPLServer:
    """Stack P per-person servers into one leading-person-axis pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *servers)
