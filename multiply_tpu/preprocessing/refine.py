"""Keypoint-based SMPL pose/shape/translation refinement in JAX.

Parity target: preprocessing/preprocessing_multiple_trace.py:360-527 (`refine`
mode) + preprocessing/loss.py — per frame and person, 150 Adam iterations
fitting SMPL params to 2D keypoints (ViTPose COCO-17 or OpenPose-25) with a
GMoF-robust reprojection loss and a rot6D temporal smoothness term against the
previous frame's pose.

TPU-first: frames are independent given the previous-frame pose, so the inner
optimization is jitted once and **vmapped over persons**; the temporal chain
runs frame-by-frame on host. The reference's per-frame/person python loops
with fresh torch optimizers disappear.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..body.server import SMPLServer, smpl_server_forward
from .rotations import axis_angle_to_rot6d

# SMPL 24-joint + face/feet vertex joints -> COCO-17 keypoint mapping
# (semantic correspondence used when fitting to ViTPose output; indices into
# the SMPL all_joints = 24 joints + [nose, reye, leye, rear, lear]).
SMPL_TO_COCO17 = jnp.asarray(
    [24, 26, 25, 28, 27, 16, 17, 18, 19, 20, 21, 1, 2, 4, 5, 7, 8]
)
# OpenPose BODY_25 mapping (reference preprocessing_utils.py smpl->openpose
# maps); entries of -1 have no SMPL correspondent and are zero-weighted.
SMPL_TO_OPENPOSE25 = jnp.asarray(
    [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
     25, 26, 27, 28, -1, -1, -1, -1, -1, -1]
)
# reference loss.py:29-31 ignores neck/hips for the 25-kpt loss
OPENPOSE_IGNORED = (1, 9, 12)


class GMoF(NamedTuple):
    rho: float = 100.0

    def __call__(self, residual: jnp.ndarray) -> jnp.ndarray:
        sq = residual**2
        return self.rho**2 * sq / (sq + self.rho**2)


def project(points: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray):
    """(N,3) world -> (N,2) pixels with K (3,3), extrinsic R (3,3), t (3,)."""
    cam = points @ R.T + t
    pix = cam @ K.T
    return pix[:, :2] / jnp.maximum(pix[:, 2:3], 1e-8)


class RefineConfig(NamedTuple):
    iters: int = 150
    lr: float = 0.02
    rho: float = 100.0
    j2d_weight: float = 1e-2
    temporal_weight: float = 6.0
    is_vitpose: bool = True


def refine_frame(
    server: SMPLServer,  # stacked over persons
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    init_pose: jnp.ndarray,  # (P, 72)
    init_transl: jnp.ndarray,  # (P, 3)
    init_betas: jnp.ndarray,  # (P, 10)
    keypoints_2d: jnp.ndarray,  # (P, 17, 3) x,y,confidence (COCO order)
    last_pose: jnp.ndarray,  # (P, 72) previous frame's refined pose
    cfg: RefineConfig = RefineConfig(),
):
    """One frame's refinement, vmapped over persons. Returns refined params."""
    gmof = GMoF(cfg.rho)
    if cfg.is_vitpose:
        joint_map = SMPL_TO_COCO17
        joint_weights = jnp.ones((17,))
    else:
        joint_map = jnp.maximum(SMPL_TO_OPENPOSE25, 0)
        joint_weights = jnp.ones((25,))
        joint_weights = joint_weights.at[jnp.asarray(OPENPOSE_IGNORED)].set(0.0)
        joint_weights = jnp.where(SMPL_TO_OPENPOSE25 >= 0, joint_weights, 0.0)

    def person_loss(params, srv, kp2d, lp):
        pose, transl, betas = params
        out = smpl_server_forward(srv, jnp.ones(()), transl, pose, betas)
        joints = out["smpl_all_jnts"]
        model_kp = joints[joint_map]
        pix = project(model_kp, K, R, t)
        conf = kp2d[:, 2] * joint_weights
        j2d = jnp.mean(conf[:, None] ** 2 * gmof(kp2d[:, :2] - pix))
        temporal = jnp.mean(
            jnp.square(
                axis_angle_to_rot6d(lp.reshape(24, 3))
                - axis_angle_to_rot6d(pose.reshape(24, 3))
            )
        )
        return cfg.j2d_weight * j2d + cfg.temporal_weight * temporal

    def one_person(srv, pose0, transl0, betas0, kp2d, lp):
        import optax

        opt = optax.adam(cfg.lr, eps=1e-8)
        params = (pose0, transl0, betas0)
        opt_state = opt.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(person_loss)(params, srv, kp2d, lp)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=cfg.iters
        )
        return params, losses

    return jax.vmap(one_person)(
        server, init_pose, init_transl, init_betas, keypoints_2d, last_pose
    )


def refine_sequence(
    server_stacked,  # SMPLServer stacked over persons
    K, R, t,
    poses: jnp.ndarray,  # (F, P, 72) TRACE initialization
    transl: jnp.ndarray,  # (F, P, 3)
    betas: jnp.ndarray,  # (P, 10)
    keypoints_2d: jnp.ndarray,  # (F, P, 17, 3)
    cfg: RefineConfig = RefineConfig(),
):
    """Frame-chained refinement (temporal loss against the previous refined
    frame, preprocessing_multiple_trace.py:430-470)."""
    refine_jit = jax.jit(
        lambda ip, it, ib, kp, lp: refine_frame(
            server_stacked, K, R, t, ip, it, ib, kp, lp, cfg
        )
    )
    F = poses.shape[0]
    out_poses, out_transl, out_betas = [], [], []
    last = poses[0]
    betas_cur = betas
    for f in range(F):
        (pose, tr, be), _ = refine_jit(
            poses[f], transl[f], betas_cur, keypoints_2d[f], last
        )
        out_poses.append(pose)
        out_transl.append(tr)
        out_betas.append(be)
        last = pose
    mean_betas = jnp.mean(jnp.stack(out_betas), axis=0)
    return (
        jnp.stack(out_poses),
        jnp.stack(out_transl),
        mean_betas,
    )
