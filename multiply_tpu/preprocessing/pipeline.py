"""End-to-end preprocessing: tracked SMPL estimates + keypoints -> training
data directory.

Parity target: preprocessing/run_preprocessing_multiply.sh's stages
(reference preprocessing_multiple_trace.py modes `mask`/`refine`/`final` +
normalize_cameras_trace.py):

  1. external: frame extraction + TRACE multi-person tracking + ViTPose
     (wrapped behind `TraceInputs` — any tracker that emits per-frame
     per-person SMPL params and 2D keypoints plugs in);
  2. `mask`: PnP translation init + SMPL mask rendering (native rasterizer);
  3. `refine`: JAX keypoint refinement (preprocessing/refine.py);
  4. `final`: downscale, dilate masks, per-frame scene centering, emit
     data/<seq>/{image,mask}/, poses.npy, normalize_trans.npy,
     mean_shape.npy, gender.npy, cameras.npz, max_human_sphere.npy;
  5. camera normalization -> cameras_normalize.npz.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import cv2
import numpy as np

from ..body.server import SMPLServer, smpl_server_forward
from .cameras import (
    estimate_translation_pnp,
    max_human_sphere_radius,
    normalize_cameras,
)


@dataclass
class TraceInputs:
    """Tracker outputs reorganized per person (ait_viewer_vis/aitcamera.py's
    track-id reorg): everything indexed [frame, person, ...]."""

    images: list[np.ndarray]  # F x (H, W, 3) uint8
    poses: np.ndarray  # (F, P, 72) axis-angle
    betas: np.ndarray  # (P, 10)
    trans: np.ndarray  # (F, P, 3) camera-space translations (may be coarse)
    keypoints_2d: np.ndarray  # (F, P, 17, 3) detected keypoints + confidence
    genders: list[str]
    K: np.ndarray  # (3, 3) intrinsics


def init_translations_pnp(
    servers: list[SMPLServer], inputs: TraceInputs
) -> np.ndarray:
    """Per frame/person EPnP translation from SMPL joints vs detections
    (preprocessing_multiple_trace.py `mask` mode)."""
    import jax.numpy as jnp

    from .refine import SMPL_TO_COCO17, SMPL_TO_OPENPOSE25

    F, P = inputs.poses.shape[:2]
    n_kp = inputs.keypoints_2d.shape[2]
    joint_map = np.asarray(SMPL_TO_COCO17 if n_kp == 17 else SMPL_TO_OPENPOSE25)
    has = joint_map >= 0
    out = np.zeros((F, P, 3), np.float32)
    for f in range(F):
        for p in range(P):
            smpl_out = smpl_server_forward(
                servers[p],
                jnp.ones(()),
                jnp.zeros(3),
                jnp.asarray(inputs.poses[f, p]),
                jnp.asarray(inputs.betas[p]),
            )
            j3d = np.asarray(smpl_out["smpl_all_jnts"])[np.maximum(joint_map, 0)]
            kp = inputs.keypoints_2d[f, p]
            conf = (kp[:, 2] > 0.3) & has
            if conf.sum() >= 6:
                t = estimate_translation_pnp(j3d[conf], kp[conf, :2], inputs.K)
            else:
                t = inputs.trans[f, p]
            out[f, p] = t
    return out


def finalize_sequence(
    out_root: str,
    inputs: TraceInputs,
    servers: list[SMPLServer],
    poses: np.ndarray,  # (F, P, 72) refined
    trans: np.ndarray,  # (F, P, 3) refined
    betas: np.ndarray,  # (P, 10) mean shape
    scale_factor: int = 2,
    mask_dilate: int = 20,
    scene_bounding_sphere: float = 3.0,
) -> None:
    """`final` stage + camera normalization: write the training directory."""
    import jax.numpy as jnp

    from ..native import rasterize_depth
    from ..engine.instance_masks import project_depth

    F, P = poses.shape[:2]
    H, W = inputs.images[0].shape[:2]
    Hs, Ws = H // scale_factor, W // scale_factor
    K = inputs.K.copy()
    K[:2] /= scale_factor

    os.makedirs(os.path.join(out_root, "image"), exist_ok=True)
    for p in range(P):
        os.makedirs(os.path.join(out_root, "mask", str(p)), exist_ok=True)

    # per-frame scene centering: shift so the persons' mean is at the origin
    # (preprocessing_multiple_trace.py:563-576 normalize_shift)
    normalize_trans = trans.copy()
    all_verts = []
    P_mats = {}
    kernel = np.ones((mask_dilate, mask_dilate), np.uint8)
    Rt = np.eye(4, dtype=np.float32)[:3]

    for f in range(F):
        img = cv2.resize(inputs.images[f], (Ws, Hs))
        cv2.imwrite(
            os.path.join(out_root, "image", f"{f:04d}.png"), img[:, :, ::-1]
        )
        shift = trans[f].mean(axis=0)
        normalize_trans[f] = trans[f] - shift
        cam_shift = Rt[:3, :3] @ shift  # camera translated oppositely
        Rt_f = Rt.copy()
        Rt_f[:3, 3] += cam_shift
        P_mat = np.eye(4, dtype=np.float32)
        P_mat[:3, :4] = K @ Rt_f
        P_mats[f"cam_{f}"] = P_mat

        for p in range(P):
            out = smpl_server_forward(
                servers[p],
                jnp.ones(()),
                jnp.asarray(normalize_trans[f, p]),
                jnp.asarray(poses[f, p]),
                jnp.asarray(betas[p]),
            )
            verts = np.asarray(out["smpl_verts"])
            all_verts.append(verts)
            vp = project_depth(P_mat, verts).astype(np.float32)
            depth = rasterize_depth(
                vp, np.asarray(servers[p].model.faces), Ws, Hs
            )
            mask = (np.isfinite(depth) * 255).astype(np.uint8)
            mask = cv2.dilate(mask, kernel)
            cv2.imwrite(
                os.path.join(out_root, "mask", str(p), f"{f:04d}.png"), mask
            )

    np.save(os.path.join(out_root, "poses.npy"), poses.astype(np.float32))
    np.save(
        os.path.join(out_root, "normalize_trans.npy"),
        normalize_trans.astype(np.float32),
    )
    np.save(os.path.join(out_root, "mean_shape.npy"), betas.astype(np.float32))
    np.save(os.path.join(out_root, "gender.npy"), np.asarray(inputs.genders))

    sphere = max_human_sphere_radius(np.concatenate(all_verts))
    np.save(os.path.join(out_root, "max_human_sphere.npy"), sphere)
    np.savez(os.path.join(out_root, "cameras.npz"), **P_mats)

    normalized = normalize_cameras(
        P_mats, max_human_sphere=sphere, scene_bounding_sphere=scene_bounding_sphere
    )
    np.savez(os.path.join(out_root, "cameras_normalize.npz"), **normalized)


def preprocess_sequence(
    out_root: str,
    inputs: TraceInputs,
    servers: list[SMPLServer],
    refine_iters: int = 150,
    scale_factor: int = 2,
) -> None:
    """Full pipeline from tracker outputs to a training-ready directory.

    Keypoint format is inferred from the joint count: 17 = ViTPose/COCO,
    25 = OpenPose BODY_25 (reference run_openpose_multiple_trace.py path).
    """
    import jax
    import jax.numpy as jnp

    from .refine import RefineConfig, refine_sequence

    trans0 = init_translations_pnp(servers, inputs)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *servers)
    poses, trans, betas = refine_sequence(
        stacked,
        jnp.asarray(inputs.K),
        jnp.eye(3),
        jnp.zeros(3),
        jnp.asarray(inputs.poses),
        jnp.asarray(trans0),
        jnp.asarray(inputs.betas),
        jnp.asarray(inputs.keypoints_2d),
        RefineConfig(
            iters=refine_iters,
            is_vitpose=inputs.keypoints_2d.shape[2] == 17,
        ),
    )
    finalize_sequence(
        out_root,
        inputs,
        servers,
        np.asarray(poses),
        np.asarray(trans),
        np.asarray(betas),
        scale_factor=scale_factor,
    )
