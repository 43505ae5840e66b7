"""Preprocessing camera utilities: PnP translation init and VolSDF camera
normalization.

Parity targets: preprocessing/preprocessing_utils.py:162-174
(estimate_translation_cv2) and preprocessing/normalize_cameras_trace.py —
scale cameras so the scene (cameras + all humans) fits the radius-3 bounding
sphere the renderer assumes.
"""

from __future__ import annotations

import cv2
import numpy as np

INVALID_TRANS = np.ones(3) * -1


def estimate_translation_pnp(
    joints_3d: np.ndarray,  # (J, 3) model-space joints
    joints_2d: np.ndarray,  # (J, 2) detected pixels
    K: np.ndarray,  # (3, 3)
) -> np.ndarray:
    """EPnP+RANSAC translation from 3D-2D joint correspondences."""
    ok, _, tvec, inliers = cv2.solvePnPRansac(
        joints_3d.astype(np.float32),
        joints_2d.astype(np.float32),
        K.astype(np.float64),
        None,
        flags=cv2.SOLVEPNP_EPNP,
        reprojectionError=20,
        iterationsCount=100,
    )
    if inliers is None:
        return INVALID_TRANS
    return tvec[:, 0]


def camera_center(P: np.ndarray) -> np.ndarray:
    out = cv2.decomposeProjectionMatrix(P[:3, :4])
    c = out[2]
    return (c[:3] / c[3])[:, 0]


def normalize_cameras(
    cameras: dict,  # {"cam_%d": (3or4, 4) projection}
    max_human_sphere: float,
    scene_bounding_sphere: float = 3.0,
) -> dict:
    """Build scale/world matrices so scene radius <= scene_bounding_sphere
    (normalize_cameras_trace.py:28-61)."""
    idxs = sorted(
        int(k.split("_")[-1]) for k in cameras if k.startswith("cam_")
    )
    centers = np.stack([camera_center(np.asarray(cameras[f"cam_{i}"])) for i in idxs])
    max_radius = np.linalg.norm(centers, axis=-1).max() * 1.1
    max_radius = max(max_radius, max_human_sphere * 1.1)

    normalization = np.eye(4, dtype=np.float32)
    normalization[0, 0] = normalization[1, 1] = normalization[2, 2] = (
        max_radius / scene_bounding_sphere
    )

    out = {}
    for i in idxs:
        out[f"scale_mat_{i}"] = normalization
        out[f"world_mat_{i}"] = np.asarray(cameras[f"cam_{i}"], np.float32).copy()
    return out


def max_human_sphere_radius(all_verts: np.ndarray) -> float:
    """Radius of the origin-centered sphere containing all posed human verts
    across frames/persons (preprocessing final stage)."""
    return float(np.linalg.norm(all_verts.reshape(-1, 3), axis=-1).max())
