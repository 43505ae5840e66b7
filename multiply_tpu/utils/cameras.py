"""Camera utilities: projection-matrix decomposition and ray generation.

Parity target: code/lib/utils/rend_util.py:21-147. Decomposition happens on
host (numpy/cv2); ray generation is pure jnp and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def load_K_Rt_from_P(P: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decompose a 3x4 projection matrix into intrinsics and camera-to-world pose.

    Matches rend_util.load_K_Rt_from_P (cv2.decomposeProjectionMatrix + K
    normalization). Returns (intrinsics 4x4, pose 4x4) float32.
    """
    import cv2

    P = np.asarray(P)[:3, :4].astype(np.float64)
    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]

    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Unproject pixel coords to homogeneous camera-space points (rend_util.lift)."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    sk = intrinsics[0, 1]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> (3, 3) rotation (rend_util.py:90-108)."""
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(3, 3) rotation -> unit quaternion (w, x, y, z) (rend_util.py:110-128).

    Assumes trace(R) > -1 (true for camera poses near identity, as in the
    reference's implementation, which uses the same single-branch formula)."""
    w = jnp.sqrt(jnp.maximum(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12)) / 2
    return jnp.array(
        [
            w,
            (R[2, 1] - R[1, 2]) / (4 * w),
            (R[0, 2] - R[2, 0]) / (4 * w),
            (R[1, 0] - R[0, 1]) / (4 * w),
        ]
    )


def pose_from_quat7(pose7: jnp.ndarray) -> jnp.ndarray:
    """(7,) [quat wxyz | cam_loc] -> (4, 4) camera-to-world
    (rend_util.get_camera_params quaternion branch, :46-51)."""
    p = jnp.eye(4)
    p = p.at[:3, :3].set(quat_to_rot(pose7[:4]))
    return p.at[:3, 3].set(pose7[4:])


def get_camera_params(
    uv: jnp.ndarray,  # (N, 2) pixel coordinates
    pose: jnp.ndarray,  # (4, 4) camera-to-world, or (7,) [quat | loc]
    intrinsics: jnp.ndarray,  # (3, 3) or (4, 4)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel coords -> world-space unit ray directions + camera location.

    Unbatched (one camera); vmap over frames. Matches
    rend_util.get_camera_params for both pose representations (the 7-vector
    quaternion form is used by IDR-style datasets with trainable cameras).
    """
    if pose.ndim == 1:
        pose = pose_from_quat7(pose)
    cam_loc = pose[:3, 3]
    z = jnp.ones_like(uv[:, 0])
    pts_cam = lift(uv[:, 0], uv[:, 1], z, intrinsics)  # (N,4)
    world = (pose @ pts_cam.T).T[:, :3]
    ray_dirs = world - cam_loc[None, :]
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)
    return ray_dirs, cam_loc


def get_sphere_intersections(
    cam_loc: jnp.ndarray,  # (N, 3)
    ray_dirs: jnp.ndarray,  # (N, 3)
    r: float = 1.0,
) -> jnp.ndarray:
    """Near/far ray-sphere intersection distances, clamped at 0 (rend_util:131-147).

    Unlike the reference (which exits the process on a miss) rays that miss the
    sphere are clamped to the tangent point — static-shape-safe; callers treat
    near==far as an empty interval.
    """
    d = jnp.sum(ray_dirs * cam_loc, axis=-1, keepdims=True)
    under_sqrt = d**2 - (jnp.sum(cam_loc**2, axis=-1, keepdims=True) - r**2)
    sqrt = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    near_far = sqrt * jnp.asarray([-1.0, 1.0]) - d
    return jnp.maximum(near_far, 0.0)


def pixel_grid(width: int, height: int) -> np.ndarray:
    """Full-image (H*W, 2) uv grid in the reference's (x, y) convention."""
    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.float32)
