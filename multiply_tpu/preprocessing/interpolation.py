"""SO(3) interpolation of missing tracker frames.

Parity target: preprocessing/preprocessing_multiple_trace.py:19-69 — when a
person's detection drops out for a span of frames, interpolate their pose
(per-joint rotation slerp) and translation (linear) from the surrounding
valid frames before refinement.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation, Slerp


def interpolate_missing_frames(
    poses: np.ndarray,  # (F, 72) axis-angle for ONE person
    trans: np.ndarray,  # (F, 3)
    valid: np.ndarray,  # (F,) bool — detection present
) -> tuple[np.ndarray, np.ndarray]:
    """Fill invalid frames by per-joint rotation slerp + linear translation.

    Leading/trailing gaps copy the nearest valid frame.
    """
    F = poses.shape[0]
    valid_idx = np.where(valid)[0]
    if len(valid_idx) == 0:
        return poses.copy(), trans.copy()

    out_poses = poses.copy()
    out_trans = trans.copy()

    # per-joint slerp keyed on valid frames
    key_times = valid_idx.astype(np.float64)
    for j in range(24):
        rots = Rotation.from_rotvec(poses[valid_idx, 3 * j : 3 * j + 3])
        if len(valid_idx) == 1:
            fill = np.broadcast_to(
                poses[valid_idx[0], 3 * j : 3 * j + 3], (F, 3)
            )
            out_poses[:, 3 * j : 3 * j + 3] = fill
            continue
        slerp = Slerp(key_times, rots)
        t = np.clip(np.arange(F, dtype=np.float64), key_times[0], key_times[-1])
        out_poses[:, 3 * j : 3 * j + 3] = slerp(t).as_rotvec()

    for d in range(3):
        out_trans[:, d] = np.interp(
            np.arange(F), valid_idx, trans[valid_idx, d]
        )

    # keep the original values on valid frames exactly
    out_poses[valid_idx] = poses[valid_idx]
    out_trans[valid_idx] = trans[valid_idx]
    return out_poses, out_trans
