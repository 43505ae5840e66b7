"""Detection-to-track matching for pose estimators.

Parity targets: preprocessing/vitpose_trace.py:206-269 (center+skeleton NMS
for duplicate detections, Hungarian matching of detections to tracked persons
by mask-center distance with a 200px gate) and
preprocessing/run_openpose_multiple_trace.py:69-109 (same idea for 25-kpt
output). Pure numpy/scipy — host-side glue around external pose models.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def keypoint_center(kps: np.ndarray) -> np.ndarray:
    """Confidence-weighted center of a (J, 3) keypoint set."""
    conf = kps[:, 2:3]
    w = np.maximum(conf, 1e-6)
    return (kps[:, :2] * w).sum(0) / w.sum()


def skeleton_nms(
    detections: list[np.ndarray],  # [(J, 3)] keypoints per detection
    center_thresh: float = 50.0,
    kp_thresh: float = 30.0,
) -> list[np.ndarray]:
    """Drop duplicate detections: close centers AND close mean keypoint
    distance (vitpose_trace.py:206-251)."""
    keep: list[np.ndarray] = []
    for det in sorted(detections, key=lambda d: -float(d[:, 2].mean())):
        dup = False
        for k in keep:
            c_dist = np.linalg.norm(keypoint_center(det) - keypoint_center(k))
            kp_dist = np.linalg.norm(det[:, :2] - k[:, :2], axis=-1).mean()
            if c_dist < center_thresh and kp_dist < kp_thresh:
                dup = True
                break
        if not dup:
            keep.append(det)
    return keep


def match_detections_to_tracks(
    detections: list[np.ndarray],  # [(J, 3)] keypoints per detection
    track_centers: np.ndarray,  # (P, 2) expected person centers (mask/SMPL)
    gate_px: float = 200.0,
) -> list[int | None]:
    """Hungarian assignment detection->track with a distance gate.

    Returns, per track, the index of its matched detection (or None).
    """
    P = len(track_centers)
    if not detections:
        return [None] * P
    det_centers = np.stack([keypoint_center(d) for d in detections])
    cost = np.linalg.norm(
        det_centers[:, None, :] - track_centers[None, :, :], axis=-1
    )
    rows, cols = linear_sum_assignment(cost)
    out: list[int | None] = [None] * P
    for r, c in zip(rows, cols):
        if cost[r, c] <= gate_px:
            out[c] = int(r)
    return out
