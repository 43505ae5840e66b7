"""Epoch-end instance-mask stage: render per-person depth maps over all
frames, derive front-visibility instance masks + projected joints, and write
the stage artifacts the SAM server and dataset consume.

Parity target: code/multiply_model.py:741-939 (get_instance_mask) — per frame
and person, rasterize the posed SMPL mesh (epochs <= 190) or the deformed
learned mesh (later epochs) to a depth map; instance mask = pixels where this
person is frontmost; project the first 27 all-joints (24 SMPL + nose + eyes)
with P. Artifacts:
    stage_instance_mask/<epoch>/all_person_smpl_mask.npy  (F, P, H, W) bool
    stage_instance_mask/<epoch>/2d_keypoint.npy           (F, P, 27, 2) int

The rasterization runs in the native C++ z-buffer (multiply_tpu/native.py);
mesh extraction and deformation stay on the TPU.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from ..native import rasterize_depth
from ..utils.io import atomic_np_save

NUM_PROMPT_JOINTS = 27


def project_points(P: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """(3x4 or 4x4 projection) x (N,3) -> pixel coords (N,2) float."""
    h = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=-1)
    uvw = (P[:3, :4] @ h.T).T
    return uvw[:, :2] / uvw[:, 2:3]


def project_depth(P: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Per-vertex (x_pix, y_pix, z_proj) for the z-buffer rasterizer."""
    h = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=-1)
    uvw = (P[:3, :4] @ h.T).T
    return np.stack([uvw[:, 0] / uvw[:, 2], uvw[:, 1] / uvw[:, 2], uvw[:, 2]], axis=-1)


def render_instance_masks(
    mesh_per_person: list[tuple[np.ndarray, np.ndarray]],  # [(verts, faces)] posed
    joints_per_person: list[np.ndarray],  # [(J>=27, 3)] posed all-joints
    P: np.ndarray,
    img_hw: tuple[int, int],
) -> tuple[np.ndarray, np.ndarray]:
    """One frame: (instance_masks (P, H, W) bool, keypoints (P, 27, 2) int32)."""
    H, W = img_hw
    depths = []
    for verts, faces in mesh_per_person:
        vp = project_depth(P, verts).astype(np.float32)
        depths.append(rasterize_depth(vp, faces, W, H))
    depth = np.stack(depths, axis=0)  # (P, H, W), inf = no hit

    front = np.min(np.where(np.isfinite(depth), depth, 999.0), axis=0)
    masks = np.isfinite(depth) & (
        np.where(np.isfinite(depth), depth, -1.0) == front[None]
    )

    kps = []
    for joints in joints_per_person:
        pix = project_points(P, joints[:NUM_PROMPT_JOINTS])
        kps.append(pix.astype(np.int32))
    return masks, np.stack(kps, axis=0)


def run_instance_mask_stage(
    epoch: int,
    frames: list[dict],  # per frame: {"P", "img_size", "meshes", "joints"}
    out_dir: str = ".",
) -> tuple[np.ndarray, np.ndarray]:
    """Render all frames and write the stage artifacts. Returns (masks, kps)."""
    all_masks, all_kps = [], []
    for fr in frames:
        masks, kps = render_instance_masks(
            fr["meshes"], fr["joints"], fr["P"], fr["img_size"]
        )
        all_masks.append(masks)
        all_kps.append(kps)
    masks = np.stack(all_masks, axis=0)  # (F, P, H, W)
    kps = np.stack(all_kps, axis=0)  # (F, P, 27, 2)

    stage = os.path.join(out_dir, "stage_instance_mask", f"{epoch:05d}")
    os.makedirs(stage, exist_ok=True)
    atomic_np_save(os.path.join(stage, "all_person_smpl_mask.npy"), masks)
    atomic_np_save(os.path.join(stage, "2d_keypoint.npy"), kps)
    return masks, kps


# ---------------------------------------------------------------------------
# SAM prompt construction (consumed by engine/sam_stage.py)
# ---------------------------------------------------------------------------


def build_sam_prompts(
    instance_masks: np.ndarray,  # (P, H, W) bool — one frame
    keypoints: np.ndarray,  # (P, 27, 2) int
    rng: np.random.Generator,
) -> list[dict]:
    """Per-person point/box/mask-prior prompts (sam_model.py:69-191)."""
    P, H, W = instance_masks.shape
    prompts = []
    for pid in range(P):
        mask = instance_masks[pid]
        others = np.delete(instance_masks, pid, axis=0)
        neg_mask = (
            others.max(axis=0) if len(others) else np.zeros_like(mask)
        )

        idx = np.argwhere(mask)
        if len(idx) == 0:
            idx = np.asarray([[H // 2, W // 2]])
        x_min, y_min = idx[:, 1].min(), idx[:, 0].min()
        x_max, y_max = idx[:, 1].max(), idx[:, 0].max()
        x_min = max(0, x_min - int(0.03 * (x_max - x_min)))
        y_min = max(0, y_min - int(0.03 * (y_max - y_min)))
        x_max = min(W, x_max + int(0.03 * (x_max - x_min)))
        y_max = min(H, y_max + int(0.03 * (y_max - y_min)))
        box = np.asarray([x_min, y_min, x_max, y_max])

        # square-padded 256x256 mask prior, as logits
        import cv2

        # the predictor pads the resized image into the TOP-LEFT of its square
        # input (models/sam.py set_image), so the mask prior must align there
        side = max(H, W)
        canvas = np.zeros((side, side), np.uint8)
        canvas[:H, :W] = mask
        prior = cv2.resize(canvas, (256, 256)).astype(np.float32)
        eps = 1e-6
        prior_logit = np.log(np.clip(prior, eps, 1 - eps) / np.clip(1 - prior, eps, 1 - eps))

        kp_int = np.round(np.asarray(keypoints[pid], np.float64)).astype(np.int64)
        pos = [
            p
            for p in kp_int
            if 0 <= p[1] < H and 0 <= p[0] < W and mask[p[1], p[0]] > 0.7
        ]
        if not pos:
            ys, xs = np.nonzero(mask)
            if len(xs):
                j = rng.integers(0, len(xs))
                pos = [np.asarray([xs[j], ys[j]])]
            else:
                pos = [kp_int[-1]]

        neg = []
        tries = 0
        while len(neg) < 10 and tries < 10_000:
            x, y = rng.integers(0, W), rng.integers(0, H)
            tries += 1
            if not mask[y, x]:
                neg.append([x, y])
        for other in range(P):
            if other == pid:
                continue
            for p in np.round(np.asarray(keypoints[other], np.float64)).astype(np.int64):
                if (
                    0 <= p[1] < H
                    and 0 <= p[0] < W
                    and mask[p[1], p[0]] < 0.7
                    and neg_mask[p[1], p[0]] > 0.7
                ):
                    neg.append([int(p[0]), int(p[1])])

        prompts.append(
            {
                "points": np.asarray(list(pos) + neg, np.float32),
                "labels": np.concatenate(
                    [np.ones(len(pos)), np.zeros(len(neg))]
                ).astype(np.int32),
                "box": box.astype(np.float32),
                "mask_prior_logits": prior_logit,
            }
        )
    return prompts
