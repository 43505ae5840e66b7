"""Adapter exposing a SyntheticScene through the Hi4DSequence interface, so
the full Trainer (epoch loop, refinement stages, opt_depth) runs without
preprocessed video data."""

from __future__ import annotations

import glob
import os

import numpy as np

from .dataset import weighted_sampling
from .synthetic import SyntheticScene


class SyntheticSequence:
    def __init__(
        self,
        scene: SyntheticScene,
        num_sample: int = 128,
        using_sam: bool = True,
        ratio_uncertain: float = 0.5,
        run_dir: str = ".",
    ):
        self.scene = scene
        self.num_sample = num_sample
        self.using_sam = using_sam
        self.ratio_uncertain = ratio_uncertain
        self.run_dir = run_dir

        self.num_person = scene.betas.shape[0]
        self.shape = scene.betas
        self.poses = scene.poses
        self.trans = scene.transl
        self.scale = 1.0
        self.genders = ["neutral"] * self.num_person

        H, W = scene.height, scene.width
        # projection P = K [R|t] from the scene camera (world->pixel)
        Rt = np.linalg.inv(scene.cam_pose[0])[:3, :4]
        self._P = np.eye(4, dtype=np.float32)
        self._P[:3, :4] = scene.intrinsics @ Rt

        self._sam_path = ""
        self._sam_masks: np.ndarray | None = None
        self.smpl_sam_iou = np.ones(len(scene.images))
        self.uncertain_threshold = 0.0

    def __len__(self) -> int:
        return len(self.scene.images)

    def _refresh_sam(self) -> None:
        dirs = sorted(glob.glob(os.path.join(self.run_dir, "stage_sam_mask", "*")))
        if not dirs:
            return
        path = os.path.join(dirs[-1], "sam_opt_mask.npy")
        if path == self._sam_path or not os.path.exists(path):
            return
        try:
            sam = np.load(path)  # (F, P, H, W) logits
        except (OSError, ValueError):
            return
        self._sam_masks = sam.transpose(0, 2, 3, 1)
        self._sam_path = path
        smpl_dirs = sorted(
            glob.glob(os.path.join(self.run_dir, "stage_instance_mask", "*"))
        )
        if smpl_dirs:
            smpl_mask = (
                np.load(os.path.join(smpl_dirs[-1], "all_person_smpl_mask.npy")) > 0.8
            )
            sam_bin = sam > 0.0
            inter = np.logical_and(sam_bin, smpl_mask).sum(axis=(2, 3))
            union = np.logical_or(sam_bin, smpl_mask).sum(axis=(2, 3))
            self.smpl_sam_iou = (inter / np.maximum(union, 1)).mean(axis=-1)
            s = np.sort(self.smpl_sam_iou)
            self.uncertain_threshold = s[int(len(s) * self.ratio_uncertain)]

    def load_frame(self, idx: int) -> dict:
        """Full-image arrays in the Hi4DSequence.load_frame layout (used by
        opt_depth's per-iteration render-anchor ray sampling)."""
        scene = self.scene
        uv = np.stack(
            np.meshgrid(np.arange(scene.width), np.arange(scene.height), indexing="xy"),
            axis=-1,
        ).astype(np.float32)
        masks = [scene.masks[idx][..., p] for p in range(self.num_person)]
        return {
            "img": scene.images[idx],
            "mask_union": np.stack(masks, -1).sum(-1),
            "uv": uv,
            "masks": masks,
        }

    def get_train_item(self, idx: int, rng: np.random.Generator) -> dict:
        if self.using_sam:
            self._refresh_sam()
        scene = self.scene
        data = {
            "rgb": scene.images[idx],
            "uv": np.stack(
                np.meshgrid(np.arange(scene.width), np.arange(scene.height), indexing="xy"),
                axis=-1,
            ).astype(np.float32),
            "object_mask": scene.masks[idx].any(-1),
        }
        sam = self._sam_masks[idx] if self._sam_masks is not None else scene.sam_logits[idx]
        data["sam_mask"] = sam
        samples, _ = weighted_sampling(
            data, (scene.height, scene.width), self.num_sample, rng
        )
        is_certain = bool(self.smpl_sam_iou[idx] >= self.uncertain_threshold)
        out = {
            "uv": samples["uv"].astype(np.float32),
            "rgb": samples["rgb"].astype(np.float32),
            "sam_mask": samples["sam_mask"].astype(np.float32),
            "intrinsics": scene.intrinsics,
            "pose": scene.cam_pose[idx],
            "P": self._P,
            "smpl_pose": scene.poses[idx],
            "smpl_trans": scene.transl[idx],
            "smpl_shape": scene.betas,
            "smpl_scale": scene.scale,
            "idx": idx,
            "is_certain": is_certain,
        }
        if not is_certain:
            # uncertain frames substitute 50/40/10 mask/edge/random rays for
            # MODE_DELAYED_POSE, same as Hi4DSequence (reference Hi4D.py:27-53,
            # 186-229); the edge band is derived from the mask union
            import cv2

            from .dataset import edge_sampling

            m = (data["object_mask"] > 0).astype(np.uint8)
            band = (
                cv2.dilate(m, np.ones((5, 5), np.uint8))
                - cv2.erode(m, np.ones((5, 5), np.uint8))
            ) > 0
            es = edge_sampling(
                {
                    "rgb": data["rgb"],
                    "uv": data["uv"],
                    "sam_mask": sam,
                    "person_mask": data["object_mask"] > 0,
                    "edge_mask": band,
                },
                self.num_sample,
                rng,
            )
            out["edge_uv"] = es["uv"].astype(np.float32)
            out["edge_rgb"] = es["rgb"].astype(np.float32)
            out["edge_sam_mask"] = es["sam_mask"].astype(np.float32)
        return out

    def get_eval_item(self, idx: int) -> dict:
        scene = self.scene
        H, W = scene.height, scene.width
        uv = np.stack(
            np.meshgrid(np.arange(W), np.arange(H), indexing="xy"), axis=-1
        ).reshape(-1, 2).astype(np.float32)
        return {
            "uv": uv,
            "rgb": scene.images[idx].reshape(-1, 3),
            "intrinsics": scene.intrinsics,
            "pose": scene.cam_pose[idx],
            "P": self._P,
            "smpl_pose": scene.poses[idx],
            "smpl_trans": scene.transl[idx],
            "smpl_shape": scene.betas,
            "smpl_scale": scene.scale,
            "idx": idx,
            "img_size": (H, W),
            "masks": [scene.masks[idx][..., p] for p in range(self.num_person)],
        }
