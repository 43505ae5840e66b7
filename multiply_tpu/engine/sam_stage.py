"""SAM refinement stage: turn rendered instance masks + projected joints into
refined per-person mask logits via promptable segmentation.

Parity target: code/lib/model/sam_model.py (SAMServer.get_sam_mask) — per
frame and person, build point/box/mask-prior prompts from the
stage_instance_mask artifacts and run three chained SAM predictions; stack
logits to stage_sam_mask/<epoch>/sam_opt_mask.npy with shape (F, P, H, W).

Two segmenter backends:
  * `SamJaxSegmenter` — SAM ported to JAX/flax (multiply_tpu/models/sam.py),
    image embeddings computed once per frame on the TPU, three chained
    decoder calls per person. Requires the official SAM checkpoint.
  * `PriorSegmenter` — checkpoint-free fallback: returns the geometric
    instance-mask prior as logits (identity refinement). Keeps the
    progressive loop and all artifacts/dataflow intact so the rest of the
    system is exercisable without downloaded weights.
"""

from __future__ import annotations

import os

import numpy as np

from .instance_masks import build_sam_prompts
from ..utils.io import atomic_np_save


class PriorSegmenter:
    """Checkpoint-free stand-in: logits = +-8 from the rendered instance mask."""

    def __init__(self, image_paths_or_array=None):
        pass

    def __call__(self, epoch: int, run_dir: str = ".") -> np.ndarray:
        stage = os.path.join(run_dir, "stage_instance_mask", f"{epoch:05d}")
        masks = np.load(os.path.join(stage, "all_person_smpl_mask.npy"))  # (F,P,H,W)
        logits = np.where(masks, 8.0, -8.0).astype(np.float32)
        out_dir = os.path.join(run_dir, "stage_sam_mask", f"{epoch:05d}")
        os.makedirs(out_dir, exist_ok=True)
        atomic_np_save(os.path.join(out_dir, "sam_opt_mask.npy"), logits)
        return logits


class ColorPromptPredictor:
    """Checkpoint-free IMAGE-DRIVEN predictor with the SamPredictor contract.

    Segments by color similarity to the prompt's positive/negative points:
    the mask follows the image evidence, not the geometric prior — so bad
    prompts (from a mis-posed body) produce bad masks and good prompts
    recover good masks, which is exactly the property needed to exercise the
    progressive mask self-refinement loop (multiply_model.py:489-519) without
    SAM weights. The box gates the output and the mask prior contributes a
    weak additive term, mirroring how SAMServer chains its three predicts
    (sam_model.py:192-217).
    """

    def __init__(self, sharpness: float = 40.0, prior_weight: float = 0.25):
        self.sharpness = sharpness
        self.prior_weight = prior_weight
        self._img: np.ndarray | None = None

    def set_image(self, img: np.ndarray) -> None:
        img = np.asarray(img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        self._img = img

    def predict(self, point_coords, point_labels, box, mask_input_logits):
        img = self._img
        H, W = img.shape[:2]
        pts = np.asarray(point_coords, np.int64).reshape(-1, 2)
        labels = np.asarray(point_labels).reshape(-1)
        px = np.clip(pts[:, 0], 0, W - 1)
        py = np.clip(pts[:, 1], 0, H - 1)
        colors = img[py, px]  # (N, 3)

        pos = colors[labels == 1]
        if len(pos) == 0:
            return np.full((H, W), -8.0, np.float32)
        d_pos = np.linalg.norm(
            img[None] - pos[:, None, None], axis=-1
        ).min(0)  # (H, W) distance to nearest positive prompt color
        neg = colors[labels == 0]
        if len(neg):
            d_neg = np.linalg.norm(img[None] - neg[:, None, None], axis=-1).min(0)
        else:
            d_neg = np.full((H, W), 0.35, np.float32)
        logits = self.sharpness * (np.minimum(d_neg, 0.35) - d_pos - 0.05)

        if mask_input_logits is not None:
            prior = np.asarray(mask_input_logits, np.float32)
            if prior.shape != (H, W):
                import cv2

                side = max(H, W)
                up = cv2.resize(prior, (side, side))
                prior = up[:H, :W]
            logits = logits + self.prior_weight * np.clip(prior, -8.0, 8.0)

        logits = np.minimum(logits, 8.0)
        if box is not None:
            # hard gate, matching SAM's effective box constraint: pixels
            # outside the box end at logit -8 regardless of color match
            x0, y0, x1, y1 = np.asarray(box, np.int64)
            in_box = np.zeros((H, W), bool)
            in_box[max(0, y0) : min(H, y1 + 1), max(0, x0) : min(W, x1 + 1)] = True
            logits = np.where(in_box, logits, -8.0)
        return np.clip(logits, -12.0, 12.0).astype(np.float32)


class SamSegmenter:
    """Promptable-segmentation stage driven by a predict() backend.

    `predictor` contract (duck-typed; satisfied by models/sam.py SamPredictor
    and trivially mockable in tests):
        set_image(rgb_uint8 HxWx3)
        predict(point_coords, point_labels, box, mask_input_logits) ->
            (mask_logits (H, W) float)
    """

    def __init__(self, predictor, images: list[np.ndarray], seed: int = 42):
        self.predictor = predictor
        self.images = images  # per-frame uint8 RGB arrays (or callables)
        self.seed = seed

    def __call__(self, epoch: int, run_dir: str = ".") -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        stage = os.path.join(run_dir, "stage_instance_mask", f"{epoch:05d}")
        masks = np.load(os.path.join(stage, "all_person_smpl_mask.npy"))  # (F,P,H,W)
        kps = np.load(os.path.join(stage, "2d_keypoint.npy"))  # (F,P,27,2)

        out_frames = []
        for f, img in enumerate(self.images):
            img_arr = img() if callable(img) else img
            self.predictor.set_image(img_arr)
            prompts = build_sam_prompts(masks[f], kps[f], rng)
            person_logits = []
            for pr in prompts:
                logits = pr["mask_prior_logits"]
                for _ in range(3):  # three chained refinements (sam_model.py:192-217)
                    logits = self.predictor.predict(
                        point_coords=pr["points"],
                        point_labels=pr["labels"],
                        box=pr["box"],
                        mask_input_logits=logits,
                    )
                person_logits.append(self._to_full_res(logits, masks.shape[-2:]))
            out_frames.append(np.stack(person_logits, axis=0))

        out = np.stack(out_frames, axis=0).astype(np.float32)
        out_dir = os.path.join(run_dir, "stage_sam_mask", f"{epoch:05d}")
        os.makedirs(out_dir, exist_ok=True)
        atomic_np_save(os.path.join(out_dir, "sam_opt_mask.npy"), out)
        return out

    def _to_full_res(self, logits: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
        if logits.shape == tuple(hw):
            return logits
        if hasattr(self.predictor, "logits_to_full_res"):
            return self.predictor.logits_to_full_res(logits)
        import cv2

        # set_image pads the resized image into the TOP-LEFT of the square
        # model input, so the valid content is always the top-left crop
        H, W = hw
        side = max(H, W)
        up = cv2.resize(logits, (side, side))
        return up[:H, :W]
