"""ViTPose inference wrapper: bbox-prompted 2D keypoints for refinement.

Parity target: preprocessing/vitpose_trace.py:137-299 — the reference drives
an external mmpose ViTPose-H with TRACE bboxes per frame, de-duplicates with
center+skeleton NMS and Hungarian-matches detections to tracked persons. Here
the model comes from `transformers` (VitPoseForPoseEstimation, COCO-17
output), loaded from a LOCAL checkpoint directory — no network access; the
matching/NMS glue is shared with `matching.py`.

Kept host-side torch (CPU): this is offline preprocessing at a handful of
frames/s, not the TPU training path.
"""

from __future__ import annotations

import os

import numpy as np

from .matching import match_detections_to_tracks, skeleton_nms


class VitPoseDetector:
    """Bbox-prompted COCO-17 keypoint detector.

    Parameters
    ----------
    checkpoint: local directory for ``VitPoseForPoseEstimation.from_pretrained``
        (e.g. an offline copy of ``usyd-community/vitpose-base``). Required
        unless ``config`` is given.
    config: a ``transformers.VitPoseConfig`` for a randomly-initialized model
        (test path — exercises the full pre/post-processing without weights).
    """

    def __init__(self, checkpoint: str | None = None, config=None):
        try:
            import torch
            from transformers import VitPoseForPoseEstimation, VitPoseImageProcessor
        except ImportError as e:  # transformers too old / torch absent
            raise RuntimeError(
                "VitPoseDetector needs transformers>=4.48 with VitPose "
                f"support and torch: {e}"
            ) from e
        self._torch = torch
        if checkpoint is not None:
            if not os.path.isdir(checkpoint):
                raise FileNotFoundError(
                    f"ViTPose checkpoint directory not found: {checkpoint} "
                    "(offline env: pass a local from_pretrained directory)"
                )
            self.model = VitPoseForPoseEstimation.from_pretrained(checkpoint)
            try:
                self.processor = VitPoseImageProcessor.from_pretrained(checkpoint)
            except Exception:
                self.processor = VitPoseImageProcessor()
        elif config is not None:
            self.model = VitPoseForPoseEstimation(config)
            bb = getattr(config, "backbone_config", None)
            size = getattr(bb, "image_size", None) if bb is not None else None
            self.processor = (
                VitPoseImageProcessor(size={"height": size[0], "width": size[1]})
                if size
                else VitPoseImageProcessor()
            )
        else:
            raise ValueError("need checkpoint or config")
        self.model.eval()

    def __call__(self, image: np.ndarray, boxes: np.ndarray) -> list[np.ndarray]:
        """Keypoints for each prompt box.

        image: (H, W, 3) uint8 RGB. boxes: (D, 4) [x, y, w, h] (COCO box
        format, as the reference feeds TRACE bboxes to mmpose).
        Returns a list of D (17, 3) arrays [x, y, confidence] in image pixels.
        """
        torch = self._torch
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        if len(boxes) == 0:
            return []
        inputs = self.processor(
            images=image, boxes=[boxes], return_tensors="pt"
        )
        with torch.no_grad():
            outputs = self.model(**inputs)
        results = self.processor.post_process_pose_estimation(
            outputs, boxes=[boxes]
        )[0]
        dets = []
        for r in results:
            xy = r["keypoints"].cpu().numpy().astype(np.float32)
            sc = r["scores"].cpu().numpy().astype(np.float32)
            dets.append(np.concatenate([xy, sc[:, None]], axis=-1))
        return dets


def detect_and_track(
    detector,
    image: np.ndarray,
    boxes: np.ndarray,
    track_centers: np.ndarray,
    conf_floor: float = 0.3,
) -> np.ndarray:
    """One frame of the reference's detect->NMS->match loop
    (vitpose_trace.py:192-299): run the detector on the prompt boxes,
    drop duplicate skeletons, Hungarian-match survivors to the P tracked
    persons, and return (P, 17, 3) keypoints — zero-confidence rows for
    unmatched tracks (the refinement stage's GMoF ignores them).
    """
    P = len(track_centers)
    dets = detector(image, boxes)
    dets = [d for d in dets if float(d[:, 2].mean()) >= conf_floor]
    dets = skeleton_nms(dets)
    assign = match_detections_to_tracks(dets, np.asarray(track_centers, np.float32))
    out = np.zeros((P, 17, 3), np.float32)
    for p, di in enumerate(assign):
        if di is not None:
            out[p] = dets[di]
    return out
