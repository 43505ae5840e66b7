"""TRACE tracker output -> TraceInputs conversion.

Parity target: ait_viewer_vis/aitcamera.py:101-172 — TRACE emits one flat
array per *detection*; `reorganize_idx` maps detections to source frames and
`track_ids` to persons. The reformat produces [person, frame, ...] arrays
(the reference also re-runs SMPL to store verts; downstream stages recompute
SMPL anyway so we skip that).

The converter then builds the pipeline's `TraceInputs`, preferring externally
supplied COCO-17 keypoints (ViTPose, matched to tracks via
matching.match_detections_to_tracks) and falling back to TRACE's own
projected joints (`pj2d_org`).
"""

from __future__ import annotations

import glob
import os

import cv2
import numpy as np

from .matching import keypoint_center as _kp_center
from .matching import match_detections_to_tracks, skeleton_nms
from .pipeline import TraceInputs

# TRACE/ROMP pj2d_org carries 44 joints: the 24 SMPL joints first, then the
# extended set (nose/eyes/ears at 24..28, matching our SMPL all-joints
# layout) — the same indices refine.SMPL_TO_COCO17 / SMPL_TO_OPENPOSE25 use.
TRACE_TO_COCO17 = np.asarray(
    [24, 26, 25, 28, 27, 16, 17, 18, 19, 20, 21, 1, 2, 4, 5, 7, 8]
)
# BODY_25 layout; -1 = no SMPL correspondent (feet extras), zero-conf.
# Eye/ear tail matches the reference's smpl2op map
# (preprocessing_utils.py:43: [..., 25, 26, 27, 28]).
TRACE_TO_OPENPOSE25 = np.asarray(
    [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
     25, 26, 27, 28, -1, -1, -1, -1, -1, -1]
)


def reformat_trace_output(outputs: dict) -> dict:
    """Flat per-detection TRACE arrays -> {key: (P, F, ...)} keyed by track.

    Mirrors aitcamera.py:101-121: frames = unique(reorganize_idx) in order,
    persons = unique(track_ids) in order (the reference assumes ids 1..P and
    indexes with id-1; rank-of-id is identical there and robust otherwise).
    """
    reorganize_idx = np.asarray(outputs["reorganize_idx"]).reshape(-1)
    track_ids = np.asarray(outputs["track_ids"]).reshape(-1)
    used_frames = np.unique(reorganize_idx)
    unique_ids = np.unique(track_ids)
    frame_of = {int(v): i for i, v in enumerate(used_frames)}
    person_of = {int(v): i for i, v in enumerate(unique_ids)}
    P, F = len(unique_ids), len(used_frames)

    valid = np.zeros((P, F), bool)

    def gather(key, trailing):
        src = np.asarray(outputs[key])
        out = np.zeros((P, F) + trailing, np.float32)
        for det in range(len(track_ids)):
            p = person_of[int(track_ids[det])]
            f = frame_of[int(reorganize_idx[det])]
            out[p, f] = src[det]
            valid[p, f] = True
        return out

    j3d = np.asarray(outputs["j3d"])
    pj2d = np.asarray(outputs["pj2d_org"])
    return {
        "smpl_thetas": gather("smpl_thetas", (72,)),
        "smpl_betas": gather("smpl_betas", (np.asarray(outputs["smpl_betas"]).shape[-1],)),
        "cam_trans": gather("cam_trans", (3,)),
        "joints": gather("j3d", j3d.shape[1:]),
        "pj2d_org": gather("pj2d_org", pj2d.shape[1:]),
        "valid": valid,  # (P, F) frames where the track was actually detected
    }


def load_trace_results(path: str) -> dict:
    """Load either the raw TRACE npz (key 'outputs') or the reformatted npz
    (key 'results', as written by the reference's aitcamera.py)."""
    data = np.load(path, allow_pickle=True)
    if "results" in data.files:
        return dict(data["results"][()])
    if "outputs" in data.files:
        return reformat_trace_output(dict(data["outputs"][()]))
    return {k: data[k] for k in data.files}


def _keypoints_from_pj2d(pj2d: np.ndarray, kp_format: str = "coco17") -> np.ndarray:
    """(P, F, J>=29, 2|3) TRACE projected joints -> (F, P, 17|25, 3)."""
    idx = TRACE_TO_COCO17 if kp_format == "coco17" else TRACE_TO_OPENPOSE25
    has = idx >= 0
    idx_safe = np.maximum(idx, 0)
    P, F = pj2d.shape[:2]
    kp = np.zeros((F, P, len(idx), 3), np.float32)
    xy = pj2d[..., :2]
    kp[..., :2] = np.moveaxis(xy[:, :, idx_safe], 0, 1)
    # TRACE reports no per-joint confidence in pj2d_org; treat projected
    # joints as reliable, except joints at the invalid (-2, -2)-ish sentinel
    valid = np.moveaxis(
        np.all(np.abs(xy[:, :, idx_safe]) < 1e5, axis=-1)
        & np.any(xy[:, :, idx_safe] != 0, axis=-1),
        0,
        1,
    )
    kp[..., 2] = valid.astype(np.float32) * has[None, None].astype(np.float32)
    kp[..., :2] *= has[None, None, :, None]
    return kp


def load_keypoint_npys(
    kp_dir: str,
    tracked_kp: np.ndarray,  # (F, P, 17, 3) fallback + matching anchors
    nms_center_px: float = 50.0,
    nms_kp_px: float = 30.0,
    gate_px: float = 200.0,
    sel: list[int] | None = None,  # raw frame numbers kept by start/end/skip
) -> np.ndarray:
    """Per-frame detection npys -> per-track keypoints.

    Each `<frame>.npy` holds (D, 17, 3) detections (ViTPose layout,
    vitpose_trace.py output), named by *raw* frame number. When `sel` is
    given (the start/skip subselection applied to `tracked_kp`), filenames
    are mapped through it so detections land on the right rows; files for
    frames outside the selection are skipped. NMS drops duplicates;
    Hungarian matching by confidence-weighted center assigns detections to
    tracked persons (vitpose_trace.py:206-269). Unmatched persons keep the
    fallback.
    """
    F, P = tracked_kp.shape[:2]
    out = tracked_kp.copy()
    row_of = {int(v): i for i, v in enumerate(sel)} if sel is not None else None
    files = sorted(glob.glob(os.path.join(kp_dir, "*.npy")))
    for path in files:
        f = int(os.path.splitext(os.path.basename(path))[0])
        if row_of is not None:
            if f not in row_of:
                continue
            f = row_of[f]
        if f >= F:
            continue
        dets = np.asarray(np.load(path), np.float32)
        if dets.ndim == 2:
            dets = dets[None]
        kept = skeleton_nms(
            list(dets), center_thresh=nms_center_px, kp_thresh=nms_kp_px
        )
        centers = np.stack([_kp_center(tracked_kp[f, p]) for p in range(P)])
        assign = match_detections_to_tracks(kept, centers, gate_px=gate_px)
        for track_idx, det_idx in enumerate(assign):
            if det_idx is not None:
                out[f, track_idx] = kept[det_idx]
    return out


def vitpose_keypoints(
    images: list[np.ndarray],
    tracked_kp: np.ndarray,  # (F, P, 17, 3) TRACE-projected anchors
    checkpoint: str | None = None,
    detector=None,
    box_pad: float = 0.2,
) -> np.ndarray:
    """Run ViTPose over all frames with TRACE-derived bbox prompts
    (vitpose_trace.py:137-299): per frame, each track's projected joints give
    a padded COCO box; detections are NMS'd and Hungarian-matched back to the
    tracks. Unmatched tracks keep the projected-joint fallback."""
    from .vitpose import VitPoseDetector, detect_and_track

    if detector is None:
        detector = VitPoseDetector(checkpoint=checkpoint)
    F, P = tracked_kp.shape[:2]
    out = tracked_kp.copy()
    for f, img in enumerate(images):
        boxes = []
        for p in range(P):
            kp = tracked_kp[f, p]
            ok = kp[:, 2] > 0
            if not ok.any():
                continue
            x0, y0 = kp[ok, :2].min(0)
            x1, y1 = kp[ok, :2].max(0)
            w, h = x1 - x0, y1 - y0
            boxes.append(
                [x0 - box_pad * w, y0 - box_pad * h,
                 w * (1 + 2 * box_pad), h * (1 + 2 * box_pad)]
            )
        if not boxes:
            continue
        centers = np.stack([_kp_center(tracked_kp[f, p]) for p in range(P)])
        kp_f = detect_and_track(detector, img, np.asarray(boxes, np.float32), centers)
        for p in range(P):
            if kp_f[p, :, 2].any():
                out[f, p] = kp_f[p]
    return out


def trace_inputs_from_files(
    trace_npz: str,
    frames_dir: str,
    K: np.ndarray | None = None,
    genders: list[str] | None = None,
    keypoints_dir: str | None = None,
    start: int = 0,
    end: int | None = None,
    skip: int = 1,
    kp_format: str = "coco17",  # "coco17" (ViTPose) or "openpose25"
    vitpose_checkpoint: str | None = None,
) -> TraceInputs:
    """Assemble TraceInputs from a TRACE npz + extracted frames (+ optional
    ViTPose/OpenPose keypoint npys)."""
    results = load_trace_results(trace_npz)
    thetas = np.asarray(results["smpl_thetas"], np.float32)  # (P, F, 72)
    betas_pf = np.asarray(results["smpl_betas"], np.float32)[..., :10]
    cam_trans = np.asarray(results["cam_trans"], np.float32)
    P, F_trace = thetas.shape[:2]

    frame_files = sorted(
        glob.glob(os.path.join(frames_dir, "*.png"))
        + glob.glob(os.path.join(frames_dir, "*.jpg"))
    )
    end = min(end if end is not None else F_trace, F_trace, len(frame_files))
    sel = list(range(start, end, skip))
    images = [
        cv2.imread(frame_files[f], cv2.IMREAD_COLOR)[:, :, ::-1] for f in sel
    ]

    if K is None:
        H, W = images[0].shape[:2]
        focal = float(max(H, W))  # reference preprocessing default (:112-115)
        K = np.array(
            [[focal, 0.0, W // 2], [0.0, focal, H // 2], [0.0, 0.0, 1.0]],
            np.float32,
        )

    kp = _keypoints_from_pj2d(results["pj2d_org"], kp_format)[sel]
    if keypoints_dir is not None:
        kp = load_keypoint_npys(keypoints_dir, kp, sel=sel)
    elif vitpose_checkpoint is not None:
        if kp_format != "coco17":
            raise ValueError("ViTPose inference emits COCO-17 keypoints")
        kp = vitpose_keypoints(images, kp, checkpoint=vitpose_checkpoint)

    # per-person mean shape over frames the track was actually detected in
    # (zero-filled rows for undetected frames would bias partial tracks)
    if "valid" in results:
        v = np.asarray(results["valid"], bool)[..., None]  # (P, F, 1)
        denom = np.maximum(v.sum(axis=1), 1)
        betas_mean = (betas_pf * v).sum(axis=1) / denom
    else:
        betas_mean = betas_pf.mean(axis=1)

    return TraceInputs(
        images=images,
        poses=np.moveaxis(thetas, 0, 1)[sel],
        betas=betas_mean,
        trans=np.moveaxis(cam_trans, 0, 1)[sel],
        keypoints_2d=kp,
        genders=list(genders) if genders is not None else ["neutral"] * P,
        K=np.asarray(K, np.float32),
    )
