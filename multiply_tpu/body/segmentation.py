"""SMPL vertex-part segmentation: sampling weights for the surface loss.

Parity target: code/lib/model/multiply.py:112-113, 339-346 — the SMPL-surface
anchoring loss samples posed vertices EXCLUDING head / hands / feet parts,
read from the standard `smpl_vert_segmentation.json` (user-provided asset,
shipped with the reference's downloads).
"""

from __future__ import annotations

import json

import numpy as np

EXCLUDED_PARTS = (
    "head",
    "rightHand",
    "leftHand",
    "rightFoot",
    "leftFoot",
    "leftHandIndex1",
    "rightHandIndex1",
)


def surface_sample_logits(
    segmentation_path: str, num_verts: int = 6890
) -> np.ndarray:
    """Categorical-sampling logits: 0 for body verts, -inf for excluded parts."""
    with open(segmentation_path) as f:
        seg = json.load(f)
    logits = np.zeros(num_verts, np.float32)
    for part in EXCLUDED_PARTS:
        idx = np.asarray(seg.get(part, []), np.int64)
        logits[idx] = -1e9
    return logits
