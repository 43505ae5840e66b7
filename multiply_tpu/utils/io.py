"""Small host-IO helpers.

The epoch-end stages (instance masks, SAM refinement) may run in a background
thread overlapped with training while the data producer polls their output
files (synthetic_sequence._refresh_sam); plain np.save leaves a torn-read
window where a half-written .npy can be loaded. Write-to-temp + os.replace
makes the publish atomic on POSIX.
"""

from __future__ import annotations

import os

import numpy as np


def atomic_np_save(path: str, arr: np.ndarray) -> None:
    """np.save that readers can never observe half-written."""
    tmp = f"{path}.tmp{os.getpid()}.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)
