"""ctypes bindings for the native C++ layer (MISE octree, marching
tetrahedra, z-buffer rasterizer), with on-demand build.

The TPU stays the compute engine: MISE hands batches of query points to a
jitted SDF; only the octree bookkeeping, triangulation, and bulk depth-map
rasterization run in C++ (reference equivalents: code/lib/libmise/mise.pyx,
skimage marching cubes in code/lib/utils/mesh.py:110, PyTorch3D rasterizer in
code/lib/model/render.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmultiply_native.so")
_BUILD_LOCK = threading.Lock()  # stage loops call from worker threads


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    with _BUILD_LOCK:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)

    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.mise_create.restype = ctypes.c_void_p
    lib.mise_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_float]
    lib.mise_destroy.argtypes = [ctypes.c_void_p]
    lib.mise_resolution.restype = ctypes.c_int
    lib.mise_resolution.argtypes = [ctypes.c_void_p]
    lib.mise_query.restype = ctypes.c_int64
    lib.mise_query.argtypes = [ctypes.c_void_p, i64p, ctypes.c_int64]
    lib.mise_update.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    lib.mise_num_active.restype = ctypes.c_int64
    lib.mise_num_active.argtypes = [ctypes.c_void_p]
    lib.mise_to_dense.argtypes = [ctypes.c_void_p, f32p]

    lib.march_run.restype = ctypes.c_void_p
    lib.march_run.argtypes = [f32p, ctypes.c_int64, ctypes.c_float]
    lib.march_num_verts.restype = ctypes.c_int64
    lib.march_num_verts.argtypes = [ctypes.c_void_p]
    lib.march_num_faces.restype = ctypes.c_int64
    lib.march_num_faces.argtypes = [ctypes.c_void_p]
    lib.march_get.argtypes = [ctypes.c_void_p, f32p, i64p]
    lib.march_destroy.argtypes = [ctypes.c_void_p]

    lib.rasterize_depth.argtypes = [
        f32p, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, f32p, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rasterize_mask.argtypes = [
        f32p, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class MISE:
    """Octree isosurface refinement: query() -> evaluate on TPU -> update()."""

    def __init__(self, resolution_0: int, depth: int, threshold: float):
        self._lib = _lib()
        self._h = self._lib.mise_create(resolution_0, depth, float(threshold))
        self.resolution = self._lib.mise_resolution(self._h)

    def query(self) -> np.ndarray:
        """Full-grid integer coords (N,3) of points needing evaluation."""
        n = self._lib.mise_query(self._h, None, 0)
        out = np.empty((n, 3), np.int64)
        if n:
            self._lib.mise_query(self._h, _ip(out), n)
        return out

    def update(self, values: np.ndarray) -> None:
        values = np.ascontiguousarray(values, np.float32)
        self._lib.mise_update(self._h, _fp(values), len(values))

    @property
    def num_active(self) -> int:
        return self._lib.mise_num_active(self._h)

    def to_dense(self) -> np.ndarray:
        n = self.resolution + 1
        out = np.empty((n, n, n), np.float32)
        self._lib.mise_to_dense(self._h, _fp(out))
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mise_destroy(self._h)
            self._h = None


def marching_tetrahedra(grid: np.ndarray, iso: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Triangulate the iso level of a cubic grid. Returns (verts (V,3) in grid
    coords, faces (F,3) int64)."""
    lib = _lib()
    grid = np.ascontiguousarray(grid, np.float32)
    assert grid.ndim == 3 and grid.shape[0] == grid.shape[1] == grid.shape[2]
    h = lib.march_run(_fp(grid), grid.shape[0], float(iso))
    nv, nf = lib.march_num_verts(h), lib.march_num_faces(h)
    verts = np.empty((nv, 3), np.float32)
    faces = np.empty((nf, 3), np.int64)
    lib.march_get(h, _fp(verts), _ip(faces))
    lib.march_destroy(h)
    return verts, faces


def rasterize_depth(
    verts_pix: np.ndarray,  # (V,3): x,y pixels, z camera depth
    faces: np.ndarray,  # (F,3)
    width: int,
    height: int,
    return_face_id: bool = False,
):
    lib = _lib()
    verts_pix = np.ascontiguousarray(verts_pix, np.float32)
    faces = np.ascontiguousarray(faces, np.int64)
    depth = np.empty((height, width), np.float32)
    fid = np.empty((height, width), np.int32) if return_face_id else None
    lib.rasterize_depth(
        _fp(verts_pix), len(verts_pix), _ip(faces), len(faces),
        width, height, _fp(depth),
        fid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if return_face_id else None,
    )
    return (depth, fid) if return_face_id else depth
