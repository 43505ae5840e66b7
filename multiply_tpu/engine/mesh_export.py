"""Canonical-mesh extraction: MISE octree (C++) driving batched TPU SDF evals,
marching tetrahedra, largest-component filtering, PLY export.

Parity target: code/lib/utils/mesh.py:78-132 (generate_mesh) — bbox from the
canonical SMPL verts x1.1, octree refinement with batched SDF queries,
marching cubes, keep the largest connected component. res_up=2 in-training
(128^3 effective) and 4 at test time (512^3), mirroring multiply_model.py
usage.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def generate_mesh(
    sdf_fn: Callable[[np.ndarray], np.ndarray],  # (N,3) -> (N,) canonical SDF
    verts_hint: np.ndarray,  # (V,3) canonical SMPL verts: defines the bbox
    point_batch: int = 10_000,
    res_init: int = 32,
    res_up: int = 2,
    level: float = 0.0,
    largest_component: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (verts (V,3) world coords, faces (F,3))."""
    from ..native import MISE, marching_tetrahedra

    verts_hint = np.asarray(verts_hint)
    gt_center = 0.5 * (verts_hint.max(0) + verts_hint.min(0))
    gt_scale = 1.1 * (verts_hint.max(0) - verts_hint.min(0)).max()

    mise = MISE(res_init, res_up, level)
    R = mise.resolution
    while True:
        pts_int = mise.query()
        if len(pts_int) == 0:
            break
        # grid -> world: centered cube of side gt_scale
        pts = (pts_int.astype(np.float32) / R - 0.5) * gt_scale + gt_center
        # pad every chunk to point_batch so the jitted SDF sees one shape
        n = len(pts)
        pad = (-n) % point_batch
        pts = np.pad(pts, ((0, pad), (0, 0)))
        vals = [
            np.asarray(sdf_fn(pts[s : s + point_batch]))
            for s in range(0, len(pts), point_batch)
        ]
        mise.update(np.concatenate(vals)[:n] if vals else np.zeros(0, np.float32))

    grid = mise.to_dense()
    verts, faces = marching_tetrahedra(grid, level)
    if len(verts) == 0:
        return verts, faces
    verts = (verts / R - 0.5) * gt_scale + gt_center

    if largest_component and len(faces):
        verts, faces = keep_largest_component(verts, faces)
    return verts, faces


def keep_largest_component(
    verts: np.ndarray, faces: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Union-find over face connectivity; keeps the biggest island
    (mesh.py:124-130 trimesh split equivalent)."""
    parent = np.arange(len(verts))

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for f in faces:
        r0, r1, r2 = find(f[0]), find(f[1]), find(f[2])
        parent[r1] = r0
        parent[r2] = find(r1)

    roots = np.asarray([find(i) for i in range(len(verts))])
    face_roots = roots[faces[:, 0]]
    unique, counts = np.unique(face_roots, return_counts=True)
    keep_root = unique[np.argmax(counts)]
    keep_faces = faces[face_roots == keep_root]

    used = np.unique(keep_faces)
    remap = -np.ones(len(verts), np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[keep_faces]


def save_ply(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Minimal binary-less PLY writer (replaces trimesh export)."""
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def load_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    verts, faces = [], []
    with open(path) as f:
        n_v = n_f = 0
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element face"):
                n_f = int(line.split()[-1])
            elif line == "end_header":
                break
        for _ in range(n_v):
            verts.append([float(x) for x in next(f).split()[:3]])
        for _ in range(n_f):
            faces.append([int(x) for x in next(f).split()[1:4]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int64)
