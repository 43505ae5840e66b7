"""Native layer tests: MISE octree, marching tetrahedra, rasterizer."""

import numpy as np
import pytest

from multiply_tpu.native import MISE, marching_tetrahedra, rasterize_depth


def run_mise_sphere(res0=8, depth=2):
    m = MISE(res0, depth, 0.0)
    R = m.resolution
    center, rad = R / 2, R / 3
    evals = 0
    while True:
        pts = m.query()
        if len(pts) == 0:
            break
        vals = np.linalg.norm(pts - center, axis=1).astype(np.float32) - rad
        evals += len(pts)
        m.update(vals)
    return m, center, rad, evals


def test_mise_refines_only_near_surface():
    m, center, rad, evals = run_mise_sphere()
    R = m.resolution
    dense_points = (R + 1) ** 3
    # octree should evaluate far fewer points than the dense grid
    assert evals < 0.55 * dense_points, (evals, dense_points)

    dense = m.to_dense()
    xs = np.arange(R + 1)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    exact = np.linalg.norm(g - center, axis=-1) - rad
    band = np.abs(exact) < 1.5
    # surface band values are exact-or-near (evaluated at finest level)
    assert np.abs(dense - exact)[band].max() < 0.25
    # sign is right everywhere (interpolated interiors keep corner signs)
    far = np.abs(exact) > 2.0
    assert np.all(np.sign(dense[far]) == np.sign(exact[far]))


def test_marching_tetrahedra_sphere():
    m, center, rad, _ = run_mise_sphere()
    verts, faces = marching_tetrahedra(m.to_dense(), 0.0)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts - center, axis=1)
    np.testing.assert_allclose(r, rad, atol=0.15)
    # watertight: every edge shared by exactly 2 faces
    edges = {}
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            k = (min(a, b), max(a, b))
            edges[k] = edges.get(k, 0) + 1
    counts = np.asarray(list(edges.values()))
    assert np.all(counts == 2), np.unique(counts)


def test_rasterize_depth_triangle():
    verts = np.array(
        [[10, 10, 2.0], [50, 10, 2.0], [30, 50, 4.0]], np.float32
    )
    faces = np.array([[0, 1, 2]], np.int64)
    depth, fid = rasterize_depth(verts, faces, 64, 64, return_face_id=True)
    assert np.isfinite(depth[12, 30])  # inside
    assert not np.isfinite(depth[5, 5])  # outside
    assert fid[12, 30] == 0 and fid[5, 5] == -1
    # depth interpolates between 2 and 4
    d = depth[np.isfinite(depth)]
    assert d.min() >= 2.0 - 1e-3 and d.max() <= 4.0 + 1e-3


def test_rasterize_depth_zbuffer_order():
    # two overlapping triangles, nearer one wins
    verts = np.array(
        [
            [10, 10, 5.0], [50, 10, 5.0], [30, 50, 5.0],  # far
            [10, 10, 1.0], [50, 10, 1.0], [30, 50, 1.0],  # near
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    depth, fid = rasterize_depth(verts, faces, 64, 64, return_face_id=True)
    assert abs(depth[12, 30] - 1.0) < 1e-4
    assert fid[12, 30] == 1
