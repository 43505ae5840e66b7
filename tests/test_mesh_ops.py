"""Mesh geometry op tests: point-triangle distance, signed distance,
SDF grids, ray-mesh intersection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiply_tpu.ops.mesh_ops import (
    grid_query,
    point_triangle_distance_sq,
    ray_aabb_hit,
    ray_mesh_intersect,
    sdf_grid,
    signed_distance,
)


def icosphere(subdiv=1):
    """Unit icosahedron sphere (closed mesh) without external deps."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int32,
    )
    for _ in range(subdiv):
        mid = {}
        new_faces = []
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2
                m /= np.linalg.norm(m)
                verts.append(m)
                mid[key] = len(verts) - 1
            return mid[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces, np.int32)
        verts = np.asarray(verts)
    return np.asarray(verts, np.float32), faces


def brute_point_tri_dist(p, tri, n=60):
    """Dense barycentric sampling reference."""
    u = np.linspace(0, 1, n)
    uu, vv = np.meshgrid(u, u)
    mask = uu + vv <= 1
    uu, vv = uu[mask], vv[mask]
    pts = (
        tri[0][None] * (1 - uu - vv)[:, None]
        + tri[1][None] * uu[:, None]
        + tri[2][None] * vv[:, None]
    )
    return np.min(np.linalg.norm(pts - p[None], axis=-1))


def test_point_triangle_distance_vs_brute():
    rng = np.random.default_rng(0)
    for _ in range(20):
        tri = rng.standard_normal((3, 3)).astype(np.float32)
        p = rng.standard_normal(3).astype(np.float32) * 2
        d = float(jnp.sqrt(point_triangle_distance_sq(jnp.asarray(p), jnp.asarray(tri))))
        d_ref = brute_point_tri_dist(p, tri)
        assert abs(d - d_ref) < 0.05, (d, d_ref)


def test_signed_distance_sphere():
    verts, faces = icosphere(2)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1.5, 1.5, (64, 3)).astype(np.float32)
    sd = np.asarray(
        signed_distance(jnp.asarray(pts), jnp.asarray(verts), jnp.asarray(faces))
    )
    r = np.linalg.norm(pts, axis=-1)
    expected = r - 1.0
    # icosphere(2) under-approximates the sphere slightly; loose tolerance
    np.testing.assert_allclose(sd, expected, atol=0.05)
    # sign correctness is exact away from the surface
    away = np.abs(expected) > 0.05
    assert np.all(np.sign(sd[away]) == np.sign(expected[away]))


def test_sdf_grid_query_matches_direct():
    verts, faces = icosphere(1)
    grid = sdf_grid(jnp.asarray(verts), jnp.asarray(faces), res=24, padding=0.3)
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1.0, 1.0, (32, 3)).astype(np.float32)
    approx = np.asarray(grid_query(grid, jnp.asarray(pts)))
    exact = np.asarray(
        signed_distance(jnp.asarray(pts), jnp.asarray(verts), jnp.asarray(faces))
    )
    np.testing.assert_allclose(approx, exact, atol=0.08)


def test_grid_query_out_of_bounds_positive():
    verts, faces = icosphere(0)
    grid = sdf_grid(jnp.asarray(verts), jnp.asarray(faces), res=16, padding=0.2)
    far_pts = jnp.asarray([[5.0, 5.0, 5.0], [-9.0, 0.0, 0.0]])
    vals = np.asarray(grid_query(grid, far_pts))
    assert np.all(vals > 0)


def test_ray_mesh_intersect_sphere():
    verts, faces = icosphere(2)
    n = 8
    o = np.tile([0.0, 0.0, -3.0], (n, 1)).astype(np.float32)
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = 1.0
    # a couple of rays that miss
    d[-1] = [0, 1, 0]
    d[-2] = np.array([0.8, 0.0, 0.6]) / np.linalg.norm([0.8, 0.0, 0.6])
    out = ray_mesh_intersect(jnp.asarray(o), jnp.asarray(d), jnp.asarray(verts), jnp.asarray(faces))
    t = np.asarray(out["t"])
    hit = np.asarray(out["hit"])
    assert np.all(hit[:-2])
    assert not hit[-1] and not hit[-2]
    np.testing.assert_allclose(t[:-2], 2.0, atol=0.05)  # sphere at r=1, cam at z=-3


def test_ray_mesh_intersect_grads_flow_to_verts():
    verts, faces = icosphere(1)
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])

    def depth(v):
        return jnp.sum(ray_mesh_intersect(o, d, v, jnp.asarray(faces), soft_tau=0.01)["t_soft"])

    g = jax.grad(depth)(jnp.asarray(verts))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_ray_aabb_hit():
    o = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 0.0, -5.0], [3.0, 3.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    lo, hi = jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0])
    hit = np.asarray(ray_aabb_hit(o, d, lo, hi))
    assert hit.tolist() == [True, False, False]


def test_grid_trilinear_pallas_matches_gather():
    """The Pallas one-hot trilinear kernel (interpret mode) matches the XLA
    gather-based grid_query to bf16 tolerance, including border clamping."""
    from multiply_tpu.ops.grid_pallas import _grid_trilinear

    rng = np.random.default_rng(0)
    res = 16
    grid = {
        "grid": jnp.asarray(rng.standard_normal((res, res, res)), jnp.float32),
        "origin": jnp.asarray([-1.0, -1.2, -0.8]),
        "spacing": jnp.asarray([0.13, 0.15, 0.11]),
    }
    pts = rng.uniform(-1.6, 1.6, size=(700, 3)).astype(np.float32)
    ref = np.asarray(grid_query(grid, jnp.asarray(pts)))
    got = np.asarray(
        _grid_trilinear(
            grid["grid"], jnp.asarray(pts), grid["origin"], grid["spacing"], True
        )
    )
    assert got.shape == ref.shape
    # grid values are bf16 in the kernel: ~3 decimal digits
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)

    # zero tangent by design (consumers threshold the result)
    out, tang = jax.jvp(
        lambda g: _grid_trilinear(
            g, jnp.asarray(pts[:64]), grid["origin"], grid["spacing"], True
        ),
        (grid["grid"],),
        (jnp.ones_like(grid["grid"]),),
    )
    assert np.asarray(tang).max() == 0
