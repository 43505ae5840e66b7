"""Triangle-mesh geometry ops in pure JAX: point-triangle distance,
generalized winding number sign tests, signed-distance grids, and
differentiable ray-mesh intersection.

TPU-native replacements for the reference's CUDA deps:
  * kaolin.metrics.trianglemesh.point_to_mesh_distance +
    kaolin.ops.mesh.check_sign (reference multiply.py:153-167,
    multiply_model.py:521-551) -> `signed_distance` / baked `sdf_grid` +
    trilinear `grid_query` (the in/off-surface tests query a per-person
    canonical SDF grid baked once at setup instead of exact per-step mesh
    tests — O(1) per sample on the VPU).
  * pytorch3d rasterizer depth maps for sparse pixels
    (multiply_model.py:578-736) -> `ray_mesh_intersect` (Moller-Trumbore,
    soft-min depth, differentiable w.r.t. vertices).

Everything is chunked so the (points x faces) intermediates stay bounded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_triangle_distance_sq(
    p: jnp.ndarray,  # (3,)
    tri: jnp.ndarray,  # (3, 3) vertices a,b,c
) -> jnp.ndarray:
    """Exact squared distance from a point to a triangle (Ericson RTCD 5.1.5)."""
    a, b, c = tri[0], tri[1], tri[2]
    ab, ac, ap = b - a, c - a, p - a
    d1, d2 = jnp.dot(ab, ap), jnp.dot(ac, ap)
    bp = p - b
    d3, d4 = jnp.dot(ab, bp), jnp.dot(ac, bp)
    cp = p - c
    d5, d6 = jnp.dot(ab, cp), jnp.dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    w_bc = jnp.clip(
        (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0
    )
    v_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    w_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)

    denom_in = jnp.maximum(va + vb + vc, 1e-30)
    q_interior = a + (vb / denom_in) * ab + (vc / denom_in) * ac
    q_ab = a + v_ab * ab
    q_ac = a + w_ac * ac
    q_bc = b + w_bc * (c - b)

    # Region select applied in reverse of the RTCD early-return order
    # (A, B, AB, C, AC, BC, interior) so earlier checks take priority.
    q = q_interior
    q = jnp.where((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0), q_bc, q)
    q = jnp.where((vb <= 0) & (d2 >= 0) & (d6 <= 0), q_ac, q)
    q = jnp.where((d6 >= 0) & (d5 <= d6), c, q)
    q = jnp.where((vc <= 0) & (d1 >= 0) & (d3 <= 0), q_ab, q)
    q = jnp.where((d3 >= 0) & (d4 <= d3), b, q)
    q = jnp.where((d1 <= 0) & (d2 <= 0), a, q)
    d = p - q
    return jnp.dot(d, d)


def _solid_angle(p: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Signed solid angle subtended by a triangle at p (van Oosterom-Strackee)."""
    a = tri[0] - p
    b = tri[1] - p
    c = tri[2] - p
    la, lb, lc = (
        jnp.linalg.norm(a),
        jnp.linalg.norm(b),
        jnp.linalg.norm(c),
    )
    num = jnp.dot(a, jnp.cross(b, c))
    den = (
        la * lb * lc
        + jnp.dot(a, b) * lc
        + jnp.dot(b, c) * la
        + jnp.dot(c, a) * lb
    )
    return 2.0 * jnp.arctan2(num, den)


def signed_distance(
    points: jnp.ndarray,  # (N, 3)
    verts: jnp.ndarray,  # (V, 3)
    faces: jnp.ndarray,  # (F, 3) int
    chunk_size: int = 512,
    face_chunk: int = 8192,
) -> jnp.ndarray:
    """Exact signed distance to a closed mesh; negative inside.

    Sign from the generalized winding number (robust for closed meshes,
    matching kaolin check_sign semantics). O(N*F), tiled over BOTH points and
    faces with a running (min-d2, winding-sum) carry so peak memory is
    chunk_size x face_chunk regardless of mesh size (a 200k-face learned mesh
    once requested 56 GB of HBM through a single fused vmap).
    """
    F = faces.shape[0]
    f_pad = (-F) % face_chunk
    # pad with degenerate far-away faces: zero solid angle, huge distance
    tris = verts[faces]  # (F, 3, 3)
    tris = jnp.concatenate(
        [tris, jnp.full((f_pad, 3, 3), 1e9, tris.dtype)], axis=0
    ).reshape(-1, face_chunk, 3, 3)

    def point_chunk_fn(pc):  # (C, 3)
        @jax.checkpoint
        def face_scan(carry, tri_tile):  # tri_tile: (face_chunk, 3, 3)
            min_d2, wind = carry
            d2 = jax.vmap(
                lambda p: jax.vmap(lambda t: point_triangle_distance_sq(p, t))(tri_tile)
            )(pc)  # (C, face_chunk)
            sa = jax.vmap(
                lambda p: jax.vmap(lambda t: _solid_angle(p, t))(tri_tile)
            )(pc)
            return (
                jnp.minimum(min_d2, jnp.min(d2, axis=-1)),
                wind + jnp.sum(sa, axis=-1),
            ), None

        init = (jnp.full((pc.shape[0],), jnp.inf), jnp.zeros((pc.shape[0],)))
        (min_d2, wind), _ = jax.lax.scan(face_scan, init, tris)
        inside = wind / (4.0 * jnp.pi) > 0.5
        return jnp.where(inside, -1.0, 1.0) * jnp.sqrt(min_d2)

    n = points.shape[0]
    pad = (-n) % chunk_size
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    out = jax.lax.map(point_chunk_fn, pts.reshape(-1, chunk_size, 3))
    return out.reshape(-1)[:n]


def sdf_grid(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    res: int = 64,
    padding: float = 0.2,
    chunk_size: int = 2048,
) -> dict:
    """Bake a signed-distance voxel grid around a mesh.

    Returns {"grid": (res,res,res), "origin": (3,), "spacing": (3,)}.
    """
    lo = jnp.min(verts, axis=0) - padding
    hi = jnp.max(verts, axis=0) + padding
    axes = [jnp.linspace(lo[i], hi[i], res) for i in range(3)]
    grid_pts = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    vals = signed_distance(grid_pts, verts, faces, chunk_size=chunk_size)
    spacing = (hi - lo) / (res - 1)
    return {"grid": vals.reshape(res, res, res), "origin": lo, "spacing": spacing}


def grid_query(grid: dict, points: jnp.ndarray) -> jnp.ndarray:
    """Trilinear SDF lookup, (N,3) -> (N,). Out-of-grid points clamp to the
    border (border values are >= padding > 0, i.e. safely 'outside')."""
    g = grid["grid"]
    res = g.shape[0]
    x = (points - grid["origin"]) / grid["spacing"]
    x = jnp.clip(x, 0.0, res - 1 - 1e-6)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0
    i1 = jnp.minimum(i0 + 1, res - 1)

    def gat(ix, iy, iz):
        return g[ix, iy, iz]

    c000 = gat(i0[:, 0], i0[:, 1], i0[:, 2])
    c001 = gat(i0[:, 0], i0[:, 1], i1[:, 2])
    c010 = gat(i0[:, 0], i1[:, 1], i0[:, 2])
    c011 = gat(i0[:, 0], i1[:, 1], i1[:, 2])
    c100 = gat(i1[:, 0], i0[:, 1], i0[:, 2])
    c101 = gat(i1[:, 0], i0[:, 1], i1[:, 2])
    c110 = gat(i1[:, 0], i1[:, 1], i0[:, 2])
    c111 = gat(i1[:, 0], i1[:, 1], i1[:, 2])

    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def ray_mesh_intersect(
    ray_o: jnp.ndarray,  # (R, 3)
    ray_d: jnp.ndarray,  # (R, 3)
    verts: jnp.ndarray,  # (V, 3)
    faces: jnp.ndarray,  # (F, 3)
    soft_tau: float = 0.0,
    chunk_size: int = 256,
    face_chunk: int = 8192,
) -> dict:
    """Differentiable front-hit depth per ray (Moller-Trumbore).

    Returns {"t": (R,) depth (1e10 if miss), "hit": (R,) bool,
    "t_soft": softmin-blended depth when soft_tau > 0}.
    Gradients flow to `verts`. Tiled over rays AND faces with running
    (min, streaming-logsumexp) carries so peak memory stays
    chunk_size x face_chunk for arbitrarily large learned meshes.
    """
    BIG = 1e10  # finite miss sentinel (inf poisons reverse-mode through where)
    NEG = -1e30

    F = faces.shape[0]
    f_pad = (-F) % face_chunk
    tris = verts[faces]
    tris = jnp.concatenate(
        [tris, jnp.full((f_pad, 3, 3), 1e9, tris.dtype)], axis=0
    ).reshape(-1, face_chunk, 3, 3)

    def ray_chunk_fn(oc, dc):  # (C, 3) each
        C = oc.shape[0]

        @jax.checkpoint
        def face_scan(carry, tri_tile):
            t_min, m, s, ts = carry
            v0 = tri_tile[None, :, 0]  # (1, T, 3)
            e1 = tri_tile[None, :, 1] - v0
            e2 = tri_tile[None, :, 2] - v0
            pvec = jnp.cross(dc[:, None, :], e2)
            det = jnp.sum(e1 * pvec, axis=-1)  # (C, T)
            nondeg = jnp.abs(det) > 1e-9
            inv_det = jnp.where(nondeg, 1.0 / jnp.where(nondeg, det, 1.0), 0.0)
            tvec = oc[:, None, :] - v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(dc[:, None, :] * qvec, axis=-1) * inv_det
            t = jnp.sum(e2 * qvec, axis=-1) * inv_det
            valid = nondeg & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
            t_masked = jnp.where(valid, t, BIG)
            t_min = jnp.minimum(t_min, jnp.min(t_masked, axis=-1))
            if soft_tau > 0:
                # streaming logsumexp for the softmin blend
                logit = jnp.where(valid, -t / soft_tau, NEG)
                tile_m = jnp.max(logit, axis=-1)
                new_m = jnp.maximum(m, tile_m)
                scale = jnp.exp(m - new_m)
                e = jnp.exp(logit - new_m[:, None])
                s_new = s * scale + jnp.sum(e, axis=-1)
                ts_new = ts * scale + jnp.sum(e * jnp.where(valid, t, 0.0), axis=-1)
                return (t_min, new_m, s_new, ts_new), None
            return (t_min, m, s, ts), None

        init = (
            jnp.full((C,), BIG),
            jnp.full((C,), NEG),
            jnp.zeros((C,)),
            jnp.zeros((C,)),
        )
        (t_min, m, s, ts), _ = jax.lax.scan(face_scan, init, tris)
        hit = t_min < BIG * 0.5
        if soft_tau > 0:
            t_soft = jnp.where(hit & (s > 0), ts / jnp.maximum(s, 1e-30), 0.0)
        else:
            t_soft = jnp.where(hit, t_min, 0.0)
        return t_min, hit, t_soft

    n = ray_o.shape[0]
    pad = (-n) % chunk_size
    o = jnp.pad(ray_o, ((0, pad), (0, 0))).reshape(-1, chunk_size, 3)
    d = jnp.pad(ray_d, ((0, pad), (0, 0))).reshape(-1, chunk_size, 3)
    t, hit, t_soft = jax.lax.map(lambda od: ray_chunk_fn(od[0], od[1]), (o, d))
    return {
        "t": t.reshape(-1)[:n],
        "hit": hit.reshape(-1)[:n],
        "t_soft": t_soft.reshape(-1)[:n],
    }


def ray_aabb_range(
    ray_o: jnp.ndarray,  # (R,3)
    ray_d: jnp.ndarray,  # (R,3)
    lo: jnp.ndarray,  # (3,)
    hi: jnp.ndarray,  # (3,)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab test: (t_near (R,), t_far (R,), hit (R,)). Replaces the
    reference's host-side trimesh OBB intersector (multiply.py:208-214) with
    an in-graph test; the entry/exit distances also drive per-person
    ray-range clipping."""
    inv = 1.0 / jnp.where(jnp.abs(ray_d) < 1e-9, 1e-9, ray_d)
    t0 = (lo[None, :] - ray_o) * inv
    t1 = (hi[None, :] - ray_o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    hit = tmax >= tmin
    return tmin, tmax, hit


def ray_aabb_hit(ray_o, ray_d, lo, hi) -> jnp.ndarray:
    """Boolean form of ray_aabb_range."""
    return ray_aabb_range(ray_o, ray_d, lo, hi)[2]
