"""Inter-person pose losses: depth ordering, interpenetration, silhouette.

Parity target: code/multiply_model.py:521-736 (get_depth_order_loss,
get_interpenetration_loss). TPU-first redesign:

  * The reference rasterizes full-image per-person depth maps with PyTorch3D
    and filters pixels afterwards. Here the loss is evaluated at a **sparse
    pixel subset** via differentiable ray-mesh intersection
    (ops/mesh_ops.ray_mesh_intersect, Moller-Trumbore): same softplus ranking
    log(1+exp(d_gt - d_front)) on SAM-disagreement pixels, scaled by
    n_valid/n_sampled so magnitudes match the reference's full-image sum.
  * kaolin check_sign becomes a generalized-winding-number inside test; the
    KNN pull-to-surface MSE is unchanged.

Everything is a pure function of the deformed vertex arrays, so gradients
flow through the deformer/LBS into the per-frame SMPL pose/translation
parameters being optimized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.knn import knn
from ..ops.mesh_ops import ray_mesh_intersect


def winding_inside(
    points: jnp.ndarray,  # (N, 3)
    verts: jnp.ndarray,  # (V, 3)
    faces: jnp.ndarray,  # (F, 3)
    chunk_size: int = 512,
    face_chunk: int = 8192,
) -> jnp.ndarray:
    """Generalized winding number > 0.5 inside test (kaolin check_sign
    equivalent, robust for closed meshes). Tiled over points AND faces with a
    running winding-sum carry so peak memory stays chunk x face_chunk
    (100k+-face learned meshes OOM a single fused vmap)."""
    F = faces.shape[0]
    f_pad = (-F) % face_chunk
    tris = verts[faces]
    # padding tris far away contribute ~0 solid angle
    tris = jnp.concatenate(
        [tris, jnp.full((f_pad, 3, 3), 1e9, tris.dtype)], axis=0
    ).reshape(-1, face_chunk, 3, 3)

    def point_chunk_fn(pc):  # (C, 3)
        @jax.checkpoint
        def face_scan(wind, tri_tile):
            a = tri_tile[None, :, 0] - pc[:, None]  # (C, T, 3)
            b = tri_tile[None, :, 1] - pc[:, None]
            c = tri_tile[None, :, 2] - pc[:, None]
            la = jnp.linalg.norm(a, axis=-1)
            lb = jnp.linalg.norm(b, axis=-1)
            lc = jnp.linalg.norm(c, axis=-1)
            num = jnp.sum(a * jnp.cross(b, c), axis=-1)
            den = (
                la * lb * lc
                + jnp.sum(a * b, axis=-1) * lc
                + jnp.sum(b * c, axis=-1) * la
                + jnp.sum(c * a, axis=-1) * lb
            )
            return wind + jnp.sum(2.0 * jnp.arctan2(num, den), axis=-1), None

        wind, _ = jax.lax.scan(face_scan, jnp.zeros((pc.shape[0],)), tris)
        return wind / (4.0 * jnp.pi) > 0.5

    n = points.shape[0]
    pad = (-n) % chunk_size
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    out = jax.lax.map(point_chunk_fn, pts.reshape(-1, chunk_size, 3))
    return out.reshape(-1)[:n]


def interpenetration_loss(
    verts_list: list[jnp.ndarray],  # per person deformed mesh verts (V_p, 3)
    faces_list: list[jnp.ndarray],
    key: jax.Array,
    num_samples: int = 5120,
    sample_idx: list[jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Push sampled points of each mesh out of every partner mesh
    (multiply_model.py:521-551): inside-partner points get an MSE pull to
    their nearest partner vertex (outlier-gated at 0.1m).

    `sample_idx` (per person) pins the sampled vertex indices — used by the
    process-parity tests to match the reference's randperm draw exactly."""
    loss = jnp.zeros(())
    P = len(verts_list)
    for pid in range(P):
        v = verts_list[pid]
        if sample_idx is not None:
            idx = sample_idx[pid]
        else:
            k = jax.random.fold_in(key, pid)
            idx = jax.random.randint(
                k, (min(num_samples, v.shape[0]),), 0, v.shape[0]
            )
        sample = v[idx]
        for partner in range(P):
            if partner == pid:
                continue
            inside = winding_inside(sample, verts_list[partner], faces_list[partner])
            d2, nn_idx = knn(sample, verts_list[partner], k=1)
            neighbor = verts_list[partner][nn_idx[:, 0]]
            stable = jnp.linalg.norm(sample - neighbor, axis=-1) < 0.1
            mask = inside & stable
            sq = jnp.sum((sample - neighbor) ** 2, axis=-1)
            loss = loss + jnp.sum(jnp.where(mask, sq, 0.0))
    return loss


def sparse_depth_order_loss(
    ray_o: jnp.ndarray,  # (M, 3) rays at sampled pixels
    ray_d: jnp.ndarray,  # (M, 3)
    verts_list: list[jnp.ndarray],
    faces_list: list[jnp.ndarray],
    sam_probs: jnp.ndarray,  # (M, P) sigmoid SAM probabilities at those pixels
    scale_to_full: float = 1.0,  # n_valid_pixels / n_sampled
    soft_tau: float = 0.01,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-order ranking at sampled pixels (multiply_model.py:578-736).

    For each pixel: front person = argmin ray-mesh depth; gt person = argmax
    SAM probability. Where they disagree (and SAM is confident), penalize
    log(1 + exp(d_gt - d_front)). Returns (loss, valid_fraction).
    """
    M, P = sam_probs.shape
    ts, ts_soft, hits = [], [], []
    for v, f in zip(verts_list, faces_list):
        out = ray_mesh_intersect(ray_o, ray_d, v, f, soft_tau=soft_tau)
        ts.append(jnp.where(out["hit"], out["t"], 999.0))
        ts_soft.append(jnp.where(out["hit"], out["t_soft"], 999.0))
        hits.append(out["hit"])
    depth = jnp.stack(ts, axis=-1)  # (M, P) hard depth for masking/argmin
    depth_soft = jnp.stack(ts_soft, axis=-1)  # differentiable depth

    front = jnp.min(depth, axis=-1)
    any_hit = front < 999.0

    sam_sum = jnp.sum(sam_probs, axis=-1)
    confident = (sam_sum <= 1.0 + 1e-2) & (sam_sum >= 0.7)
    gt_idx = jnp.argmax(sam_probs, axis=-1)
    gt_depth = jnp.take_along_axis(depth, gt_idx[:, None], axis=-1)[:, 0]
    gt_depth_soft = jnp.take_along_axis(depth_soft, gt_idx[:, None], axis=-1)[:, 0]
    gt_hit = gt_depth < 999.0

    front_soft = jnp.min(depth_soft, axis=-1)
    disagree = gt_depth != front
    valid = any_hit & confident & gt_hit & disagree

    per_pixel = jnp.log1p(jnp.exp(jnp.clip(gt_depth_soft - front_soft, -30.0, 30.0)))
    loss = jnp.sum(jnp.where(valid, per_pixel, 0.0)) * scale_to_full
    return loss, jnp.mean(valid.astype(jnp.float32))


PERSON_COLORS = jnp.asarray(
    [
        [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
        [0.49, 0.49, 0.0], [0.0, 0.49, 0.49], [0.49, 0.0, 0.49],
        [0.25, 0.0, 0.0], [0.0, 0.25, 0.0], [0.0, 0.0, 0.25],
        [0.125, 0.125, 0.0], [0.0, 0.125, 0.125], [0.125, 0.0, 0.125],
    ]
)


def sparse_silhouette_loss(
    ray_o: jnp.ndarray,  # (M, 3)
    ray_d: jnp.ndarray,  # (M, 3)
    verts_list: list[jnp.ndarray],
    faces_list: list[jnp.ndarray],
    sam_probs: jnp.ndarray,  # (M, P)
    soft_tau: float = 0.02,
) -> jnp.ndarray:
    """Soft instance-color render vs SAM-argmax color at sampled pixels
    (multiply_model.py:637-686, PyTorch3D soft blending -> per-pixel softmin
    over person depths). L2, differentiable to the deformed vertices."""
    M, P = sam_probs.shape
    depths, hits = [], []
    for v, f in zip(verts_list, faces_list):
        out = ray_mesh_intersect(ray_o, ray_d, v, f, soft_tau=soft_tau)
        depths.append(jnp.where(out["hit"], out["t_soft"], 1e3))
        hits.append(out["hit"])
    depth = jnp.stack(depths, axis=-1)  # (M, P)
    hit = jnp.stack(hits, axis=-1)

    # soft blend over persons; a virtual background 'person' at large depth
    logits = jnp.concatenate(
        [-depth / soft_tau, jnp.full((M, 1), -1e3 / soft_tau)], axis=-1
    )
    logits = jnp.where(
        jnp.concatenate([hit, jnp.ones((M, 1), bool)], -1), logits, -jnp.inf
    )
    w = jax.nn.softmax(logits, axis=-1)  # (M, P+1)
    colors = jnp.concatenate([PERSON_COLORS[:P], jnp.zeros((1, 3))], axis=0)
    rendered = w @ colors  # (M, 3)

    bg_prob = 1.0 - jnp.sum(sam_probs, axis=-1, keepdims=True)
    gt_idx = jnp.argmax(jnp.concatenate([sam_probs, bg_prob], -1), axis=-1)
    gt = colors[gt_idx]
    return jnp.mean((rendered - gt) ** 2)


def depth_loss_schedule(weight: float, epoch, milestone: int = 1000):
    epoch = jnp.asarray(epoch, jnp.float32)
    return weight * (1.0 - jnp.minimum(float(milestone), epoch) / milestone)
