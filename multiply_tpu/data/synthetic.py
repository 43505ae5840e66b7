"""Synthetic multi-person scene: ground-truth images/masks rendered by exact
ray-mesh intersection of posed synthetic bodies.

Serves the role of the reference's preprocessed demo sequences for tests and
CI: a fully self-contained scene (no SMPL pickles, no video preprocessing)
with the same data products the Hi4D loader emits — images, per-person masks,
poses, translations, shapes, cameras (reference data layout:
code/lib/datasets/Hi4D.py:89-162).
"""

from __future__ import annotations

from typing import NamedTuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..body.server import SMPLServer, canonical_pose_params, smpl_server_forward
from ..body.smpl import synthetic_body_model
from ..ops.mesh_ops import ray_mesh_intersect
from ..utils.cameras import get_camera_params, pixel_grid

PERSON_COLORS = np.array([[0.85, 0.3, 0.25], [0.25, 0.4, 0.85], [0.3, 0.8, 0.3]])
BG_COLOR = np.array([0.9, 0.9, 0.85])

# Bump on ANY change to _make_scene_impl, the synthetic body model, cameras,
# or SAM-logit generation: the disk cache key embeds it so stale pre-change
# scenes can never silently feed tests/benches/parity runs.
# v2: sub-pixel principal point (kills the exact through-origin center ray,
#     which is degenerate in the NeRF++ inverse-sphere parameterization —
#     reference multiply.py:698-726 has no guard and NaNs on it; real data
#     never produces such a ray).
SCENE_CACHE_VERSION = 2


class SyntheticScene(NamedTuple):
    images: np.ndarray  # (F, H, W, 3)
    masks: np.ndarray  # (F, H, W, P) boolean per-person visibility
    sam_logits: np.ndarray  # (F, H, W, P) +-8 logits derived from masks
    poses: np.ndarray  # (F, P, 72) smpl thetas
    transl: np.ndarray  # (F, P, 3)
    betas: np.ndarray  # (P, 10)
    scale: np.ndarray  # (P,)
    cam_pose: np.ndarray  # (F, 4, 4)
    intrinsics: np.ndarray  # (3, 3)
    servers: list  # per-person SMPLServer
    height: int
    width: int


def make_scene(
    num_frames: int = 4,
    num_persons: int = 2,
    height: int = 48,
    width: int = 64,
    seed: int = 0,
    model=None,
    cache_dir: str | None = "outputs/scene_cache",
) -> SyntheticScene:
    # GT generation (per-frame ray-mesh intersection) is minutes at
    # production resolution on one host core — cache the arrays on disk,
    # keyed by the generation parameters. Only the default body model is
    # cacheable (a custom `model` changes the geometry).
    cache = None
    if cache_dir is not None and model is None:
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(
            cache_dir,
            f"scene_v{SCENE_CACHE_VERSION}_f{num_frames}_p{num_persons}"
            f"_{height}x{width}_s{seed}.npz",
        )
        if os.path.exists(cache):
            try:
                with np.load(cache) as z:
                    betas = z["betas"]
                    servers = [
                        SMPLServer.create(synthetic_body_model(), betas=betas[i])
                        for i in range(num_persons)
                    ]
                    return SyntheticScene(
                        images=z["images"], masks=z["masks"],
                        sam_logits=z["sam_logits"], poses=z["poses"],
                        transl=z["transl"], betas=betas, scale=z["scale"],
                        cam_pose=z["cam_pose"], intrinsics=z["intrinsics"],
                        servers=servers, height=int(z["height"]),
                        width=int(z["width"]),
                    )
            except Exception:
                pass  # corrupt/stale cache: regenerate below

    # pin generation to the CPU backend so demo runs on TPU don't waste
    # minutes shipping eager ray-mesh ops through the accelerator
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            scene = _make_scene_impl(num_frames, num_persons, height, width, seed, model)
    except RuntimeError:  # no cpu backend registered (unusual)
        scene = _make_scene_impl(num_frames, num_persons, height, width, seed, model)

    if cache is not None:
        arrays = {
            k: getattr(scene, k)
            for k in scene._fields
            if k not in ("servers", "height", "width")
        }
        tmp = f"{cache}.tmp{os.getpid()}.npz"
        np.savez_compressed(tmp, height=scene.height, width=scene.width, **arrays)
        os.replace(tmp, cache)
    return scene


def _make_scene_impl(
    num_frames: int,
    num_persons: int,
    height: int,
    width: int,
    seed: int,
    model=None,
) -> SyntheticScene:
    rng = np.random.default_rng(seed)
    if model is None:
        model = synthetic_body_model()
    betas = rng.standard_normal((num_persons, 10)).astype(np.float32) * 0.3
    servers = [SMPLServer.create(model, betas=betas[i]) for i in range(num_persons)]

    # persons side by side, slight motion over frames
    base_x = np.linspace(-0.5, 0.5, num_persons)
    cano = np.asarray(canonical_pose_params())
    poses = np.tile(cano, (num_frames, num_persons, 1)).astype(np.float32)
    transl = np.zeros((num_frames, num_persons, 3), np.float32)
    for f in range(num_frames):
        for p in range(num_persons):
            transl[f, p, 0] = base_x[p] + 0.05 * np.sin(f * 0.7 + p)
            poses[f, p, 3:] += rng.standard_normal(69).astype(np.float32) * 0.02

    # fixed camera looking down +z from z=-2.5
    cam = np.eye(4, dtype=np.float32)
    cam[:3, 3] = [0.0, 0.0, -2.5]
    cam_pose = np.tile(cam, (num_frames, 1, 1))
    f_px = 0.9 * width
    # Sub-pixel principal point, like any real calibrated camera. An integer
    # principal point + axis-aligned camera makes the exact center pixel's ray
    # pass through the world origin, which is degenerate (0/0 rot axis) in the
    # reference's NeRF++ depth2pts_outside (multiply.py:713-715) — a
    # measure-zero event for real data that the reference rightly never guards.
    intr = np.array(
        [[f_px, 0, width / 2 + 0.37], [0, f_px, height / 2 + 0.23], [0, 0, 1]],
        np.float32,
    )

    uv = pixel_grid(width, height)
    images = np.zeros((num_frames, height, width, 3), np.float32)
    masks = np.zeros((num_frames, height, width, num_persons), bool)

    faces = model.faces
    for f in range(num_frames):
        ray_d, cam_loc = get_camera_params(
            jnp.asarray(uv), jnp.asarray(cam_pose[f]), jnp.asarray(intr)
        )
        ray_o = jnp.broadcast_to(cam_loc, ray_d.shape)
        depth = np.full((uv.shape[0], num_persons), np.inf, np.float32)
        for p in range(num_persons):
            out = smpl_server_forward(
                servers[p],
                jnp.ones(()),
                jnp.asarray(transl[f, p]),
                jnp.asarray(poses[f, p]),
                jnp.asarray(betas[p]),
            )
            hit = ray_mesh_intersect(ray_o, ray_d, out["smpl_verts"], faces)
            t = np.array(hit["t"])
            t[~np.asarray(hit["hit"])] = np.inf
            depth[:, p] = t

        img = np.tile(BG_COLOR, (uv.shape[0], 1)).astype(np.float32)
        any_hit = np.isfinite(depth).any(axis=1)
        front = np.argmin(depth, axis=1)
        img[any_hit] = PERSON_COLORS[front[any_hit]]
        images[f] = img.reshape(height, width, 3)
        vis = np.zeros((uv.shape[0], num_persons), bool)
        vis[any_hit, front[any_hit]] = True
        masks[f] = vis.reshape(height, width, num_persons)

    sam_logits = np.where(masks, 8.0, -8.0).astype(np.float32)
    return SyntheticScene(
        images=images,
        masks=masks,
        sam_logits=sam_logits,
        poses=poses,
        transl=transl,
        betas=betas,
        scale=np.ones(num_persons, np.float32),
        cam_pose=cam_pose,
        intrinsics=intr,
        servers=servers,
        height=height,
        width=width,
    )


def sample_rays(
    scene: SyntheticScene, frame: int, n_rays: int, rng: np.random.Generator
) -> dict:
    """Weighted ray sampling: 90% inside the union-mask bbox, 10% anywhere
    (reference Hi4D.py:56-87 weighted_sampling, without subpixel interp)."""
    H, W = scene.height, scene.width
    union = scene.masks[frame].any(-1)
    ys, xs = np.nonzero(union)
    if len(xs) == 0:
        xs, ys = np.array([W // 2]), np.array([H // 2])
    x0, x1 = max(xs.min() - 2, 0), min(xs.max() + 2, W - 1)
    y0, y1 = max(ys.min() - 2, 0), min(ys.max() + 2, H - 1)

    n_obj = int(n_rays * 0.9)
    ox = rng.integers(x0, x1 + 1, n_obj)
    oy = rng.integers(y0, y1 + 1, n_obj)
    rx = rng.integers(0, W, n_rays - n_obj)
    ry = rng.integers(0, H, n_rays - n_obj)
    px = np.concatenate([ox, rx])
    py = np.concatenate([oy, ry])

    uv = np.stack([px, py], axis=-1).astype(np.float32)
    rgb = scene.images[frame][py, px]
    sam = scene.sam_logits[frame][py, px]
    return {"uv": uv, "rgb": rgb, "sam": sam}
