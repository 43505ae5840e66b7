"""Mesh-over-image visualization: render reconstructed mesh sequences onto
the training frames with the training cameras.

Parity target: ait_viewer_vis/vis_mesh_image.py (aitviewer scene with
deformed mesh sequences + billboard images). Dependency-free equivalent: the
native z-buffer rasterizer draws each person's deformed mesh with Lambertian
face shading, composited over the input frame; frames export as PNGs and an
optional GIF turntable.
"""

from __future__ import annotations

import os

import numpy as np

from ..native import rasterize_depth
from .instance_masks import project_depth

PERSON_TINTS = np.array(
    [[0.9, 0.4, 0.35], [0.35, 0.5, 0.9], [0.4, 0.85, 0.4], [0.85, 0.8, 0.3]]
)


def shade_mesh_over_image(
    image: np.ndarray,  # (H, W, 3) float [0,1]
    meshes: list[tuple[np.ndarray, np.ndarray]],  # per person (verts, faces)
    P: np.ndarray,  # (3or4, 4) projection
    alpha: float = 0.85,
    light_dir=(0.3, -0.5, -0.8),
) -> np.ndarray:
    H, W = image.shape[:2]
    out = image.copy()
    light = np.asarray(light_dir, np.float32)
    light /= np.linalg.norm(light)

    composite_depth = np.full((H, W), np.inf, np.float32)
    composite_rgb = np.zeros((H, W, 3), np.float32)
    hit_any = np.zeros((H, W), bool)

    for pid, (verts, faces) in enumerate(meshes):
        vp = project_depth(P, verts).astype(np.float32)
        depth, fid = rasterize_depth(vp, faces, W, H, return_face_id=True)
        hit = np.isfinite(depth)
        if not hit.any():
            continue
        # Lambertian face shading in world space
        tri = verts[faces]  # (F,3,3)
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        lam = np.abs(n @ light)  # double-sided
        shade = 0.35 + 0.65 * lam  # (F,)
        color = PERSON_TINTS[pid % len(PERSON_TINTS)][None, :] * shade[:, None]

        px = hit & (depth < composite_depth)
        composite_depth[px] = depth[px]
        composite_rgb[px] = color[fid[px]]
        hit_any |= hit

    out[hit_any] = (1 - alpha) * out[hit_any] + alpha * composite_rgb[hit_any]
    return out


def export_visualization(
    out_dir: str,
    images: list[np.ndarray],
    meshes_per_frame: list[list[tuple[np.ndarray, np.ndarray]]],
    P_per_frame: list[np.ndarray],
    gif: bool = True,
) -> None:
    import imageio

    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for i, (img, meshes, P) in enumerate(
        zip(images, meshes_per_frame, P_per_frame)
    ):
        vis = shade_mesh_over_image(img, meshes, P)
        u8 = (np.clip(vis, 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, f"{i:04d}.png"), u8)
        frames.append(u8)
    if gif and frames:
        imageio.mimsave(os.path.join(out_dir, "sequence.gif"), frames, fps=10)
