"""Validation / test rendering: chunked full-image renders, PSNR, per-person
foreground maps, normal maps, and canonical/deformed mesh exports.

Parity target: code/multiply_model.py:982-1646 (validation_step /
test_step / test_step_each_person) + code/lib/utils/idr_utils.py chunking.
Outputs mirror the reference's directory layout:
    test_rendering/%04d.png, test_fg_rendering/, test_normal/, test_mask/,
    test_instance_mask/<p>/%04d.png, test_mesh/<p>/{idx}_canonical|_deformed.ply
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.renderer import MultiplyRenderer, PersonState, RenderInputs
from .mesh_export import generate_mesh, save_ply


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((pred - gt) ** 2))
    return -10.0 * np.log10(mse + 1e-10)


class Evaluator:
    def __init__(
        self,
        renderer: MultiplyRenderer,
        person_state: PersonState,
        servers: list,
        pixel_per_batch: int = 512,
        mesh=None,
    ):
        """`mesh`: optional jax.sharding.Mesh — shards each pixel chunk's
        rays across the mesh (params/person-state replicated), the same
        data-parallel axis the training step uses (parallel/sharding.py).
        The reference's inference is strictly single-GPU; this makes test
        renders (512³ mesh exports aside) scale with chips."""
        self.renderer = renderer
        self.state = person_state
        self.servers = servers
        self.mesh = mesh
        if mesh is not None:
            # round the chunk up by the ray-sharding axis (not total devices:
            # a multi-axis mesh shards rays along RAY_AXIS only)
            from ..parallel.sharding import RAY_AXIS

            n = mesh.shape[RAY_AXIS]
            if pixel_per_batch % n != 0:
                pixel_per_batch = -(-pixel_per_batch // n) * n
        self.chunk = pixel_per_batch

        def render_chunk(net_params, person_state, inputs: RenderInputs):
            out = self.renderer.render(net_params, person_state, inputs, train=False)
            return {
                "rgb_values": out["rgb_values"],
                "fg_rgb_values": out["fg_rgb_values"],
                "normal_values": out["normal_values"],
                "acc_map": out["acc_map"],
                "acc_person_list": out["acc_person_list"],
            }

        self._render_chunk = jax.jit(render_chunk)

    def render_image(
        self,
        net_params,
        body_tables,
        item: dict,
        epoch: int = 10_000,
        person_state: PersonState | None = None,
    ) -> dict:
        """Full-image chunked render (idr_utils split/merge equivalent)."""
        state = person_state if person_state is not None else self.state
        H, W = item["img_size"]
        uv_full = np.asarray(item["uv"], np.float32)
        n = len(uv_full)
        pad = (-n) % self.chunk
        uv_pad = np.pad(uv_full, ((0, pad), (0, 0)))

        idx = jnp.asarray(item["idx"])
        transl = jax.vmap(lambda t: t.transl[idx])(body_tables)
        thetas = jax.vmap(lambda t: t.thetas(idx))(body_tables)
        betas = jax.vmap(lambda t: t.betas[0])(body_tables)

        outs = {k: [] for k in ("rgb_values", "fg_rgb_values", "normal_values", "acc_map", "acc_person_list")}
        for s in range(0, len(uv_pad), self.chunk):
            inputs = RenderInputs(
                uv=jnp.asarray(uv_pad[s : s + self.chunk]),
                pose=jnp.asarray(item["pose"]),
                intrinsics=jnp.asarray(item["intrinsics"]),
                scale=jnp.asarray(item["smpl_scale"]),
                transl=transl,
                thetas=thetas,
                betas=betas,
                frame_idx=idx,
                epoch=jnp.asarray(epoch),
            )
            if self.mesh is not None:
                from ..parallel.sharding import shard_render_inputs

                inputs = shard_render_inputs(inputs, self.mesh)
            chunk_out = self._render_chunk(net_params, state, inputs)
            for k, v in chunk_out.items():
                outs[k].append(np.asarray(v))

        merged = {k: np.concatenate(v, axis=0)[:n] for k, v in outs.items()}
        merged["rgb_image"] = merged["rgb_values"].reshape(H, W, 3)
        merged["fg_image"] = merged["fg_rgb_values"].reshape(H, W, 3)
        merged["normal_image"] = (merged["normal_values"].reshape(H, W, 3) + 1) / 2
        merged["mask_image"] = merged["acc_map"].reshape(H, W)
        merged["instance_images"] = merged["acc_person_list"].reshape(H, W, -1)
        if "rgb" in item:
            merged["psnr"] = psnr(
                merged["rgb_values"], np.asarray(item["rgb"], np.float32)
            )
        return merged

    # -- mesh export (test_step_each_person, multiply_model.py:1183-1233) ----

    def export_meshes(
        self,
        canonical_sdf_fns: list,
        body_tables,
        deformers,
        frame_idx: int,
        scale: float,
        out_dir: str,
        res_up: int = 4,
        deform_k: int = 7,
    ) -> None:
        """Canonical + deformed PLY per person (deformer K=7 at export,
        reference multiply_model.py:1174-1177)."""
        for p, sdf_fn in enumerate(canonical_sdf_fns):
            verts_c, faces = generate_mesh(
                sdf_fn, np.asarray(self.servers[p].verts_c), res_up=res_up
            )
            pdir = os.path.join(out_dir, "test_mesh", str(p))
            os.makedirs(pdir, exist_ok=True)
            save_ply(os.path.join(pdir, f"{frame_idx:04d}_canonical.ply"), verts_c, faces)

            table = jax.tree.map(lambda x: x[p], body_tables)
            thetas = jnp.concatenate(
                [table.global_orient[frame_idx], table.body_pose[frame_idx]]
            )
            out = self.servers[p](
                jnp.asarray(scale), table.transl[frame_idx], thetas, table.betas[0]
            )
            deformer = jax.tree.map(lambda x: x[p], deformers)
            # 512^3 canonical meshes reach millions of verts: chunk the warp
            # (the K=7 weight gather pads to (N,7,128) on TPU otherwise)
            CHUNK = 100_000
            n = len(verts_c)
            pieces = []
            for s in range(0, n, CHUNK):
                part = verts_c[s : s + CHUNK]
                pad = CHUNK - len(part)
                part = np.pad(part, ((0, pad), (0, 0)))
                moved = np.asarray(
                    deformer.forward(jnp.asarray(part), out["smpl_tfs"], k=deform_k)
                )
                pieces.append(moved[: CHUNK - pad])
            verts_d = np.concatenate(pieces) if pieces else verts_c
            save_ply(os.path.join(pdir, f"{frame_idx:04d}_deformed.ply"), verts_d, faces)

    def save_outputs(self, out_dir: str, frame_idx: int, merged: dict, gt: np.ndarray | None = None) -> None:
        import imageio

        def w(sub, img):
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
            imageio.imwrite(
                os.path.join(out_dir, sub, f"{frame_idx:04d}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )

        rgb = merged["rgb_image"]
        if gt is not None:
            rgb = np.concatenate([gt, rgb], axis=1)
        w("test_rendering", rgb)
        w("test_fg_rendering", merged["fg_image"])
        w("test_normal", merged["normal_image"])
        w("test_mask", merged["mask_image"])
        for p in range(merged["instance_images"].shape[-1]):
            w(os.path.join("test_instance_mask", str(p)), merged["instance_images"][..., p])
