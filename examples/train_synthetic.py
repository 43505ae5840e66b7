"""Demo: optimize a 2-person scene from scratch on a synthetic sequence.

This is the framework's minimal end-to-end flow — the same pipeline a real
capture uses (per-person SDF fields + SMPL deformation + error-bound sampling
+ multi-person compositing + NeRF++ background), driven on a self-contained
synthetic scene so it runs anywhere without SMPL pickles or preprocessed video.

Usage:
    python examples/train_synthetic.py [--steps 30] [--rays 128] [--out out.png]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from multiply_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from multiply_tpu.body.params import BodyParamTable
from multiply_tpu.config import Config
from multiply_tpu.data.synthetic import make_scene, sample_rays
from multiply_tpu.engine.train import Batch, TrainStep
from multiply_tpu.models.loss import LossConfig
from multiply_tpu.models.renderer import MultiplyRenderer, RenderInputs
from multiply_tpu.utils.cameras import pixel_grid

DEMO_CONF = Config(
    {
        "dim_frame_encoding": 16,
        "implicit_network": {
            "feature_vector_size": 64, "d_in": 3, "d_out": 1,
            "dims": [64, 64, 64, 64], "init": "geometry", "bias": 0.6,
            "skip_in": [2], "weight_norm": True, "multires": 4,
            "cond": "smpl", "scene_bounding_sphere": 3.0,
        },
        "rendering_network": {
            "feature_vector_size": 64, "mode": "pose_no_view", "d_in": 14,
            "d_out": 3, "dims": [64, 64], "weight_norm": True, "multires_view": -1,
        },
        "bg_implicit_network": {
            "feature_vector_size": 64, "d_in": 4, "d_out": 1,
            "dims": [64, 64], "init": "none", "bias": 0.0, "skip_in": [],
            "weight_norm": False, "multires": 4, "cond": "frame",
        },
        "bg_rendering_network": {
            "feature_vector_size": 64, "mode": "nerf_frame_encoding",
            "d_in": 3, "d_out": 3, "dims": [32], "weight_norm": False,
            "multires_view": 2,
        },
        "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
        "ray_sampler": {
            "near": 0.0, "N_samples": 16, "N_samples_eval": 32,
            "N_samples_extra": 8, "eps": 0.1, "beta_iters": 5,
            "max_total_iters": 3, "N_samples_inverse_sphere": 8,
            "add_tiny": 1e-6,
        },
        "loss": {"smpl_surface_weight": 0.0},
    }
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rays", type=int, default=128)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    scene = make_scene(num_frames=args.frames, num_persons=2, height=36, width=48)
    renderer = MultiplyRenderer(DEMO_CONF, num_persons=2, num_frames=args.frames)
    state = renderer.build_person_state(scene.servers, grid_res=24)
    builder = TrainStep(
        renderer, state, LossConfig(sam_start_epoch=0), learning_rate=3e-3
    )

    tables = [
        BodyParamTable.create(
            args.frames,
            betas=scene.betas[p],
            global_orient=scene.poses[:, p, :3],
            transl=scene.transl[:, p],
            body_pose=scene.poses[:, p, 3:],
        )
        for p in range(2)
    ]
    ts = builder.init_state(
        jax.random.PRNGKey(0), jax.tree.map(lambda *xs: jnp.stack(xs), *tables)
    )
    step = builder.jitted_step()

    rng = np.random.default_rng(0)
    t0 = time.time()
    losses = []
    for i in range(args.steps):
        rays = sample_rays(scene, i % args.frames, args.rays, rng)
        batch = Batch(
            uv=jnp.asarray(rays["uv"]),
            rgb=jnp.asarray(rays["rgb"]),
            pose=jnp.asarray(scene.cam_pose[i % args.frames]),
            intrinsics=jnp.asarray(scene.intrinsics),
            frame_idx=jnp.asarray(i % args.frames),
            smpl_scale=jnp.asarray(scene.scale),
            sam_mask=jnp.asarray(rays["sam"]),
        )
        ts, logs = step(ts, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["loss"]))
        if i == 0:
            print(f"first step (incl. compile): {time.time()-t0:.1f}s")
        if i % 10 == 0 or i == args.steps - 1:
            print(
                f"step {i:4d} loss={losses[-1]:.4f} rgb={float(logs['rgb_loss']):.4f} "
                f"eik={float(logs['eikonal_loss']):.4f} sam={float(logs['sam_mask_loss']):.4f}"
                f" skipped={int(float(logs.get('update_skipped', 0.0)))}"
            )
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s; loss {losses[0]:.4f} -> {losses[-1]:.4f}")

    # render a full validation frame in chunks
    uv_full = pixel_grid(scene.width, scene.height)
    chunk = 512
    body = ts.params["body"]
    img = np.zeros((uv_full.shape[0], 3), np.float32)
    acc = np.zeros((uv_full.shape[0],), np.float32)

    @jax.jit
    def render_chunk(params, uv):
        idx = jnp.asarray(0)
        inputs = RenderInputs(
            uv=uv,
            pose=jnp.asarray(scene.cam_pose[0]),
            intrinsics=jnp.asarray(scene.intrinsics),
            scale=jnp.asarray(scene.scale),
            transl=jax.vmap(lambda t: t.transl[idx])(body),
            thetas=jax.vmap(lambda t: t.thetas(idx))(body),
            betas=jax.vmap(lambda t: t.betas[0])(body),
            frame_idx=idx,
            epoch=jnp.asarray(10_000),
        )
        out = renderer.render(params, state, inputs, train=False)
        return out["rgb_values"], out["acc_map"]

    n = uv_full.shape[0]
    pad = (-n) % chunk
    uv_pad = np.pad(uv_full, ((0, pad), (0, 0)))
    for s in range(0, len(uv_pad), chunk):
        rgb, a = render_chunk(ts.params["net"], jnp.asarray(uv_pad[s : s + chunk]))
        e = min(s + chunk, n)
        img[s:e] = np.asarray(rgb)[: e - s]
        acc[s:e] = np.asarray(a)[: e - s]

    pred = img.reshape(scene.height, scene.width, 3)
    gt = scene.images[0]
    psnr = -10 * np.log10(np.mean((pred - gt) ** 2) + 1e-10)
    print(f"full-frame render: PSNR={psnr:.2f} dB, acc range [{acc.min():.3f},{acc.max():.3f}]")

    if args.out:
        import imageio

        side = np.concatenate([gt, pred], axis=1)
        imageio.imwrite(args.out, (np.clip(side, 0, 1) * 255).astype(np.uint8))
        print(f"wrote {args.out} (GT | prediction)")


if __name__ == "__main__":
    main()
