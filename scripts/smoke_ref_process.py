"""Incremental smoke test of the reference-process harness (run before the
full parity suite; prints progress at each stage so failures localize)."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "ref_process"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import driver  # noqa: E402


def main():
    t0 = time.time()
    work = tempfile.mkdtemp(prefix="parity_smoke_")
    print(f"[{time.time()-t0:6.1f}s] building assets (6890-vert scene)...", flush=True)
    scene, model, smpl_dir, betas_path = driver.build_assets(work, num_frames=2)
    print(f"[{time.time()-t0:6.1f}s] assets ok: images {scene.images.shape}, "
          f"masks cover {scene.masks.mean():.3f}", flush=True)

    print(f"[{time.time()-t0:6.1f}s] building reference Multiply...", flush=True)
    ref_model, ref_loss, ref_body, ref_opt = driver.build_reference(
        work, scene, smpl_dir, betas_path, 2
    )
    n_params = sum(p.numel() for p in ref_model.parameters())
    print(f"[{time.time()-t0:6.1f}s] reference built: {n_params/1e3:.0f}k params", flush=True)

    rays = driver.pick_rays(scene, 0, 32, seed=7)
    print(f"[{time.time()-t0:6.1f}s] eval forward...", flush=True)
    out = driver.ref_eval_forward(ref_model, ref_body, scene, 0, rays, epoch=30)
    print(f"[{time.time()-t0:6.1f}s] eval ok: rgb mean {out['rgb_values'].mean():.4f} "
          f"acc mean {out['acc_map'].mean():.4f}", flush=True)
    assert np.isfinite(out["rgb_values"]).all()

    print(f"[{time.time()-t0:6.1f}s] train step...", flush=True)
    losses = driver.ref_train_step(
        ref_model, ref_loss, ref_body, ref_opt, scene, 0, rays, epoch=0
    )
    print(f"[{time.time()-t0:6.1f}s] train ok: "
          + " ".join(f"{k}={v:.4f}" for k, v in losses.items() if abs(v) > 1e-9),
          flush=True)

    print(f"[{time.time()-t0:6.1f}s] second step (epoch 30, pose cond on)...", flush=True)
    losses = driver.ref_train_step(
        ref_model, ref_loss, ref_body, ref_opt, scene, 1, rays, epoch=30
    )
    print(f"[{time.time()-t0:6.1f}s] ok: loss={losses['loss']:.4f}", flush=True)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
