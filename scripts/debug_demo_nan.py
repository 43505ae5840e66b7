"""Diagnose the TPU-only non-finite gradients in the synthetic demo.

The round-5 verify drive (examples/train_synthetic.py on the chip) showed
update_skipped=1 on every step: the non-finite guard rejected every update.
The same demo is green on CPU. This script computes one loss+grad on the
current default backend and reports, per grad leaf, whether it is finite —
plus a forward probe of the NeRF++ degenerate-ray quantity (p_mid norm).

Run: python scripts/debug_demo_nan.py                 # TPU (axon default)
     JAX_DEBUG=cpu python scripts/debug_demo_nan.py   # contrast on CPU
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_DEBUG") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from multiply_tpu.body.params import BodyParamTable
from multiply_tpu.data.synthetic import make_scene, sample_rays
from multiply_tpu.engine.train import Batch, TrainState, TrainStep
from multiply_tpu.models.loss import LossConfig
from multiply_tpu.models.renderer import MultiplyRenderer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
from train_synthetic import DEMO_CONF  # noqa: E402


def main():
    print("devices:", jax.devices())
    frames = 3
    scene = make_scene(num_frames=frames, num_persons=2, height=36, width=48)
    renderer = MultiplyRenderer(DEMO_CONF, num_persons=2, num_frames=frames)
    state = renderer.build_person_state(scene.servers, grid_res=24)
    builder = TrainStep(
        renderer, state, LossConfig(sam_start_epoch=0), learning_rate=3e-3
    )
    tables = [
        BodyParamTable.create(
            frames,
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

    rng = np.random.default_rng(0)
    rays = sample_rays(scene, 0, 128, rng)
    batch = Batch(
        uv=jnp.asarray(rays["uv"]),
        rgb=jnp.asarray(rays["rgb"]),
        pose=jnp.asarray(scene.cam_pose[0]),
        intrinsics=jnp.asarray(scene.intrinsics),
        frame_idx=jnp.asarray(0),
        smpl_scale=jnp.asarray(scene.scale),
        sam_mask=jnp.asarray(rays["sam"]),
    )

    # grad through the step's own loss: run builder.step on a state whose
    # params are the differentiated argument and read logs["loss"].
    def scalar_loss(params):
        ts2 = TrainState(
            params=params, opt_joint=ts.opt_joint, opt_pose=ts.opt_pose,
            epoch=ts.epoch,
        )
        _, logs = builder.step(ts2, batch, jax.random.PRNGKey(1))
        return logs["loss"], logs

    (loss, logs), grads = jax.jit(
        lambda p: jax.value_and_grad(scalar_loss, has_aux=True)(p)
    )(ts.params)
    print(f"loss={float(loss):.5f}")
    for key in ("rgb_loss", "eikonal_loss", "sam_mask_loss", "bce_loss"):
        if key in logs:
            print(f"  {key}={float(logs[key]):.5f}")

    bad = []
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        n_bad = int((~np.isfinite(arr)).sum())
        if n_bad:
            bad.append((jax.tree_util.keystr(path), n_bad, arr.size))
    if bad:
        print(f"NON-FINITE GRAD LEAVES ({len(bad)}):")
        for name, n_bad, size in bad:
            print(f"  {name}: {n_bad}/{size}")
    else:
        print("all grad leaves finite")

    # forward probe: how close do this scene's rays pass to the origin?
    from multiply_tpu.utils.cameras import get_camera_params

    ray_d, cam_loc = get_camera_params(
        jnp.asarray(scene.uv_all if hasattr(scene, "uv_all") else rays["uv"]),
        jnp.asarray(scene.cam_pose[0]),
        jnp.asarray(scene.intrinsics),
    )
    ray_o = jnp.broadcast_to(cam_loc, ray_d.shape)
    o_dot_d = jnp.sum(ray_d * ray_o, axis=-1)
    p_mid = ray_o - o_dot_d[..., None] * ray_d
    p_mid_norm = np.asarray(jnp.linalg.norm(p_mid, axis=-1))
    print(
        "p_mid_norm: min=%.3e max=%.3e n_zero=%d"
        % (p_mid_norm.min(), p_mid_norm.max(), int((p_mid_norm == 0).sum()))
    )


if __name__ == "__main__":
    main()
