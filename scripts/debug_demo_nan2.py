"""Stage-2 NaN bisection for the TPU-only demo gradient NaNs.

debug_demo_nan.py showed: forward loss finite, but grads NaN in the fg
implicit net (SDF output column of the last layer), body params, betas —
rendering/bg nets clean. This script localizes further:

  A. forward finiteness of EVERY renderer.render(train=True) output array
     (the rgb_l1 per-pixel filter can hide forward NaNs whose backward then
     poisons everything via 0*NaN);
  B. per-component grad finiteness (rgb / eikonal / sam / bce / in_shape /
     zero_pose) in one compiled program;
  C. full-loss grad under jax.default_matmul_precision('highest') — if this
     is finite, a bf16 matmul cancellation is the trigger.

Run: python scripts/debug_demo_nan2.py [A B C ...]
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
from multiply_tpu.engine.train import Batch, TrainStep
from multiply_tpu.models.loss import (
    LossConfig, bce_opacity, eikonal, in_shape, rgb_l1, sam_mask_clip,
)
from multiply_tpu.models.renderer import MultiplyRenderer, RenderInputs

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
from train_synthetic import DEMO_CONF  # noqa: E402


def say(*a):
    print(*a, flush=True)


def main():
    stages = set(sys.argv[1:]) or {"A", "B", "C"}
    say("devices:", jax.devices())
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
    key = jax.random.PRNGKey(1)

    def make_inputs(params):
        body = params["body"]
        idx = batch.frame_idx
        return RenderInputs(
            uv=batch.uv,
            pose=batch.pose,
            intrinsics=batch.intrinsics,
            scale=batch.smpl_scale,
            transl=jax.vmap(lambda t: t.transl[idx])(body),
            thetas=jax.vmap(lambda t: t.thetas(idx))(body),
            betas=jax.vmap(lambda t: t.betas[0])(body),
            frame_idx=idx,
            epoch=ts.epoch,
        )

    def fwd(params):
        return renderer.render(
            params["net"], builder.state, make_inputs(params), train=True, key=key
        )

    if "A" in stages:
        say("--- stage A: forward output finiteness ---")
        out = jax.jit(fwd)(ts.params)
        for k in sorted(out):
            v = out[k]
            if v is None or not hasattr(v, "dtype"):
                continue
            arr = np.asarray(v)
            if not np.issubdtype(arr.dtype, np.floating):
                continue
            n_bad = int((~np.isfinite(arr)).sum())
            flag = "  <-- NON-FINITE" if n_bad else ""
            say(f"  {k}: shape={arr.shape} bad={n_bad}/{arr.size}{flag}")

    def component_losses(params):
        out = fwd(params)
        return {
            "rgb": rgb_l1(out["rgb_values"], batch.rgb),
            "eik": eikonal(out["grad_theta"]),
            "bce": bce_opacity(out["acc_map"]),
            "in_shape": in_shape(out["acc_map"], out["index_in_surface"]),
            "sam": sam_mask_clip(batch.sam_mask, out["acc_person_list"]),
            "zero_pose": out.get("zero_pose_loss", jnp.zeros(())),
        }

    if "B" in stages:
        say("--- stage B: per-component grad finiteness ---")

        def diag(params):
            res = {}
            for name in ("rgb", "eik", "bce", "in_shape", "sam", "zero_pose"):
                val, g = jax.value_and_grad(
                    lambda p, n=name: component_losses(p)[n]
                )(params)
                allfin = jax.tree.reduce(
                    jnp.logical_and,
                    jax.tree.map(lambda x: jnp.all(jnp.isfinite(x)), g),
                )
                res[name] = (val, allfin)
            return res

        res = jax.jit(diag)(ts.params)
        for name, (val, fin) in res.items():
            say(f"  {name}: value={float(val):.5f} grads_finite={bool(fin)}")

    if "C" in stages:
        say("--- stage C: full grad at matmul precision 'highest' ---")

        def full_loss(params):
            loss, _ = builder._forward_loss(
                params, builder.state, batch, ts.epoch, key
            )
            return loss

        with jax.default_matmul_precision("highest"):
            val, g = jax.jit(jax.value_and_grad(full_loss))(ts.params)
        bad = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]:
            n_bad = int((~np.isfinite(np.asarray(leaf))).sum())
            if n_bad:
                bad.append((jax.tree_util.keystr(path), n_bad))
        say(f"  loss={float(val):.5f} nonfinite_leaves={len(bad)}")
        for name, n in bad[:10]:
            say(f"    {name}: {n}")


if __name__ == "__main__":
    main()
