"""End-to-end process parity vs the ACTUAL reference implementation
(VERDICT r3 item 3 — "the single biggest credibility gap").

Drives /root/reference/code's Multiply + Loss (real PyTorch code, functional
CPU stubs for its CUDA deps) and our JAX step on one identical synthetic
scene with identical initial weights (ported ref->ours), and asserts:

1. deterministic EVAL forward parity: rgb / normals / acc_map / per-person
   acc agree ray-for-ray across the full system (sampler -> deformer ->
   networks -> multi-person composite -> NeRF++ background);
2. deterministic loss-level parity on the eval forward (L1 rgb, BCE);
3. short matched training runs: per-component loss trajectories stay in a
   band (training sampling is stochastic on both sides by design, so this is
   a statistical claim, not bitwise).

The long-horizon run lives in scripts/e2e_parity.py -> RUNLOG_PARITY.md.
Reference process: multiply_model.py:131-227, multiply.py:174-598.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "ref_process"))

import driver  # noqa: E402

N_RAYS = 64
N_FRAMES = 2


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("parity"))
    scene, model, smpl_dir, betas_path = driver.build_assets(
        work, num_frames=N_FRAMES
    )
    ref_model, ref_loss, ref_body, ref_opt = driver.build_reference(
        work, scene, smpl_dir, betas_path, N_FRAMES
    )

    from multiply_tpu.body.params import BodyParamTable
    from multiply_tpu.engine.train import TrainStep
    from multiply_tpu.models.loss import LossConfig
    from multiply_tpu.models.renderer import MultiplyRenderer

    conf = driver.our_conf(N_FRAMES)
    renderer = MultiplyRenderer(conf, num_persons=2, num_frames=N_FRAMES)
    state = renderer.build_person_state(scene.servers, grid_res=16)
    builder = TrainStep(
        renderer,
        state,
        LossConfig(
            sam_start_epoch=driver.LOSS_W["sam_start_epoch"],
            sam_mask_weight=driver.LOSS_W["sam_mask_weight"],
        ),
    )
    tables = [
        BodyParamTable.create(
            N_FRAMES,
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
    net = driver.port_ref_weights(ref_model, ts.params["net"], num_persons=2)
    ts = ts._replace(params={"net": net, "body": ts.params["body"]})

    return {
        "scene": scene,
        "ref": (ref_model, ref_loss, ref_body, ref_opt),
        "ours": (renderer, state, builder, ts),
    }


def _our_eval_forward(harness, rays, frame, epoch):
    from multiply_tpu.models.renderer import RenderInputs

    scene = harness["scene"]
    renderer, state, builder, ts = harness["ours"]
    body = ts.params["body"]
    idx = jnp.asarray(frame)
    inputs = RenderInputs(
        uv=jnp.asarray(rays["uv"]),
        pose=jnp.asarray(scene.cam_pose[frame]),
        intrinsics=jnp.asarray(scene.intrinsics),
        scale=jnp.asarray(scene.scale),
        transl=jax.vmap(lambda t: t.transl[idx])(body),
        thetas=jax.vmap(lambda t: t.thetas(idx))(body),
        betas=jax.vmap(lambda t: t.betas[0])(body),
        frame_idx=idx,
        epoch=jnp.asarray(epoch),
    )
    return renderer.render(ts.params["net"], state, inputs, train=False)


def test_eval_forward_parity(harness):
    """Full-system deterministic forward: both processes agree ray-for-ray."""
    scene = harness["scene"]
    ref_model, _, ref_body, _ = harness["ref"]
    rays = driver.pick_rays(scene, frame=0, n_rays=N_RAYS, seed=7)
    epoch = 30  # >20: pose conditioning active on both sides

    theirs = driver.ref_eval_forward(ref_model, ref_body, scene, 0, rays, epoch)
    ours = _our_eval_forward(harness, rays, 0, epoch)

    np.testing.assert_allclose(
        np.asarray(ours["rgb_values"]), theirs["rgb_values"], atol=5e-3,
        err_msg="rgb_values diverged",
    )
    np.testing.assert_allclose(
        np.asarray(ours["acc_map"]), theirs["acc_map"], atol=5e-3,
        err_msg="acc_map diverged",
    )
    np.testing.assert_allclose(
        np.asarray(ours["acc_person_list"]), theirs["acc_person"], atol=5e-3,
        err_msg="per-person acc diverged",
    )
    np.testing.assert_allclose(
        np.asarray(ours["normal_values"]), theirs["normal_values"], atol=1e-2,
        err_msg="normals diverged",
    )


def test_eval_loss_level_parity(harness):
    """Deterministic loss components computed from each side's own eval
    forward agree — i.e. the training signal magnitude matches."""
    scene = harness["scene"]
    ref_model, _, ref_body, _ = harness["ref"]
    rays = driver.pick_rays(scene, frame=0, n_rays=N_RAYS, seed=11)
    epoch = 30

    theirs = driver.ref_eval_forward(ref_model, ref_body, scene, 0, rays, epoch)
    ours = _our_eval_forward(harness, rays, 0, epoch)

    def comps(rgb, acc):
        eps = 1e-6
        l1 = np.abs(rgb - rays["rgb"]).mean()
        bce = -2 * np.mean(
            acc * np.log(acc + eps) + (1 - acc) * np.log(1 - acc + eps)
        )
        return l1, bce

    l1_r, bce_r = comps(theirs["rgb_values"], theirs["acc_map"])
    l1_o, bce_o = comps(
        np.asarray(ours["rgb_values"]), np.asarray(ours["acc_map"])
    )
    np.testing.assert_allclose(l1_o, l1_r, rtol=0.02)
    np.testing.assert_allclose(bce_o, bce_r, rtol=0.02)


def test_training_trajectory_band(harness):
    """12 matched joint-mode steps: the reference process and ours, same ray
    batches, same lr. Components are stochastic (sample jitter), so assert
    band-level agreement and that both optimize."""
    from multiply_tpu.engine.train import Batch

    scene = harness["scene"]
    ref_model, ref_loss, ref_body, ref_opt = harness["ref"]
    renderer, state, builder, ts = harness["ours"]
    step = jax.jit(builder.step)

    n_steps = 12
    ref_hist, our_hist = [], []
    key = jax.random.PRNGKey(42)
    for i in range(n_steps):
        frame = i % N_FRAMES
        epoch = i // N_FRAMES
        rays = driver.pick_rays(scene, frame, N_RAYS, seed=100 + i)
        out = driver.ref_train_step(
            ref_model, ref_loss, ref_body, ref_opt, scene, frame, rays, epoch
        )
        ref_hist.append(out)

        batch = Batch(
            uv=jnp.asarray(rays["uv"]),
            rgb=jnp.asarray(rays["rgb"]),
            pose=jnp.asarray(scene.cam_pose[frame]),
            intrinsics=jnp.asarray(scene.intrinsics),
            frame_idx=jnp.asarray(frame),
            smpl_scale=jnp.asarray(scene.scale),
            sam_mask=jnp.asarray(rays["sam"]),
        )
        ts = ts._replace(epoch=jnp.asarray(epoch))
        ts, logs = step(ts, batch, jax.random.fold_in(key, i))
        our_hist.append({k: float(v) for k, v in logs.items() if np.ndim(v) == 0})

    ref_rgb = np.array([h["rgb_loss"] for h in ref_hist])
    our_rgb = np.array([h["rgb_loss"] for h in our_hist])
    assert np.all(np.isfinite(ref_rgb)) and np.all(np.isfinite(our_rgb))
    # same starting signal (first two steps average, identical weights)
    np.testing.assert_allclose(
        our_rgb[:2].mean(), ref_rgb[:2].mean(), rtol=0.10
    )
    # both processes track each other within a band over the short run
    np.testing.assert_allclose(
        our_rgb[-4:].mean(), ref_rgb[-4:].mean(), rtol=0.25
    )
