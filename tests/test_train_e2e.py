"""End-to-end training smoke test: loss decreases on the synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiply_tpu.body.params import BodyParamTable
from multiply_tpu.data.synthetic import make_scene, sample_rays
from multiply_tpu.engine.optim import adam_init, adam_update, multistep_lr
from multiply_tpu.engine.train import (
    MODE_DELAYED_POSE,
    MODE_JOINT,
    MODE_POSE_ONLY,
    Batch,
    TrainStep,
)
from multiply_tpu.models.loss import LossConfig
from multiply_tpu.models.renderer import MultiplyRenderer

from test_renderer import TINY_CONF


def test_multistep_lr():
    lr = multistep_lr(1.0, jnp.asarray(0), (200, 500), 0.5)
    assert float(lr) == 1.0
    assert float(multistep_lr(1.0, jnp.asarray(200), (200, 500), 0.5)) == 0.5
    assert float(multistep_lr(1.0, jnp.asarray(600), (200, 500), 0.5)) == 0.25


def test_adam_masked_update():
    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
    st = adam_init(params)
    active = {"a": jnp.asarray(True), "b": jnp.asarray(False)}
    new_p, new_st = adam_update(grads, st, params, jnp.asarray(0.1), None, active)
    assert not np.allclose(np.asarray(new_p["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(new_p["b"]), 1.0)  # frozen
    np.testing.assert_allclose(np.asarray(new_st.mu["b"]), 0.0)  # state untouched
    assert int(new_st.count["a"]) == 1 and int(new_st.count["b"]) == 0


@pytest.fixture(scope="module")
def trainer_setup():
    scene = make_scene(num_frames=3, num_persons=2, height=32, width=40)
    renderer = MultiplyRenderer(TINY_CONF, num_persons=2, num_frames=3)
    state = renderer.build_person_state(scene.servers, grid_res=16)
    loss_cfg = LossConfig(sam_start_epoch=0, milestone=200)
    ts_builder = TrainStep(renderer, state, loss_cfg, learning_rate=5e-3)

    tables = [
        BodyParamTable.create(
            3,
            betas=scene.betas[p],
            global_orient=scene.poses[:, p, :3],
            transl=scene.transl[:, p],
            body_pose=scene.poses[:, p, 3:],
        )
        for p in range(2)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *tables)
    train_state = ts_builder.init_state(jax.random.PRNGKey(0), stacked)
    return scene, ts_builder, train_state


def make_batch(scene, frame, rng, mode=MODE_JOINT, n_rays=64):
    rays = sample_rays(scene, frame, n_rays, rng)
    return Batch(
        uv=jnp.asarray(rays["uv"]),
        rgb=jnp.asarray(rays["rgb"]),
        pose=jnp.asarray(scene.cam_pose[frame]),
        intrinsics=jnp.asarray(scene.intrinsics),
        frame_idx=jnp.asarray(frame),
        smpl_scale=jnp.asarray(scene.scale),
        sam_mask=jnp.asarray(rays["sam"]),
        mode=jnp.asarray(mode),
    )


def test_train_step_runs_and_loss_decreases(trainer_setup):
    scene, builder, ts = trainer_setup
    step = builder.jitted_step()
    rng = np.random.default_rng(0)

    losses = []
    for i in range(12):
        batch = make_batch(scene, i % 3, rng)
        ts, logs = step(ts, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["loss"]))
        assert np.isfinite(losses[-1]), f"non-finite loss at step {i}: {logs}"

    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


def test_pose_only_mode_freezes_network(trainer_setup):
    scene, builder, ts = trainer_setup
    step = builder.jitted_step()
    rng = np.random.default_rng(1)
    batch = make_batch(scene, 0, rng, mode=MODE_POSE_ONLY)
    ts2, _ = step(ts, batch, jax.random.PRNGKey(99))

    # network params untouched, body params moved
    for a, b in zip(
        jax.tree_util.tree_leaves(ts.params["net"]),
        jax.tree_util.tree_leaves(ts2.params["net"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(ts.params["body"]),
            jax.tree_util.tree_leaves(ts2.params["body"]),
        )
    ]
    assert any(moved)


def test_delayed_pose_mode_freezes_shape_but_not_latents(trainer_setup):
    scene, builder, ts = trainer_setup
    step = builder.jitted_step()
    rng = np.random.default_rng(2)
    batch = make_batch(scene, 1, rng, mode=MODE_DELAYED_POSE)
    ts2, _ = step(ts, batch, jax.random.PRNGKey(7))

    for key in ("fg_implicit", "fg_render", "bg_implicit", "bg_render"):
        for a, b in zip(
            jax.tree_util.tree_leaves(ts.params["net"][key]),
            jax.tree_util.tree_leaves(ts2.params["net"][key]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # frame latents / beta may move (multiply_model.py freeze_shape_model
    # leaves them trainable)
    assert not np.allclose(
        np.asarray(ts.params["net"]["frame_latent"]),
        np.asarray(ts2.params["net"]["frame_latent"]),
    )
