"""Orchestrator tests: full Trainer loop with refinement stages, mesh
extraction, opt_depth, checkpoint/resume — on a tiny synthetic scene."""

import glob
import os

import numpy as np
import pytest

from multiply_tpu.config import load_config
from multiply_tpu.data.synthetic import make_scene
from multiply_tpu.data.synthetic_sequence import SyntheticSequence
from multiply_tpu.engine.sam_stage import PriorSegmenter
from multiply_tpu.engine.trainer import Trainer

CONF_PATH = os.path.join(os.path.dirname(__file__), "..", "confs", "synthetic_base.yaml")


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("run"))
    conf = load_config(
        CONF_PATH,
        overrides={
            "model": {
                "implicit_network": {"dims": [32, 32], "skip_in": [], "multires": 2,
                                     "feature_vector_size": 32},
                "rendering_network": {"dims": [32], "feature_vector_size": 32},
                "bg_implicit_network": {"dims": [32, 32], "multires": 2,
                                        "feature_vector_size": 32},
                "bg_rendering_network": {"dims": [16], "feature_vector_size": 32},
                "ray_sampler": {"N_samples": 8, "N_samples_eval": 16,
                                "N_samples_extra": 4, "beta_iters": 3,
                                "max_total_iters": 2, "N_samples_inverse_sphere": 4},
                "dim_frame_encoding": 8,
                "depth_epoch": [2],
                "it_per_loop": 3,
                "depth_render_rays": 32,
                "num_training_frames": 2,
                "cano_grid_res": 12,
                "cano_mesh_res_up": 1,
            },
            "dataset": {"train": {"num_sample": 48, "end_frame": 2,
                                  "height": 28, "width": 36}},
        },
    )
    scene = make_scene(num_frames=2, num_persons=2, height=28, width=36)
    seq = SyntheticSequence(scene, num_sample=48, run_dir=run_dir)
    from train import build_servers

    servers = build_servers(conf, seq)
    tr = Trainer(conf, seq, servers, run_dir=run_dir, segmenter=PriorSegmenter())
    return tr, run_dir


def test_epoch_runs_and_stages_write_artifacts(trainer):
    tr, run_dir = trainer
    logs = tr.train_epoch()
    assert np.isfinite(logs["loss"])

    tr.instance_mask_stage()
    tr.sam_stage()
    masks = np.load(
        glob.glob(os.path.join(run_dir, "stage_instance_mask", "*", "all_person_smpl_mask.npy"))[-1]
    )
    assert masks.shape[:2] == (2, 2)  # (F, P, ...)
    assert masks.dtype == bool
    assert masks.any(), "instance masks are empty — rasterization failed"
    kps = np.load(
        glob.glob(os.path.join(run_dir, "stage_instance_mask", "*", "2d_keypoint.npy"))[-1]
    )
    assert kps.shape == (2, 2, 27, 2)
    sam = np.load(
        glob.glob(os.path.join(run_dir, "stage_sam_mask", "*", "sam_opt_mask.npy"))[-1]
    )
    assert sam.shape == masks.shape

    # dataset picks up the refreshed SAM masks + certainty ranking
    tr.seq._refresh_sam()
    assert tr.seq._sam_masks is not None
    assert tr.seq._sam_masks.shape == (2, 28, 36, 2)
    assert np.isfinite(tr.seq.smpl_sam_iou).all()


def test_fit_stage_overlap(trainer, tmp_path):
    """model.stage_overlap=true: fit() runs the /20 mesh refresh and /50
    instance+SAM stages in a background thread on a params snapshot; the
    epochs complete, the stage artifacts land, and the refreshed grids are
    applied to person_state after the background bake finishes."""
    import jax
    import jax.numpy as jnp

    tr, run_dir = trainer
    tr.conf.model["stage_overlap"] = True
    start = tr.epoch
    # land exactly on a /20 boundary so the overlapped mesh refresh fires
    tr.epoch = 19
    # module-scoped fixture: restore the trainer afterwards so later tests
    # (mesh-at-init sphere check etc.) see an untrained model. DEEP copies —
    # _step donates tr.ts, so a reference alone would hold deleted buffers.
    ts_snap = jax.tree.map(jnp.array, tr.ts)
    state_snap = jax.tree.map(jnp.array, tr.person_state)
    old_grid = np.asarray(tr.person_state.cano_grid["grid"]).copy()
    try:
        tr.fit(max_epochs=22, log_every=100, val_every=20, render_val=False)
        new_grid = np.asarray(tr.person_state.cano_grid["grid"]).copy()
    finally:
        tr.conf.model["stage_overlap"] = False
        tr.epoch = start
        tr.ts = ts_snap
        tr.person_state = state_snap
    assert not np.allclose(old_grid, new_grid), "overlapped refresh not applied"
    assert glob.glob(
        os.path.join(run_dir, "stage_sam_mask", "00020", "sam_opt_mask.npy")
    ), "overlapped instance+SAM stage did not publish"


def test_canonical_refresh_and_mesh_extraction(trainer):
    tr, run_dir = trainer
    meshes = tr.extract_canonical_meshes()
    assert len(meshes) == 2
    v, f = meshes[0]
    assert len(v) > 50 and len(f) > 50, "canonical mesh degenerate at init"
    # geometric init => mesh approximates a sphere of radius ~bias
    r = np.linalg.norm(v - v.mean(0), axis=-1)
    assert 0.2 < np.median(r) < 1.5

    old_grid = np.asarray(tr.person_state.cano_grid["grid"])
    tr.refresh_canonical_state()
    new_grid = np.asarray(tr.person_state.cano_grid["grid"])
    assert new_grid.shape[0] == 2
    assert not np.allclose(old_grid, new_grid)


def test_opt_depth_moves_translations(trainer):
    tr, run_dir = trainer
    if tr.seq._sam_masks is None:
        tr.instance_mask_stage()
        tr.sam_stage()
        tr.seq._refresh_sam()
    before = np.asarray(tr.ts.params["body"].transl).copy()
    tr._opt_depth_frame(0)
    after = np.asarray(tr.ts.params["body"].transl)
    # translations of frame 0 may move; everything else must be identical
    assert before.shape == after.shape
    assert np.isfinite(after).all()
    np.testing.assert_array_equal(before[:, 1:], after[:, 1:])


def test_pose_only_step_adds_mesh_losses(trainer):
    """MODE_POSE_ONLY steps carry the depth-order + silhouette +
    interpenetration losses (multiply_model.py:195-202): the three terms are
    logged, gradients flow into the frame's SMPL translation, and only body
    params move (the pose optimizer owns nothing else)."""
    import jax
    import jax.numpy as jnp

    from multiply_tpu.engine.train import MODE_POSE_ONLY

    tr, run_dir = trainer
    if tr.seq._sam_masks is None:
        tr.instance_mask_stage()
        tr.sam_stage()
        tr.seq._refresh_sam()

    rng = np.random.default_rng(0)
    pb = tr.pose_loss_batch(0, rng)
    assert pb is not None
    assert pb.verts_c.shape[0] == 2 and pb.faces.shape[0] == 2
    assert pb.uv.shape == (tr.pose_pixel_samples, 2)
    assert float(pb.scale_to_full) > 0

    # raw pose losses are finite and differentiable into the translations.
    # Create a genuine occlusion: person 0 moved directly in front of person 1
    # (the SAM masks still claim person 1 owns those pixels -> depth-order
    # disagreement; the meshes also interpenetrate along the view ray).
    def raw(transl0):
        body = tr.ts.params["body"]
        body = body._replace(transl=body.transl.at[0, 0].set(transl0))
        params = {"net": tr.ts.params["net"], "body": body}
        item = tr.seq.get_train_item(0, np.random.default_rng(1))
        batch = tr.make_batch(item, MODE_POSE_ONLY)
        d, s, i = tr.builder._pose_step_losses(
            params, tr.person_state, batch, pb, jax.random.PRNGKey(0)
        )
        return d + s + i

    t1 = tr.ts.params["body"].transl[1, 0]
    g = jax.grad(raw)(t1 + jnp.asarray([0.0, 0.0, -0.35]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0, "pose losses have no transl gradient"

    # a full pose-only step: three terms logged, net params frozen, body moves
    item = tr.seq.get_train_item(0, rng)
    batch = tr.make_batch(item, MODE_POSE_ONLY)
    net_before = jax.tree.map(lambda x: np.asarray(x).copy(), tr.ts.params["net"])
    body_before = np.asarray(tr.ts.params["body"].transl).copy()
    # _step donates its train-state argument: reassign tr.ts immediately or
    # the shared fixture is left holding deleted buffers for later tests
    ts2, logs = tr._step(tr.ts, batch, jax.random.PRNGKey(3), tr.person_state, pb)
    tr.ts = ts2
    for k in (
        "pose_depth_order_loss",
        "pose_silhouette_loss",
        "pose_interpenetration_loss",
    ):
        assert k in logs and np.isfinite(float(logs[k])), k
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        net_before,
        ts2.params["net"],
    )
    assert not np.allclose(body_before, np.asarray(ts2.params["body"].transl))


def test_checkpoint_roundtrip(trainer, tmp_path):
    tr, run_dir = trainer
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    tr.epoch = 7
    tr.save_checkpoint(ckpt_dir)
    saved = np.asarray(tr.ts.params["body"].transl).copy()

    # perturb then restore
    import jax.numpy as jnp
    import jax

    tr.ts = tr.ts._replace(
        params={
            "net": tr.ts.params["net"],
            "body": jax.tree.map(lambda x: x + 1.0, tr.ts.params["body"]),
        }
    )
    tr.load_checkpoint(os.path.join(ckpt_dir, "epoch_00007"))
    assert tr.epoch == 7
    np.testing.assert_allclose(
        np.asarray(tr.ts.params["body"].transl), saved, atol=1e-6
    )


def test_trainer_multidevice_mesh(tmp_path):
    """devices=8: the Trainer shards each step's rays over the CPU mesh
    (params replicated, grads all-reduced by XLA) and an epoch produces a
    finite loss. Wiring test for train.py --devices; numerical equivalence of
    the sharded step is covered by test_sharding.py."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh (conftest)")
    run_dir = str(tmp_path)
    conf = load_config(
        CONF_PATH,
        overrides={
            "model": {
                "implicit_network": {"dims": [16, 16], "skip_in": [], "multires": 2,
                                     "feature_vector_size": 16},
                "rendering_network": {"dims": [16], "feature_vector_size": 16},
                "bg_implicit_network": {"dims": [16, 16], "multires": 2,
                                        "feature_vector_size": 16},
                "bg_rendering_network": {"dims": [16], "feature_vector_size": 16},
                "ray_sampler": {"N_samples": 8, "N_samples_eval": 16,
                                "N_samples_extra": 4, "beta_iters": 3,
                                "max_total_iters": 2, "N_samples_inverse_sphere": 4},
                "dim_frame_encoding": 8,
                "num_training_frames": 2,
                "cano_grid_res": 8,
                "cano_mesh_res_up": 1,
            },
            "dataset": {"train": {"num_sample": 48, "end_frame": 2,
                                  "height": 20, "width": 24}},
        },
    )
    scene = make_scene(num_frames=2, num_persons=2, height=20, width=24)
    seq = SyntheticSequence(scene, num_sample=48, run_dir=run_dir)
    from train import build_servers

    servers = build_servers(conf, seq)
    tr = Trainer(conf, seq, servers, run_dir=run_dir,
                 segmenter=PriorSegmenter(), devices=8)
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    logs = tr.train_epoch()
    assert np.isfinite(logs["loss"])
