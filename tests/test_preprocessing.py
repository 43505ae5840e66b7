"""Preprocessing pipeline: refinement improves keypoint fit; final stage
emits a loadable training directory."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiply_tpu.body import SMPLServer, canonical_pose_params, synthetic_body_model
from multiply_tpu.preprocessing.pipeline import TraceInputs, preprocess_sequence
from multiply_tpu.preprocessing.refine import (
    SMPL_TO_COCO17,
    RefineConfig,
    project,
    refine_sequence,
)


def make_trace_inputs(F=2, P=2, H=60, W=80, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    model = synthetic_body_model()
    betas = (rng.standard_normal((P, 10)) * 0.2).astype(np.float32)
    servers = [SMPLServer.create(model, betas=betas[p]) for p in range(P)]
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)

    cano = np.asarray(canonical_pose_params())
    poses_true = np.tile(cano, (F, P, 1)).astype(np.float32)
    trans_true = np.zeros((F, P, 3), np.float32)
    for p in range(P):
        trans_true[:, p, 0] = -0.5 + p
        trans_true[:, p, 2] = 4.0

    # ground-truth keypoints = projected SMPL joints
    kps = np.zeros((F, P, 17, 3), np.float32)
    for f in range(F):
        for p in range(P):
            out = servers[p](
                jnp.ones(()), jnp.asarray(trans_true[f, p]),
                jnp.asarray(poses_true[f, p]), jnp.asarray(betas[p]),
            )
            j = np.asarray(out["smpl_all_jnts"])[np.asarray(SMPL_TO_COCO17)]
            pix = np.asarray(project(jnp.asarray(j), jnp.asarray(K), jnp.eye(3), jnp.zeros(3)))
            kps[f, p, :, :2] = pix
            kps[f, p, :, 2] = 1.0

    # corrupt initialization
    poses_init = poses_true + rng.standard_normal(poses_true.shape).astype(np.float32) * noise
    trans_init = trans_true + rng.standard_normal(trans_true.shape).astype(np.float32) * 0.1

    images = [np.zeros((H, W, 3), np.uint8) for _ in range(F)]
    inputs = TraceInputs(
        images=images, poses=poses_init, betas=betas, trans=trans_init,
        keypoints_2d=kps, genders=["neutral"] * P, K=K,
    )
    return inputs, servers, poses_true, trans_true


def test_refinement_reduces_keypoint_error():
    inputs, servers, poses_true, trans_true = make_trace_inputs()
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *servers)
    poses, trans, betas = refine_sequence(
        stacked,
        jnp.asarray(inputs.K), jnp.eye(3), jnp.zeros(3),
        jnp.asarray(inputs.poses), jnp.asarray(inputs.trans),
        jnp.asarray(inputs.betas), jnp.asarray(inputs.keypoints_2d),
        RefineConfig(iters=60, lr=0.02),
    )

    def kp_err(poses_arr, trans_arr):
        err = 0.0
        for f in range(2):
            for p in range(2):
                out = servers[p](
                    jnp.ones(()), jnp.asarray(trans_arr[f, p]),
                    jnp.asarray(poses_arr[f, p]), jnp.asarray(inputs.betas[p]),
                )
                j = np.asarray(out["smpl_all_jnts"])[np.asarray(SMPL_TO_COCO17)]
                pix = np.asarray(
                    project(jnp.asarray(j), jnp.asarray(inputs.K), jnp.eye(3), jnp.zeros(3))
                )
                err += np.linalg.norm(pix - inputs.keypoints_2d[f, p, :, :2], axis=-1).mean()
        return err / 4

    err_before = kp_err(inputs.poses, inputs.trans)
    err_after = kp_err(np.asarray(poses), np.asarray(trans))
    assert err_after < err_before * 0.6, (err_before, err_after)


def test_full_pipeline_emits_training_dir(tmp_path):
    inputs, servers, *_ = make_trace_inputs(F=2, P=2)
    out_root = str(tmp_path / "seq")
    preprocess_sequence(out_root, inputs, servers, refine_iters=10)

    for fn in (
        "poses.npy", "normalize_trans.npy", "mean_shape.npy", "gender.npy",
        "cameras.npz", "cameras_normalize.npz", "max_human_sphere.npy",
    ):
        assert os.path.exists(os.path.join(out_root, fn)), fn
    assert os.path.exists(os.path.join(out_root, "image", "0000.png"))
    assert os.path.exists(os.path.join(out_root, "mask", "1", "0001.png"))

    # the emitted directory loads through the training dataset
    from multiply_tpu.data.dataset import Hi4DSequence

    seq = Hi4DSequence(out_root, num_sample=16, using_sam=False)
    assert len(seq) == 2 and seq.num_person == 2
    item = seq.get_train_item(0, np.random.default_rng(0))
    assert item["uv"].shape == (16, 2)
    # masks must be non-trivial (SMPL rendering produced coverage)
    frame = seq.load_frame(0)
    assert frame["mask_union"].sum() > 20
