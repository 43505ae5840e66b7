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


def _raw_trace_npz(path, inputs, servers, frame_offset=5):
    """Write a raw TRACE-format npz (flat per-detection arrays +
    reorganize_idx/track_ids) from TraceInputs ground truth, with detection
    order shuffled within frames to exercise the track-id reorg."""
    from multiply_tpu.preprocessing.trace import TRACE_TO_COCO17

    F, P = inputs.poses.shape[:2]
    rng = np.random.default_rng(3)
    reorganize_idx, track_ids = [], []
    thetas, betas, cam, j3d, pj2d = [], [], [], [], []
    for f in range(F):
        for p in rng.permutation(P):
            reorganize_idx.append(frame_offset + f)  # arbitrary frame ids
            track_ids.append(int(p) + 1)  # TRACE ids are 1-based
            thetas.append(inputs.poses[f, p])
            betas.append(inputs.betas[p])
            cam.append(inputs.trans[f, p])
            j3d.append(np.zeros((44, 3), np.float32))
            pj = np.zeros((44, 2), np.float32)
            pj[np.asarray(TRACE_TO_COCO17)] = inputs.keypoints_2d[f, p, :, :2]
            pj2d.append(pj)
    outputs = {
        "reorganize_idx": np.asarray(reorganize_idx),
        "track_ids": np.asarray(track_ids),
        "smpl_thetas": np.stack(thetas),
        "smpl_betas": np.stack(betas),
        "cam_trans": np.stack(cam),
        "j3d": np.stack(j3d),
        "pj2d_org": np.stack(pj2d),
    }
    np.savez(path, outputs=outputs)


def test_trace_reformat_roundtrip(tmp_path):
    """aitcamera.py:101-172 parity: flat TRACE detections reorganize into
    [person, frame] arrays keyed by track id, regardless of detection order."""
    import cv2

    from multiply_tpu.preprocessing.trace import trace_inputs_from_files

    inputs, servers, *_ = make_trace_inputs(F=3, P=2)
    npz = str(tmp_path / "trace.npz")
    _raw_trace_npz(npz, inputs, servers)
    frames = tmp_path / "frames"
    frames.mkdir()
    for f, img in enumerate(inputs.images):
        cv2.imwrite(str(frames / f"{f:04d}.png"), img)

    got = trace_inputs_from_files(npz, str(frames), K=inputs.K)
    np.testing.assert_allclose(got.poses, inputs.poses, atol=1e-6)
    np.testing.assert_allclose(got.trans, inputs.trans, atol=1e-6)
    np.testing.assert_allclose(got.betas, inputs.betas, atol=1e-6)
    np.testing.assert_allclose(
        got.keypoints_2d[..., :2], inputs.keypoints_2d[..., :2], atol=1e-4
    )
    assert (got.keypoints_2d[..., 2] > 0).all()
    assert len(got.images) == 3


def test_keypoint_matching_overrides_tracked(tmp_path):
    """ViTPose npys (multi-detection, shuffled, one duplicate) match to the
    right tracks via NMS + Hungarian (vitpose_trace.py:206-269)."""
    from multiply_tpu.preprocessing.trace import load_keypoint_npys

    inputs, *_ = make_trace_inputs(F=2, P=2)
    tracked = inputs.keypoints_2d
    kp_dir = tmp_path / "kp"
    kp_dir.mkdir()
    rng = np.random.default_rng(0)
    refined = tracked + 0.0
    refined[..., :2] += 3.0  # "better" detections, slightly shifted
    for f in range(2):
        dup = refined[f, 1].copy()  # low-confidence duplicate of person 1
        dup[:, :2] += 0.01
        dup[:, 2] = 0.4
        dets = [refined[f, 1], refined[f, 0], dup]
        np.save(str(kp_dir / f"{f:04d}.npy"), np.stack(dets))

    # small synthetic image: persons sit ~20px apart, inside the full-res NMS
    # defaults — tighten the duplicate thresholds accordingly
    out = load_keypoint_npys(
        str(kp_dir), tracked, nms_center_px=2.0, nms_kp_px=2.0
    )
    np.testing.assert_allclose(out[0, 0], refined[0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1, 1], refined[1, 1], atol=1e-5)


def test_cli_driver_end_to_end(tmp_path):
    """python -m multiply_tpu.preprocessing: TRACE npz + frames -> a
    training directory Hi4DSequence loads (run_preprocessing_multiply.sh
    stages reformat->mask->refine->final->normalize)."""
    import cv2

    from multiply_tpu.preprocessing.__main__ import main as preprocess_main

    inputs, servers, *_ = make_trace_inputs(F=2, P=2)
    npz = str(tmp_path / "trace.npz")
    _raw_trace_npz(npz, inputs, servers)
    frames = tmp_path / "frames"
    frames.mkdir()
    for f, img in enumerate(inputs.images):
        cv2.imwrite(str(frames / f"{f:04d}.png"), img)
    out_root = str(tmp_path / "data")

    preprocess_main(
        [
            "--trace", npz, "--frames", str(frames), "--out", out_root,
            "--focal", "80", "--center", "40", "30",
            "--refine_iters", "10", "--scale_factor", "1",
        ]
    )

    from multiply_tpu.data.dataset import Hi4DSequence

    seq = Hi4DSequence(out_root, num_sample=16, using_sam=False)
    assert len(seq) == 2 and seq.num_person == 2
    assert seq.load_frame(0)["mask_union"].sum() > 20


def test_openpose25_pipeline(tmp_path):
    """BODY_25 keypoints drive the same pipeline (reference
    run_openpose_multiple_trace.py path): TRACE pj2d maps through
    SMPL_TO_OPENPOSE25 (ignored/unmapped joints zero-confidence) and the
    refinement uses the 25-kpt joint map."""
    import cv2

    from multiply_tpu.preprocessing.trace import (
        TRACE_TO_OPENPOSE25,
        trace_inputs_from_files,
    )

    inputs, servers, *_ = make_trace_inputs(F=2, P=2)
    npz = str(tmp_path / "trace.npz")
    _raw_trace_npz(npz, inputs, servers)
    frames = tmp_path / "frames"
    frames.mkdir()
    for f, img in enumerate(inputs.images):
        cv2.imwrite(str(frames / f"{f:04d}.png"), img)

    got = trace_inputs_from_files(
        npz, str(frames), K=inputs.K, kp_format="openpose25"
    )
    assert got.keypoints_2d.shape == (2, 2, 25, 3)
    has = np.asarray(TRACE_TO_OPENPOSE25) >= 0
    assert (got.keypoints_2d[..., ~has, 2] == 0).all()
    # mapped joints carry pixel coords wherever the raw pj2d was filled; the
    # test npz fills only the COCO-17 indices, so just check shape/validity
    assert np.isfinite(got.keypoints_2d).all()

    out_root = str(tmp_path / "data")
    preprocess_sequence(out_root, got, servers, refine_iters=5, scale_factor=1)
    assert os.path.exists(os.path.join(out_root, "cameras_normalize.npz"))


def test_vitpose_wrapper_detect_and_track():
    """VitPoseDetector on a tiny random-init model: full pre/post-processing
    path (bbox prompts -> (17,3) detections) + NMS/Hungarian track matching
    (vitpose_trace.py:137-299 semantics). Skips when transformers lacks
    VitPose."""
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "VitPoseForPoseEstimation"):
        pytest.skip("transformers without VitPose")
    from transformers import VitPoseConfig
    from transformers.models.vitpose_backbone import VitPoseBackboneConfig

    from multiply_tpu.preprocessing.trace import vitpose_keypoints
    from multiply_tpu.preprocessing.vitpose import VitPoseDetector

    backbone = VitPoseBackboneConfig(
        image_size=[64, 48], patch_size=[16, 16], hidden_size=32,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
    )
    cfg = VitPoseConfig(backbone_config=backbone, num_labels=17)
    det = VitPoseDetector(config=cfg)

    H, W = 96, 128
    img = np.zeros((H, W, 3), np.uint8)
    boxes = np.array([[10, 10, 40, 70], [70, 12, 40, 70]], np.float32)
    dets = det(img, boxes)
    assert len(dets) == 2
    for d in dets:
        assert d.shape == (17, 3)
        assert np.isfinite(d).all()
        # keypoints land inside (padded) image space
        assert (d[:, 0] > -W).all() and (d[:, 0] < 2 * W).all()

    # frame loop: TRACE anchors -> boxes -> detections matched back to tracks
    tracked = np.zeros((1, 2, 17, 3), np.float32)
    tracked[0, 0, :, 0] = 30.0
    tracked[0, 0, :, 1] = np.linspace(15, 75, 17)
    tracked[0, 1, :, 0] = 90.0
    tracked[0, 1, :, 1] = np.linspace(15, 75, 17)
    tracked[..., 2] = 1.0
    out = vitpose_keypoints([img], tracked, detector=det)
    assert out.shape == (1, 2, 17, 3)
    assert np.isfinite(out).all()


def test_video_driver_with_stub_binaries(tmp_path, monkeypatch):
    """--video runs the ffmpeg + trace2 stages (run_preprocessing_multiply.sh
    :23-26) through subprocess: stub executables on PATH record their argv and
    emit the prepared frames/npz, and the driver completes end-to-end from
    'a raw video' to a loadable training directory."""
    import cv2

    from multiply_tpu.preprocessing.__main__ import main as preprocess_main

    inputs, servers, *_ = make_trace_inputs(F=2, P=2)
    src = tmp_path / "src"
    src.mkdir()
    _raw_trace_npz(str(src / "trace.npz"), inputs, servers)
    for f, img in enumerate(inputs.images):
        cv2.imwrite(str(src / f"{f:04d}.png"), img)

    # stub binaries: record argv, produce the prepared artifacts
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    calls = tmp_path / "calls.log"
    ffmpeg = bin_dir / "ffmpeg"
    ffmpeg.write_text(
        "#!/bin/sh\n"
        f'echo "ffmpeg $@" >> {calls}\n'
        # last arg is the %04d.png output pattern -> its dirname
        'for last; do :; done\n'
        f'cp {src}/*.png "$(dirname "$last")/"\n'
    )
    trace2 = bin_dir / "trace2"
    trace2.write_text(
        "#!/bin/sh\n"
        f'echo "trace2 $@" >> {calls}\n'
        'for a; do case "$a" in --results_save_dir=*) d=${a#*=};; esac; done\n'
        f'cp {src}/trace.npz "$d/"\n'
    )
    ffmpeg.chmod(0o755)
    trace2.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    out_root = str(tmp_path / "data")
    preprocess_main(
        [
            "--video", str(tmp_path / "raw.mp4"),
            "--trace", str(tmp_path / "work" / "trace.npz"),
            "--frames", str(tmp_path / "frames"),
            "--out", out_root,
            "--time_start", "00:00:00", "--time_duration", "00:00:15",
            "--focal", "80", "--center", "40", "30",
            "--refine_iters", "5", "--scale_factor", "1",
        ]
    )

    logged = calls.read_text()
    assert "-ss 00:00:00" in logged and "-t 00:00:15" in logged
    assert "-vsync 0" in logged
    assert "--subject_num=2" in logged and "--time2forget=40" in logged

    from multiply_tpu.data.dataset import Hi4DSequence

    seq = Hi4DSequence(out_root, num_sample=16, using_sam=False)
    assert len(seq) == 2 and seq.num_person == 2


def test_video_driver_missing_binary_message(tmp_path, monkeypatch):
    """Without ffmpeg on PATH, --video fails with an actionable error
    (external binaries are not vendored, exactly as in the reference)."""
    import pytest as _pytest

    from multiply_tpu.preprocessing.video import MissingBinaryError, extract_frames

    monkeypatch.setenv("PATH", str(tmp_path))
    with _pytest.raises(MissingBinaryError, match="ffmpeg"):
        extract_frames(str(tmp_path / "v.mp4"), str(tmp_path / "frames"))
