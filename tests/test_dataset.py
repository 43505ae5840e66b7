"""Hi4D-format dataset loader tests against a fake on-disk sequence."""

import os

import cv2
import numpy as np
import pytest

from multiply_tpu.data.dataset import (
    Hi4DSequence,
    bilinear_sample,
    edge_sampling,
    weighted_sampling,
)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("seq"))
    F, P, H, W = 3, 2, 30, 40
    os.makedirs(os.path.join(root, "image"))
    rng = np.random.default_rng(0)
    for f in range(F):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "image", f"{f:04d}.png"), img)
    for p in range(P):
        d = os.path.join(root, "mask", str(p))
        os.makedirs(d)
        for f in range(F):
            m = np.zeros((H, W), np.uint8)
            m[5 + 5 * p : 20 + 5 * p, 10 + 10 * p : 25 + 10 * p] = 255
            cv2.imwrite(os.path.join(d, f"{f:04d}.png"), m)

    np.save(os.path.join(root, "mean_shape.npy"), rng.standard_normal((P, 10)).astype(np.float32))
    np.save(os.path.join(root, "poses.npy"), rng.standard_normal((F, P, 72)).astype(np.float32) * 0.1)
    np.save(os.path.join(root, "normalize_trans.npy"), rng.standard_normal((F, P, 3)).astype(np.float32))
    np.save(os.path.join(root, "gender.npy"), np.asarray(["male", "female"]))

    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    cams = {}
    for f in range(F):
        Rt = np.eye(4)[:3]
        Rt[:3, 3] = [0, 0, 4.0]
        P34 = K @ Rt
        P44 = np.eye(4, dtype=np.float32)
        P44[:3, :4] = P34
        cams[f"world_mat_{f}"] = P44
        cams[f"scale_mat_{f}"] = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    np.savez(os.path.join(root, "cameras_normalize.npz"), **cams)
    return root, (F, P, H, W)


def test_sequence_loads(fake_root):
    root, (F, P, H, W) = fake_root
    seq = Hi4DSequence(root, num_sample=32, using_sam=False)
    assert len(seq) == F
    assert seq.num_person == P
    assert seq.img_size == (H, W)
    assert seq.genders == ["male", "female"]
    np.testing.assert_allclose(seq.scale, 0.5)


def test_train_item_shapes_and_bbox_bias(fake_root):
    root, (F, P, H, W) = fake_root
    seq = Hi4DSequence(root, num_sample=64, using_sam=False)
    rng = np.random.default_rng(1)
    item = seq.get_train_item(1, rng)
    assert item["uv"].shape == (64, 2)
    assert item["rgb"].shape == (64, 3)
    assert item["smpl_pose"].shape == (P, 72)
    assert item["smpl_trans"].shape == (P, 3)
    assert item["is_certain"] is True
    # 90% of samples inside the union-mask bbox region
    uv = item["uv"]
    inside = (
        (uv[:, 0] >= 9) & (uv[:, 0] <= 36) & (uv[:, 1] >= 4) & (uv[:, 1] <= 26)
    ).mean()
    assert inside >= 0.85


def test_eval_item_full_grid(fake_root):
    root, (F, P, H, W) = fake_root
    seq = Hi4DSequence(root, num_sample=-1, using_sam=False)
    item = seq.get_eval_item(0)
    assert item["uv"].shape == (H * W, 2)
    assert item["rgb"].shape == (H * W, 3)
    assert len(item["masks"]) == P


def test_sam_pickup_and_certainty(fake_root, tmp_path):
    root, (F, P, H, W) = fake_root
    run_dir = str(tmp_path)
    seq = Hi4DSequence(root, num_sample=32, using_sam=True, run_dir=run_dir)

    # fabricate stage artifacts: frame 2's SAM disagrees with the SMPL mask
    smpl = np.zeros((F, P, H, W), bool)
    smpl[:, 0, 5:20, 10:25] = True
    smpl[:, 1, 10:25, 20:35] = True
    sam = np.where(smpl, 8.0, -8.0).astype(np.float32)
    sam[2] = -8.0  # total disagreement
    os.makedirs(os.path.join(run_dir, "stage_instance_mask", "00000"))
    os.makedirs(os.path.join(run_dir, "stage_sam_mask", "00000"))
    np.save(os.path.join(run_dir, "stage_instance_mask", "00000", "all_person_smpl_mask.npy"), smpl)
    np.save(os.path.join(run_dir, "stage_sam_mask", "00000", "sam_opt_mask.npy"), sam)

    rng = np.random.default_rng(2)
    item = seq.get_train_item(0, rng)
    assert "sam_mask" in item and item["sam_mask"].shape == (32, P)
    assert item["is_certain"] is True
    item2 = seq.get_train_item(2, rng)
    assert item2["is_certain"] is False  # lowest IoU frame flagged uncertain
    # uncertain frame gets edge-sampled alternatives
    assert "edge_uv" in item2 and "edge_rgb" in item2


def test_bilinear_sample_exact_at_integers():
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    vals = bilinear_sample(img, np.asarray([0.0, 1.0, 1.5]), np.asarray([0.0, 2.0, 1.5]))
    np.testing.assert_allclose(vals, [0.0, 6.0, 7.5])


def test_novel_view_cameras(fake_root):
    """Hi4D.py:387-431 parity: when the training camera equals the GT
    'current' view, the derived camera must be exactly the GT target view
    (re-normalized by the scene scale_mat)."""
    from multiply_tpu.data.dataset import novel_view_cameras
    from multiply_tpu.utils.cameras import load_K_Rt_from_P

    root, (F, P, H, W) = fake_root
    seq = Hi4DSequence(root, num_sample=32, using_sam=False)

    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    E_cur = np.eye(4)[:3].copy()
    E_cur[:3, 3] = [0, 0, 4.0]  # == the fake training camera
    # held-out view: rotated 90 deg about y, different focal
    c, s = 0.0, 1.0
    E_tgt = np.array([[c, 0, s, 0.5], [0, 1, 0, 0.0], [-s, 0, c, 4.0]])
    K_tgt = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
    gt = {
        "ids": np.array([4, 88]),
        "intrinsics": np.stack([K, K_tgt]),
        "extrinsics": np.stack([E_cur, E_tgt]),
    }

    cams = novel_view_cameras(seq, gt, current_view=4, novel_view=88)
    assert len(cams) == F
    scale_mat = np.diag([2.0, 2.0, 2.0, 1.0])
    expected = np.eye(4)
    expected[:3, :4] = K_tgt @ E_tgt  # scale_factor == 1, Rab == I
    expected = expected @ scale_mat
    np.testing.assert_allclose(cams[0]["P"], expected.astype(np.float32), atol=1e-4)
    # decomposition is consistent with the returned P
    intr, pose = load_K_Rt_from_P(cams[0]["P"][:3, :4])
    np.testing.assert_allclose(intr[:3, :3], cams[0]["intrinsics"], atol=1e-4)
    np.testing.assert_allclose(pose, cams[0]["pose"], atol=1e-4)
    # camera center moved off the +z axis (it is a genuinely new view)
    assert abs(cams[0]["pose"][0, 3]) > 0.1


def test_layout_errors_are_actionable(fake_root, tmp_path):
    """Every missing/misshapen file raises FileNotFoundError naming the file
    and the expected layout (docs/REAL_DATA.md) — first contact with real
    data must fail loudly, not deep in training."""
    import shutil

    root, (F, P, H, W) = fake_root

    with pytest.raises(FileNotFoundError, match="does not exist"):
        Hi4DSequence(str(tmp_path / "nope"), using_sam=False)

    empty = tmp_path / "empty"
    (empty / "image").mkdir(parents=True)
    with pytest.raises(FileNotFoundError, match="image/"):
        Hi4DSequence(str(empty), using_sam=False)

    def clone():
        dst = tmp_path / f"c{len(list(tmp_path.iterdir()))}"
        shutil.copytree(root, dst)
        return dst

    c = clone()
    os.remove(c / "mean_shape.npy")
    with pytest.raises(FileNotFoundError, match="mean_shape.npy"):
        Hi4DSequence(str(c), using_sam=False)

    c = clone()
    np.save(c / "poses.npy", np.zeros((F, P, 69), np.float32))
    with pytest.raises(FileNotFoundError, match="expected 72"):
        Hi4DSequence(str(c), using_sam=False)

    c = clone()
    np.save(c / "poses.npy", np.zeros((F - 2, P, 72), np.float32))
    with pytest.raises(FileNotFoundError, match="poses.npy"):
        Hi4DSequence(str(c), using_sam=False)

    c = clone()
    np.save(c / "mean_shape.npy", np.zeros((P + 1, 10), np.float32))
    with pytest.raises(FileNotFoundError, match="persons"):
        Hi4DSequence(str(c), using_sam=False)

    c = clone()
    os.remove(c / "mask" / "0" / "0002.png")
    with pytest.raises(FileNotFoundError, match="mask dir"):
        Hi4DSequence(str(c), using_sam=False)

    c = clone()
    cams = dict(np.load(c / "cameras_normalize.npz"))
    del cams["world_mat_1"]
    np.savez(c / "cameras_normalize.npz", **cams)
    with pytest.raises(FileNotFoundError, match="world_mat_1"):
        Hi4DSequence(str(c), using_sam=False)

    with pytest.raises(FileNotFoundError, match="end_frame"):
        Hi4DSequence(root, end_frame=F + 5, using_sam=False)


def test_make_scene_disk_cache(tmp_path):
    """make_scene writes an npz cache keyed by generation params and the
    cached load reproduces the arrays exactly (servers rebuilt from betas)."""
    from multiply_tpu.data.synthetic import make_scene

    cache = str(tmp_path / "scene_cache")
    a = make_scene(num_frames=1, num_persons=2, height=16, width=20,
                   cache_dir=cache)
    files = os.listdir(cache)
    from multiply_tpu.data.synthetic import SCENE_CACHE_VERSION

    assert files == [f"scene_v{SCENE_CACHE_VERSION}_f1_p2_16x20_s0.npz"]
    b = make_scene(num_frames=1, num_persons=2, height=16, width=20,
                   cache_dir=cache)
    for k in ("images", "masks", "sam_logits", "poses", "transl", "betas",
              "scale", "cam_pose", "intrinsics"):
        np.testing.assert_array_equal(getattr(a, k), getattr(b, k))
    assert (a.height, a.width) == (b.height, b.width)
    assert len(b.servers) == 2
    np.testing.assert_allclose(
        np.asarray(a.servers[0].verts_c), np.asarray(b.servers[0].verts_c)
    )
    # different params -> different cache entry, no collision
    c = make_scene(num_frames=2, num_persons=2, height=16, width=20,
                   cache_dir=cache)
    assert c.images.shape[0] == 2
    assert len(os.listdir(cache)) == 2
