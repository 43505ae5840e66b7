"""Tests for depth-order / interpenetration losses and preprocessing utils."""

import jax
import jax.numpy as jnp
import numpy as np

from multiply_tpu.engine.pose_losses import (
    interpenetration_loss,
    sparse_depth_order_loss,
    winding_inside,
)
from test_mesh_ops import icosphere


def test_winding_inside_sphere():
    verts, faces = icosphere(1)
    pts = np.array(
        [[0, 0, 0], [0.5, 0, 0], [0, 0.9, 0], [1.5, 0, 0], [0, 0, -2.0]], np.float32
    )
    inside = np.asarray(
        winding_inside(jnp.asarray(pts), jnp.asarray(verts), jnp.asarray(faces))
    )
    assert inside.tolist() == [True, True, True, False, False]


def test_interpenetration_loss_zero_when_separate():
    verts, faces = icosphere(1)
    v1 = jnp.asarray(verts)
    v2 = jnp.asarray(verts + np.array([5.0, 0, 0], np.float32))
    f = jnp.asarray(faces)
    loss = interpenetration_loss([v1, v2], [f, f], jax.random.PRNGKey(0), num_samples=64)
    assert float(loss) == 0.0


def test_interpenetration_loss_positive_when_overlapping():
    # shallow overlap: the loss only pulls points within 0.1 of the partner's
    # surface (the reference's stable-point gate, multiply_model.py:544-546),
    # so the mesh must be fine enough for nearest-vertex ~ surface distance
    verts, faces = icosphere(3)
    v1 = jnp.asarray(verts)
    v2 = jnp.asarray(verts + np.array([1.9, 0, 0], np.float32))
    f = jnp.asarray(faces)
    loss = interpenetration_loss(
        [v1, v2], [f, f], jax.random.PRNGKey(0), num_samples=642
    )
    assert float(loss) > 0.0


def test_depth_order_loss_detects_wrong_order():
    """Two spheres along +z; SAM says the far one owns the pixel -> loss > 0,
    with gradients pulling the owner forward."""
    verts, faces = icosphere(1)
    near = jnp.asarray(verts * 0.5 + np.array([0, 0, 2.0], np.float32))
    far = jnp.asarray(verts * 0.5 + np.array([0, 0, 4.0], np.float32))
    f = jnp.asarray(faces)

    n = 8
    ray_o = jnp.zeros((n, 3))
    ray_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    # SAM assigns all pixels to person 1 (the far sphere)
    sam = jnp.broadcast_to(jnp.asarray([0.02, 0.95]), (n, 2))

    def loss_fn(v_far):
        loss, frac = sparse_depth_order_loss(ray_o, ray_d, [near, v_far], [f, f], sam)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(far)
    assert float(loss) > 0.0
    assert np.abs(np.asarray(g)).max() > 0.0

    # correct ordering -> no disagreement pixels -> zero loss
    loss_ok, _ = sparse_depth_order_loss(ray_o, ray_d, [near, far], [f, f],
                                         jnp.broadcast_to(jnp.asarray([0.95, 0.02]), (n, 2)))
    assert float(loss_ok) == 0.0


def test_rot6d_roundtrip():
    from multiply_tpu.preprocessing.rotations import (
        axis_angle_to_matrix,
        matrix_to_axis_angle,
        matrix_to_rot6d,
        rot6d_to_matrix,
    )

    rng = np.random.default_rng(0)
    aa = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
    R = axis_angle_to_matrix(aa)
    np.testing.assert_allclose(
        np.asarray(rot6d_to_matrix(matrix_to_rot6d(R))), np.asarray(R), atol=1e-5
    )
    aa2 = matrix_to_axis_angle(R)
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_matrix(aa2)), np.asarray(R), atol=1e-3
    )


def test_matching_and_nms():
    from multiply_tpu.preprocessing.matching import (
        match_detections_to_tracks,
        skeleton_nms,
    )

    rng = np.random.default_rng(1)
    base = rng.uniform(100, 200, (17, 2))
    det1 = np.concatenate([base, np.ones((17, 1))], -1)
    det_dup = det1 + rng.normal(0, 2, det1.shape) * [1, 1, 0]
    det2 = det1 + np.array([300.0, 0, 0])
    kept = skeleton_nms([det1, det_dup, det2])
    assert len(kept) == 2

    tracks = np.stack([base.mean(0), base.mean(0) + [300, 0]])
    match = match_detections_to_tracks(kept, tracks)
    assert match[0] is not None and match[1] is not None
    # a far-away track gets no match
    match2 = match_detections_to_tracks(kept, np.asarray([[5000.0, 5000.0]]))
    assert match2 == [None]


def test_pnp_translation():
    import cv2

    from multiply_tpu.preprocessing.cameras import estimate_translation_pnp

    rng = np.random.default_rng(2)
    j3d = rng.uniform(-0.5, 0.5, (20, 3))
    t_true = np.array([0.3, -0.2, 4.0])
    K = np.array([[500, 0, 256], [0, 500, 256], [0, 0, 1.0]])
    cam = j3d + t_true
    pix = (cam @ K.T)
    pix = pix[:, :2] / pix[:, 2:3]
    t_est = estimate_translation_pnp(j3d, pix, K)
    np.testing.assert_allclose(t_est, t_true, atol=0.05)


def test_camera_normalization():
    from multiply_tpu.preprocessing.cameras import normalize_cameras

    K = np.array([[500, 0, 256], [0, 500, 256], [0, 0, 1.0]])
    Rt = np.eye(4)[:3]
    Rt[:3, 3] = [0, 0, 6.0]
    P = K @ Rt
    out = normalize_cameras({"cam_0": P, "cam_1": P}, max_human_sphere=2.0)
    s = out["scale_mat_0"][0, 0]
    # camera at distance 6 -> radius 6.6 -> scale 6.6/3 = 2.2
    np.testing.assert_allclose(s, 2.2, atol=1e-5)
    assert "world_mat_1" in out
