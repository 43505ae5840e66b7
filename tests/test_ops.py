"""Tests for core ops: positional encoding, density, KNN, skinning."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from multiply_tpu.ops import (
    abs_density,
    embedding_dim,
    knn,
    laplace_beta,
    laplace_density,
    positional_encoding,
    query_skinning_weights,
    skinning,
)
from multiply_tpu.ops.skinning import affine_inverse, inv3x3


def test_positional_encoding_shape_and_order():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((7, 3)).astype(np.float32))
    enc = positional_encoding(x, 6)
    assert enc.shape == (7, embedding_dim(6, 3))
    np.testing.assert_allclose(np.asarray(enc[:, :3]), np.asarray(x))
    # first frequency block: sin(x), cos(x)
    np.testing.assert_allclose(np.asarray(enc[:, 3:6]), np.sin(np.asarray(x)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc[:, 6:9]), np.cos(np.asarray(x)), atol=1e-6)
    # last block uses 2^(multires-1)
    np.testing.assert_allclose(
        np.asarray(enc[:, -3:]), np.cos(32 * np.asarray(x)), atol=1e-5
    )


def test_positional_encoding_identity_when_disabled():
    x = jnp.ones((4, 3))
    assert positional_encoding(x, 0) is x


def test_laplace_density_cdf_form():
    beta = laplace_beta(jnp.asarray(0.1))
    sdf = jnp.asarray([-0.5, -0.01, 0.0, 0.01, 0.5])
    sigma = np.asarray(laplace_density(sdf, beta))
    b = float(beta)
    expected = (1 / b) * np.where(
        np.asarray(sdf) <= 0,
        1 - 0.5 * np.exp(np.asarray(sdf) / b),
        0.5 * np.exp(-np.asarray(sdf) / b),
    )
    np.testing.assert_allclose(sigma, expected, rtol=1e-5)
    assert np.all(np.diff(sigma) < 0)  # monotone decreasing in sdf


def test_abs_density():
    np.testing.assert_allclose(
        np.asarray(abs_density(jnp.asarray([-2.0, 3.0]))), [2.0, 3.0]
    )


def test_knn_against_scipy():
    rng = np.random.default_rng(1)
    refs = rng.standard_normal((500, 3)).astype(np.float32)
    q = rng.standard_normal((200, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(refs), k=4)
    tree = cKDTree(refs)
    d_ref, idx_ref = tree.query(q, k=4)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), d_ref, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)


def test_knn_chunked_matches_unchunked():
    rng = np.random.default_rng(2)
    refs = jnp.asarray(rng.standard_normal((100, 3)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((1000, 3)).astype(np.float32))
    d2a, idxa = knn(q, refs, k=2, chunk_size=128)
    d2b, idxb = knn(q, refs, k=2, chunk_size=10_000)
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idxa), np.asarray(idxb))


def test_inv3x3_and_affine_inverse():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((10, 3, 3)).astype(np.float32) + 2 * np.eye(3)
    np.testing.assert_allclose(
        np.asarray(inv3x3(jnp.asarray(m))), np.linalg.inv(m), rtol=1e-3, atol=1e-4
    )
    tf = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    tf[:, :3, :3] = rng.standard_normal((5, 3, 3)) * 0.3 + np.eye(3)
    tf[:, :3, 3] = rng.standard_normal((5, 3))
    np.testing.assert_allclose(
        np.asarray(affine_inverse(jnp.asarray(tf))),
        np.linalg.inv(tf),
        rtol=1e-3,
        atol=1e-4,
    )


def test_skinning_roundtrip():
    """inverse(skinning(x)) == x when weights are queried in the same space."""
    rng = np.random.default_rng(4)
    J = 24
    # random affine bone transforms near identity
    tfs = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    aa = rng.standard_normal((J, 3)) * 0.2
    from scipy.spatial.transform import Rotation

    tfs[:, :3, :3] = Rotation.from_rotvec(aa).as_matrix()
    tfs[:, :3, 3] = rng.standard_normal((J, 3)) * 0.1

    x = rng.standard_normal((50, 3)).astype(np.float32)
    w = rng.random((50, J)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)

    xd = skinning(jnp.asarray(x), jnp.asarray(w), jnp.asarray(tfs))
    xc = skinning(xd, jnp.asarray(w), jnp.asarray(tfs), inverse=True)
    np.testing.assert_allclose(np.asarray(xc), x, atol=1e-4)


def test_query_skinning_weights_on_vertices():
    """Querying at the verts themselves returns (K=1) the verts' own weights."""
    rng = np.random.default_rng(5)
    verts = rng.standard_normal((100, 3)).astype(np.float32)
    w = rng.random((100, 24)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    weights, outlier = query_skinning_weights(
        jnp.asarray(verts[:20]), jnp.asarray(verts), jnp.asarray(w), k=1
    )
    np.testing.assert_allclose(np.asarray(weights), w[:20], atol=1e-5)
    assert not np.any(np.asarray(outlier))


def test_query_skinning_weights_outlier_mask():
    verts = jnp.zeros((10, 3))
    w = jnp.ones((10, 24)) / 24
    far = jnp.full((3, 3), 5.0)
    _, outlier = query_skinning_weights(far, verts, w, k=1)
    assert np.all(np.asarray(outlier))


def test_skinning_weights_are_stop_grad():
    """Position gradient must flow only through transforms, not KNN weights."""
    verts = jnp.asarray(np.random.default_rng(6).standard_normal((50, 3)).astype(np.float32))
    w = jnp.ones((50, 24)) / 24

    def f(p):
        weights, _ = query_skinning_weights(p, verts, w, k=3)
        return jnp.sum(weights)

    g = jax.grad(f)(jnp.ones((4, 3)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_point_sampler_prims():
    """sampler.py parity: PointInSpace local+global mix; PointOnBones segment
    samples inside [start, end]; joint samples carry one-hot weights."""
    import jax
    import jax.numpy as jnp

    from multiply_tpu.ops.point_sampler import (
        default_bone_ids,
        sample_joints,
        sample_points_in_space,
        sample_points_on_bones,
    )

    key = jax.random.PRNGKey(0)
    pc = jnp.asarray(np.random.default_rng(0).standard_normal((64, 3)), jnp.float32)
    s = sample_points_in_space(key, pc, local_sigma=0.01, global_ratio=0.125)
    assert s.shape == (64 + 8, 3)
    # local samples hug their centers; global ones fill the cube
    assert float(jnp.abs(s[:64] - pc).max()) < 0.08
    assert float(jnp.abs(s[64:]).max()) <= 0.5

    joints = jnp.asarray(np.random.default_rng(1).standard_normal((24, 3)), jnp.float32)
    bones = default_bone_ids()
    assert bones.shape == (23, 2)
    pts, probs = sample_points_on_bones(key, joints, num_per_bone=5)
    assert pts.shape == (23 * 5, 3)
    np.testing.assert_allclose(np.asarray(probs), 0.01)
    # each sample lies on its segment (within jitter): check first bone's span
    seg = np.asarray(pts[:5])
    a, b = np.asarray(joints[bones[0, 0]]), np.asarray(joints[bones[0, 1]])
    d = b - a
    t = (seg - a) @ d / (d @ d)
    assert (t > -1e-3).all() and (t < 1 + 1e-3).all()
    perp = seg - (a + t[:, None] * d)
    assert np.abs(perp).max() < 1e-2

    js, w = sample_joints(joints)
    assert js.shape == (24 + 23, 3) and w.shape == (24 + 23, 24)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0)
    np.testing.assert_allclose(np.asarray(js[:24]), np.asarray(joints))


def test_soa_affine_rows_match_aos():
    """SoA (12,N)-row forms (TPU layout-friendly hot path) agree with the AoS
    4x4 forms: blend, apply, inverse-apply, R^{-1} covector transform."""
    from multiply_tpu.ops.skinning import (
        affine_apply_rows,
        affine_inverse_apply_rows,
        blend_affine_rows,
        blend_transforms,
        covector_apply_rows,
        rotation_inverse_rows,
    )

    rng = np.random.default_rng(3)
    J, N = 24, 40
    tfs = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    tfs[:, :3, :3] += rng.standard_normal((J, 3, 3)).astype(np.float32) * 0.2
    tfs[:, :3, 3] = rng.standard_normal((J, 3)).astype(np.float32)
    w = rng.random((N, J)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    x = rng.standard_normal((N, 3)).astype(np.float32)
    g = rng.standard_normal((N, 3)).astype(np.float32)

    m = blend_affine_rows(jnp.asarray(w), jnp.asarray(tfs))
    wt = np.asarray(blend_transforms(jnp.asarray(w), jnp.asarray(tfs)))
    np.testing.assert_allclose(np.asarray(m).T.reshape(N, 3, 4), wt[:, :3, :], atol=1e-5)

    y = np.einsum("pij,pj->pi", wt[:, :3, :3], x) + wt[:, :3, 3]
    np.testing.assert_allclose(np.asarray(affine_apply_rows(m, jnp.asarray(x))), y, atol=1e-5)

    wti = np.asarray(affine_inverse(jnp.asarray(wt)))
    yi = np.einsum("pij,pj->pi", wti[:, :3, :3], x) + wti[:, :3, 3]
    np.testing.assert_allclose(
        np.asarray(affine_inverse_apply_rows(m, jnp.asarray(x))), yi, atol=1e-4
    )

    n = np.einsum("ni,nij->nj", g, np.asarray(inv3x3(jnp.asarray(wt[:, :3, :3]))))
    np.testing.assert_allclose(
        np.asarray(covector_apply_rows(rotation_inverse_rows(m), jnp.asarray(g))),
        n,
        atol=1e-4,
    )

    # inverse(forward(x)) == x
    rt = np.asarray(affine_inverse_apply_rows(m, affine_apply_rows(m, jnp.asarray(x))))
    np.testing.assert_allclose(rt, x, atol=1e-4)


def test_quat_camera_params():
    """quat<->rot roundtrip vs scipy; the 7-vector pose branch of
    get_camera_params matches the matrix branch (rend_util.py:46-128)."""
    from scipy.spatial.transform import Rotation

    from multiply_tpu.utils.cameras import (
        get_camera_params,
        pose_from_quat7,
        quat_to_rot,
        rot_to_quat,
    )

    rng = np.random.default_rng(7)
    # keep trace(R) > -1 (the reference's single-branch rot_to_quat assumes it)
    rotvec = rng.uniform(-1.2, 1.2, 3)
    R = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
    q_scipy = Rotation.from_rotvec(rotvec).as_quat()  # xyzw
    q_wxyz = np.array([q_scipy[3], *q_scipy[:3]], np.float32)

    np.testing.assert_allclose(np.asarray(quat_to_rot(jnp.asarray(q_wxyz))), R, atol=1e-5)
    q_back = np.asarray(rot_to_quat(jnp.asarray(R)))
    np.testing.assert_allclose(q_back * np.sign(q_back[0]), q_wxyz * np.sign(q_wxyz[0]), atol=1e-5)

    loc = rng.standard_normal(3).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R
    pose[:3, 3] = loc
    pose7 = jnp.asarray(np.concatenate([q_wxyz, loc]))
    np.testing.assert_allclose(np.asarray(pose_from_quat7(pose7)), pose, atol=1e-5)

    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    uv = jnp.asarray(rng.uniform(0, 60, (50, 2)).astype(np.float32))
    d1, c1 = get_camera_params(uv, jnp.asarray(pose), jnp.asarray(K))
    d2, c2 = get_camera_params(uv, pose7, jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
