"""Golden tests for the JAX SMPL body model (vs. independent numpy references)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from multiply_tpu.body import (
    BodyParamTable,
    SMPLServer,
    canonical_pose_params,
    lbs,
    rodrigues,
    synthetic_body_model,
)
from multiply_tpu.body.smpl import NUM_JOINTS, SMPL_PARENTS


@pytest.fixture(scope="module")
def model():
    return synthetic_body_model()


def test_rodrigues_matches_scipy():
    rng = np.random.default_rng(0)
    aa = rng.standard_normal((32, 3)).astype(np.float32)
    ours = np.asarray(rodrigues(jnp.asarray(aa)))
    ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_rodrigues_zero_pose_identity():
    out = np.asarray(rodrigues(jnp.zeros((4, 3))))
    np.testing.assert_allclose(out, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)


def test_lbs_zero_pose_is_template(model):
    betas = jnp.zeros((10,))
    out = lbs(model, betas, jnp.zeros((NUM_JOINTS * 3,)), pose_blend=False)
    np.testing.assert_allclose(
        np.asarray(out["verts"]), np.asarray(model.v_template), atol=1e-5
    )
    # per-vertex transforms should be identity
    np.testing.assert_allclose(
        np.asarray(out["T"]),
        np.broadcast_to(np.eye(4), out["T"].shape),
        atol=1e-5,
    )


def test_lbs_global_rotation_rotates_everything(model):
    """Pure global orient = rigid rotation about the root joint."""
    betas = jnp.zeros((10,))
    pose = np.zeros(NUM_JOINTS * 3, np.float32)
    pose[:3] = [0.3, -0.2, 0.5]
    out = lbs(model, betas, jnp.asarray(pose), pose_blend=False)
    rest = lbs(model, betas, jnp.zeros(NUM_JOINTS * 3), pose_blend=False)

    R = Rotation.from_rotvec(pose[:3]).as_matrix()
    root = np.asarray(rest["joints"][0])
    expected = (np.asarray(rest["verts"]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(out["verts"]), expected, atol=1e-4)


def test_lbs_shape_blend(model):
    rng = np.random.default_rng(1)
    betas = rng.standard_normal(10).astype(np.float32)
    out = lbs(model, jnp.asarray(betas), jnp.zeros(NUM_JOINTS * 3), pose_blend=False)
    expected = np.asarray(model.v_template) + np.einsum(
        "l,mkl->mk", betas, np.asarray(model.shapedirs)
    )
    np.testing.assert_allclose(np.asarray(out["verts"]), expected, atol=1e-4)


def test_lbs_chain_against_numpy_reference(model):
    """Full LBS vs a direct numpy forward-kinematics implementation."""
    rng = np.random.default_rng(2)
    betas = (rng.standard_normal(10) * 0.5).astype(np.float32)
    pose = (rng.standard_normal(NUM_JOINTS * 3) * 0.3).astype(np.float32)

    out = lbs(model, jnp.asarray(betas), jnp.asarray(pose), pose_blend=True)

    # numpy reference
    v_t = np.asarray(model.v_template)
    v_shaped = v_t + np.einsum("l,mkl->mk", betas, np.asarray(model.shapedirs))
    J = np.asarray(model.joint_regressor) @ v_shaped
    R = Rotation.from_rotvec(pose.reshape(-1, 3)).as_matrix()
    pose_feat = (R[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (pose_feat @ np.asarray(model.posedirs)).reshape(-1, 3)

    # forward kinematics
    G = np.zeros((NUM_JOINTS, 4, 4))
    for j in range(NUM_JOINTS):
        p = SMPL_PARENTS[j]
        local = np.eye(4)
        local[:3, :3] = R[j]
        local[:3, 3] = J[j] - (J[p] if p >= 0 else 0)
        G[j] = (G[p] @ local) if p >= 0 else local
    A = G.copy()
    for j in range(NUM_JOINTS):
        A[j, :3, 3] -= G[j, :3, :3] @ J[j]
    W = np.asarray(model.lbs_weights)
    T = np.einsum("vj,jab->vab", W, A)
    verts_ref = np.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]

    np.testing.assert_allclose(np.asarray(out["verts"]), verts_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["A"]), A, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["joints"]), G[:, :3, 3], atol=2e-4
    )


def test_server_canonical_identity_tfs(model):
    """In the canonical pose, relative bone transforms are the identity."""
    server = SMPLServer.create(model, betas=np.zeros(10))
    out = server(jnp.ones(()), jnp.zeros(3), canonical_pose_params())
    np.testing.assert_allclose(
        np.asarray(out["smpl_tfs"]),
        np.broadcast_to(np.eye(4), (NUM_JOINTS, 4, 4)),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["smpl_verts"]), np.asarray(server.verts_c), atol=1e-5
    )


def test_server_scale_transl(model):
    server = SMPLServer.create(model, betas=np.zeros(10))
    scale, transl = 2.0, np.array([0.5, -1.0, 0.25], np.float32)
    out = server(jnp.asarray(scale), jnp.asarray(transl), canonical_pose_params())
    expected = np.asarray(server.verts_c) * scale + transl * scale
    np.testing.assert_allclose(np.asarray(out["smpl_verts"]), expected, atol=1e-4)


def test_server_tfs_map_canonical_to_posed(model):
    """x_posed == blend(W, tfs) @ x_canonical for SMPL verts.

    Exact only for one-hot skinning weights: blending *relative* transforms
    commutes with the canonical warp per joint, not across joints (the same
    approximation the reference deformer makes; real SMPL weights are nearly
    one-hot). So test on a one-hot-weight variant of the synthetic model.
    """
    from multiply_tpu.ops.skinning import skinning

    w = np.asarray(model.lbs_weights)
    onehot = np.zeros_like(w)
    onehot[np.arange(w.shape[0]), w.argmax(axis=1)] = 1.0
    model_oh = model._replace(lbs_weights=jnp.asarray(onehot))

    server = SMPLServer.create(model_oh, betas=np.zeros(10))
    rng = np.random.default_rng(3)
    thetas = jnp.asarray((rng.standard_normal(72) * 0.3).astype(np.float32))
    out = server(jnp.ones(()), jnp.zeros(3), thetas)

    moved = skinning(server.verts_c, server.weights_c, out["smpl_tfs"])
    # residual = pose-blend offset difference between the two poses; synthetic
    # posedirs are tiny so this holds tightly
    np.testing.assert_allclose(
        np.asarray(moved), np.asarray(out["smpl_verts"]), atol=2e-3
    )


def test_body_param_table_lookup():
    table = BodyParamTable.create(5, body_pose=np.arange(5 * 69).reshape(5, 69))
    row = table.lookup(3)
    assert row["body_pose"].shape == (69,)
    np.testing.assert_allclose(np.asarray(row["body_pose"])[0], 3 * 69)
    assert table.thetas(2).shape == (72,)


def test_lbs_jit_and_vmap(model):
    batched = jax.jit(
        jax.vmap(lambda b, p: lbs(model, b, p)["verts"], in_axes=(0, 0))
    )
    out = batched(jnp.zeros((4, 10)), jnp.zeros((4, NUM_JOINTS * 3)))
    assert out.shape == (4, model.num_verts, 3)


def test_load_smpl_model_real_format_pkl(tmp_path):
    """load_smpl_model against a pickle in the real MPI SMPL v1.x layout:
    chumpy-wrapped arrays (py2 protocol), scipy-sparse J_regressor,
    (V, 3, 207) posedirs, latin1-encoded — the loader must reproduce the
    source model's LBS output exactly (body_models.py:118-135 parity)."""
    import pickle
    import sys
    import types

    import scipy.sparse

    from multiply_tpu.body.smpl import load_smpl_model, lbs, synthetic_body_model

    src = synthetic_body_model()
    V = src.num_verts

    # fake chumpy module so the dump references chumpy.ch.Ch like real pkls
    ch_mod = types.ModuleType("chumpy.ch")

    class Ch:
        pass

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    ch_mod.Ch = Ch
    root = types.ModuleType("chumpy")
    root.ch = ch_mod
    root.Ch = Ch
    sys.modules.setdefault("chumpy", root)
    sys.modules.setdefault("chumpy.ch", ch_mod)

    def chump(arr):
        o = Ch()
        o.x = np.asarray(arr, np.float64)  # MPI pkls store float64
        return o

    data = {
        "v_template": chump(src.v_template),
        "shapedirs": chump(np.asarray(src.shapedirs)),
        # internal ((J-1)*9, V*3) -> MPI (V, 3, (J-1)*9)
        "posedirs": chump(np.asarray(src.posedirs).T.reshape(V, 3, -1)),
        "J_regressor": scipy.sparse.csc_matrix(np.asarray(src.joint_regressor)),
        "weights": chump(src.lbs_weights),
        "f": np.asarray(src.faces, np.uint32),
        "kintree_table": np.zeros((2, 24), np.int64),  # present in real pkls
        "bs_style": "lbs",
    }
    path = tmp_path / "SMPL_NEUTRAL.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f, protocol=2)
    for m in ("chumpy", "chumpy.ch"):
        sys.modules.pop(m, None)

    # direct file path and gendered directory layout both load
    loaded = load_smpl_model(str(path))
    loaded_dir = load_smpl_model(str(tmp_path), gender="neutral")

    rng = np.random.default_rng(0)
    betas = jnp.asarray(rng.standard_normal(10) * 0.3, jnp.float32)
    pose = jnp.asarray(rng.standard_normal(72) * 0.2, jnp.float32)
    ref = lbs(src, betas, pose)
    for model in (loaded, loaded_dir):
        out = lbs(model, betas, pose)
        np.testing.assert_allclose(
            np.asarray(out["verts"]), np.asarray(ref["verts"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["joints"]), np.asarray(ref["joints"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["T"]), np.asarray(ref["T"]), atol=1e-5
        )
