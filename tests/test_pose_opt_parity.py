"""Process parity for the POSE-OPT phase losses vs the actual reference
implementation (VERDICT r4 item 6).

The joint-mode e2e harness (test_e2e_parity.py) never exercises the
depth-order / silhouette / interpenetration machinery — the one place our
TPU-first design intentionally diverges (sparse differentiable ray-mesh
intersection vs the reference's full-image PyTorch3D rasterization,
multiply_model.py:578-736 / :521-551). This module runs the reference's OWN
methods (MultiplyModel.get_depth_order_loss / get_interpenetration_loss,
imported from /root/reference/code) on functional CPU stubs
(tests/ref_process/p3d_render_stub.py implements the pytorch3d renderer
surface with differentiable zbuf), feeds both sides one fixed
mesh/pose/camera/SAM configuration, and asserts:

  * interpenetration: value parity (same KNN + inside-test math, matched
    sample indices) and gradient-direction parity w.r.t. per-person transl;
  * depth-order: our all-pixel sparse evaluation reproduces the reference's
    full-image ranking sum within a band (our depths are along-ray t, the
    reference's are view-space z: per-pixel cos factors bound the gap) and
    the transl gradients are aligned (cosine >= 0.99);
  * silhouette: same order of magnitude on identical instance-color targets
    (the soft-rasterization models legitimately differ; the reference ships
    silhouette_weight=0.0 by default).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "ref_process"))

import driver  # noqa: E402

N_FRAMES = 2
H, W = 32, 40


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("poseopt"))
    scene, model, smpl_dir, betas_path = driver.build_assets(
        work, num_frames=N_FRAMES, height=H, width=W
    )
    ref_model, ref_loss, ref_body, ref_opt = driver.build_reference(
        work, scene, smpl_dir, betas_path, N_FRAMES
    )

    import p3d_render_stub

    p3d_render_stub.install()
    import multiply_model  # the reference pl module, now importable

    from multiply_tpu.models.renderer import MultiplyRenderer

    conf = driver.our_conf(N_FRAMES)
    renderer = MultiplyRenderer(conf, num_persons=2, num_frames=N_FRAMES)
    state = renderer.build_person_state(scene.servers, grid_res=16)

    # fixed canonical meshes: the SMPL canonical template (identical on both
    # sides; generate_mesh is monkeypatched to return them)
    meshes = []
    for p in range(2):
        verts_c = np.asarray(scene.servers[p].verts_c, np.float32)
        faces = np.asarray(scene.servers[p].model.faces, np.int64)
        meshes.append((verts_c, faces))

    # overlapping pose: pull person 1 onto person 0, toward the camera
    # (-z here), so person 0's SAM-claimed pixels are occluded by person 1
    # and the depth-order + interpenetration paths actually fire
    transl = scene.transl[0].copy()  # (P, 3)
    transl[1] = transl[0] + np.array([0.12, 0.0, -0.35], np.float32)

    return {
        "scene": scene,
        "ref_model": ref_model,
        "mm": multiply_model,
        "renderer": renderer,
        "state": state,
        "meshes": meshes,
        "transl": transl,
    }


@pytest.fixture()
def cpu_torch(monkeypatch):
    """The reference Renderer hard-codes cuda:0; route it to cpu."""
    orig_device = torch.device
    monkeypatch.setattr(
        torch,
        "device",
        lambda *a: orig_device("cpu")
        if a and "cuda" in str(a[0])
        else orig_device(*a),
    )
    if hasattr(torch.cuda, "set_device"):
        monkeypatch.setattr(torch.cuda, "set_device", lambda *a, **k: None)
    monkeypatch.setattr(
        torch, "randperm", lambda n, **kw: torch.arange(n), raising=True
    )


def _ref_shim(harness, epoch=0):
    """Minimal stand-in for the MultiplyModel instance: binds the reference's
    own unbound methods over the already-constructed reference Multiply."""
    M = harness["mm"].MultiplyModel

    class Shim:
        pass

    shim = Shim()
    shim.model = harness["ref_model"]
    shim.current_epoch = epoch
    shim.sigmoid = torch.nn.Sigmoid()
    shim.l2_loss = torch.nn.MSELoss(reduction="mean")
    shim.opt = driver.Opt(
        {
            "model": driver.Opt(
                {
                    "loss": driver.Opt(
                        {
                            "depth_order_weight": 1.0,
                            "silhouette_weight": 1.0,
                            "interpenetration_loss_weight": 1.0,
                        }
                    )
                }
            )
        }
    )
    for name in (
        "get_renderer",
        "get_depth_order_loss",
        "get_interpenetration_loss",
        "query_oc",
        "get_deformed_mesh_fast_mode_multiple_person_torch",
    ):
        setattr(shim, name, types.MethodType(getattr(M, name), shim))
    return shim


def _ref_deformed(harness, transl_t):
    """Reference-side deformed meshes from per-person transl (torch chain:
    smpl_server -> deformer.query_weights -> skinning), differentiable."""
    from lib.model.deformer import skinning

    scene = harness["scene"]
    ref_model = harness["ref_model"]
    verts_list, faces_list = [], []
    for p in range(2):
        verts_c, faces = harness["meshes"][p]
        vc = torch.tensor(verts_c)[None]
        out = ref_model.smpl_server_list[p](
            torch.ones(1),
            transl_t[p][None],
            torch.tensor(scene.poses[0, p])[None],
            torch.tensor(scene.betas[p])[None],
        )
        weights = ref_model.deformer_list[p].query_weights(vc[0])
        vd = skinning(vc, weights, out["smpl_tfs"])
        verts_list.append(vd)
        faces_list.append(torch.tensor(faces)[None])
    return verts_list, faces_list


def _our_deformed(harness, transl_j):
    scene = harness["scene"]
    state = harness["state"]
    from multiply_tpu.body.server import smpl_server_forward

    verts_list, faces_list = [], []
    for p in range(2):
        verts_c, faces = harness["meshes"][p]
        st = jax.tree.map(lambda x: x[p], state)
        smpl_out = smpl_server_forward(
            st.server,
            jnp.ones(()),
            transl_j[p],
            jnp.asarray(scene.poses[0, p]),
            jnp.asarray(scene.betas[p]),
        )
        vd = st.deformer.forward(jnp.asarray(verts_c), smpl_out["smpl_tfs"])
        verts_list.append(vd)
        faces_list.append(jnp.asarray(faces))
    return verts_list, faces_list


def _sample_idx(harness):
    n = min(5120, harness["meshes"][0][0].shape[0])
    return [jnp.arange(n), jnp.arange(n)]


def test_interpenetration_process_parity(harness, cpu_torch):
    """Reference get_interpenetration_loss vs ours on identical deformed
    meshes and identical sample indices: value + transl-gradient parity."""
    from multiply_tpu.engine.pose_losses import interpenetration_loss

    shim = _ref_shim(harness)
    transl_t = torch.tensor(harness["transl"], requires_grad=True)
    verts_list, faces_list = _ref_deformed(harness, transl_t)
    ref_loss = shim.get_interpenetration_loss(verts_list, faces_list)
    ref_val = float(ref_loss)
    ref_loss.backward()
    ref_grad = transl_t.grad.detach().numpy().ravel()

    idx = _sample_idx(harness)

    @jax.jit
    def our_val_grad(transl_np):
        def f(t):
            v, f_ = _our_deformed(harness, t)
            return interpenetration_loss(
                v, f_, jax.random.PRNGKey(0), sample_idx=idx
            )

        return jax.value_and_grad(f)(transl_np)

    our_val, our_grad = our_val_grad(jnp.asarray(harness["transl"]))
    our_val = float(our_val)
    our_grad = np.asarray(our_grad).ravel()

    assert ref_val > 0, "fixture must actually interpenetrate"
    np.testing.assert_allclose(our_val, ref_val, rtol=0.05)
    cos = np.dot(our_grad, ref_grad) / (
        np.linalg.norm(our_grad) * np.linalg.norm(ref_grad) + 1e-12
    )
    assert cos >= 0.99, f"transl gradient cosine {cos:.4f}"


def test_depth_order_process_parity(harness, cpu_torch, monkeypatch, tmp_path):
    """Reference get_depth_order_loss (full-image stub-pytorch3d raster) vs
    our sparse_depth_order_loss evaluated at every pixel."""
    from multiply_tpu.engine.pose_losses import (
        interpenetration_loss,
        sparse_depth_order_loss,
        sparse_silhouette_loss,
    )
    from multiply_tpu.utils.cameras import get_camera_params

    monkeypatch.chdir(tmp_path)  # the reference writes debug pngs at /50

    scene = harness["scene"]
    shim = _ref_shim(harness)

    # generate_mesh fixture: hand the reference our fixed canonical meshes
    class _FixtureMesh:
        def __init__(self, v, f):
            self.vertices = v
            self.faces = f

    calls = {"n": 0}

    def fake_generate_mesh(fn, verts, point_batch=10000, res_up=2):
        v, f = harness["meshes"][calls["n"] % 2]
        calls["n"] += 1
        return _FixtureMesh(v, f)

    monkeypatch.setattr(harness["mm"], "generate_mesh", fake_generate_mesh)

    inputs, transl_t = _ref_inputs_for_depth(harness, harness["transl"])
    d_ref, s_ref, i_ref = shim.get_depth_order_loss(inputs)
    (d_ref + i_ref).backward()
    ref_grad = transl_t.grad.detach().numpy().ravel()
    d_ref, s_ref = float(d_ref), float(s_ref)

    # ---- ours: every pixel (centers, pytorch3d convention) ----------------
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    uv = jnp.asarray(
        np.stack([xx.ravel() + 0.5, yy.ravel() + 0.5], -1).astype(np.float32)
    )
    sam_probs = jax.nn.sigmoid(jnp.asarray(scene.sam_logits[0].reshape(-1, 2)))
    idx = _sample_idx(harness)

    def _rays():
        ray_d, cam_loc = get_camera_params(
            uv, jnp.asarray(scene.cam_pose[0]), jnp.asarray(scene.intrinsics)
        )
        return jnp.broadcast_to(cam_loc, ray_d.shape), ray_d

    @jax.jit
    def our_values(transl_np):
        v, f = _our_deformed(harness, transl_np)
        ray_o, ray_d = _rays()
        d_loss, _ = sparse_depth_order_loss(
            ray_o, ray_d, v, f, sam_probs, scale_to_full=1.0
        )
        s_loss = sparse_silhouette_loss(ray_o, ray_d, v, f, sam_probs)
        return d_loss, s_loss

    @jax.jit
    def our_combined_grad(transl_np):
        def f(t):
            v, f_ = _our_deformed(harness, t)
            ray_o, ray_d = _rays()
            d_loss, _ = sparse_depth_order_loss(
                ray_o, ray_d, v, f_, sam_probs, scale_to_full=1.0
            )
            return d_loss + interpenetration_loss(
                v, f_, jax.random.PRNGKey(0), sample_idx=idx
            )

        return jax.grad(f)(transl_np)

    transl_j = jnp.asarray(harness["transl"])
    d_our, s_our = our_values(transl_j)
    d_our = float(d_our)

    assert d_ref > 0, "fixture must produce depth-order violations"
    # ray-t vs view-z and raster-vs-intersection keep this a band, not exact
    assert abs(d_our - d_ref) / d_ref < 0.20, (d_our, d_ref)

    g_comb = np.asarray(our_combined_grad(transl_j)).ravel()
    cos = np.dot(g_comb, ref_grad) / (
        np.linalg.norm(g_comb) * np.linalg.norm(ref_grad) + 1e-12
    )
    assert cos >= 0.99, f"transl gradient cosine {cos:.4f}"

    # silhouette: identical targets/colors, different soft-raster models —
    # same order of magnitude (reference MSE is in 0..255 units)
    s_our_255 = float(s_our) * 255.0**2
    assert 0.2 < s_our_255 / max(s_ref, 1e-9) < 5.0, (s_our_255, s_ref)


def _ref_inputs_for_depth(harness, transl_np, epoch=0):
    scene = harness["scene"]
    P4 = np.eye(4, dtype=np.float32)
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = scene.intrinsics
    w2c = np.linalg.inv(scene.cam_pose[0])
    P4[:3, :] = (K4 @ w2c)[:3, :].astype(np.float32)

    smpl_params = torch.zeros(1, 2, 86)
    smpl_params[:, :, 0] = 1.0
    transl_t = torch.tensor(transl_np, requires_grad=True)

    # the reference builds torch.tensor([d.cpu().numpy() for d in img_size])
    # (render.py:56); this torch build rejects lists of 0-d ndarrays, so feed
    # dims whose .cpu().numpy() is an np.int64 scalar (accepted), as the real
    # dataloader's CUDA-era torch did
    class _ImgDim:
        def __init__(self, v):
            self.v = int(v)

        def cpu(self):
            return self

        def numpy(self):
            return np.int64(self.v)

        def __int__(self):
            return self.v

        def __index__(self):
            return self.v

    inputs = {
        "idx": torch.tensor([0]),
        "img_size": [_ImgDim(H), _ImgDim(W)],
        "org_img": torch.tensor(scene.images[0])[None],
        "P": torch.tensor(P4)[None],
        "smpl_params": smpl_params,
        "smpl_pose": torch.tensor(scene.poses[0])[None],
        "smpl_shape": torch.tensor(scene.betas)[None],
        "smpl_trans": transl_t[None],
        "org_sam_mask": torch.tensor(scene.sam_logits[0])[None],
        "current_epoch": epoch,
    }
    return inputs, transl_t
