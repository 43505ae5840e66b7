"""End-to-end renderer tests on a tiny synthetic 2-person scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiply_tpu.body import SMPLServer, canonical_pose_params, synthetic_body_model
from multiply_tpu.config import Config
from multiply_tpu.models.renderer import (
    MultiplyRenderer,
    RenderInputs,
    depth2pts_outside,
)

TINY_CONF = Config(
    {
        "dim_frame_encoding": 8,
        "implicit_network": {
            "feature_vector_size": 32,
            "d_in": 3,
            "d_out": 1,
            "dims": [32, 32],
            "init": "geometry",
            "bias": 0.6,
            "skip_in": [],
            "weight_norm": True,
            "multires": 2,
            "cond": "smpl",
            "scene_bounding_sphere": 3.0,
        },
        "rendering_network": {
            "feature_vector_size": 32,
            "mode": "pose_no_view",
            "d_in": 14,
            "d_out": 3,
            "dims": [32],
            "weight_norm": True,
            "multires_view": -1,
        },
        "bg_implicit_network": {
            "feature_vector_size": 32,
            "d_in": 4,
            "d_out": 1,
            "dims": [32, 32],
            "init": "none",
            "bias": 0.0,
            "skip_in": [],
            "weight_norm": False,
            "multires": 2,
            "cond": "frame",
        },
        "bg_rendering_network": {
            "feature_vector_size": 32,
            "mode": "nerf_frame_encoding",
            "d_in": 3,
            "d_out": 3,
            "dims": [16],
            "weight_norm": False,
            "multires_view": 2,
        },
        "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
        "ray_sampler": {
            "near": 0.0,
            "N_samples": 8,
            "N_samples_eval": 16,
            "N_samples_extra": 4,
            "eps": 0.1,
            "beta_iters": 3,
            "max_total_iters": 2,
            "N_samples_inverse_sphere": 4,
            "add_tiny": 1e-6,
        },
        "loss": {"smpl_surface_weight": 0.1},
    }
)


@pytest.fixture(scope="module")
def setup():
    model = synthetic_body_model()
    servers = [
        SMPLServer.create(model, betas=np.zeros(10)),
        SMPLServer.create(model, betas=np.ones(10) * 0.2),
    ]
    renderer = MultiplyRenderer(TINY_CONF, num_persons=2, num_frames=4)
    state = renderer.build_person_state(servers, grid_res=16)
    params = renderer.init_params(jax.random.PRNGKey(0))
    return renderer, state, params


def make_inputs(n_rays=6):
    # camera at z=-2.5 looking at origin (identity rotation -> +z view)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.5]
    intr = np.array(
        [[100.0, 0.0, 32.0], [0.0, 100.0, 32.0], [0.0, 0.0, 1.0]], np.float32
    )
    uv = np.stack(
        [np.linspace(20, 44, n_rays), np.full(n_rays, 32.0)], axis=-1
    ).astype(np.float32)
    thetas = np.stack([np.asarray(canonical_pose_params())] * 2)
    return RenderInputs(
        uv=jnp.asarray(uv),
        pose=jnp.asarray(pose),
        intrinsics=jnp.asarray(intr),
        scale=jnp.ones((2,)),
        transl=jnp.asarray([[0.4, 0.0, 0.0], [-0.4, 0.0, 0.0]], jnp.float32),
        thetas=jnp.asarray(thetas),
        betas=jnp.stack([jnp.zeros(10), jnp.ones(10) * 0.2]),
        frame_idx=jnp.asarray(1),
        epoch=jnp.asarray(100),
    )


def test_depth2pts_outside_on_unit_sphere():
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    pts = depth2pts_outside(o, d, jnp.asarray([[0.2]]), r=3.0)
    assert pts.shape == (1, 1, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pts)[..., :3], axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(pts)[..., 3], 0.2, atol=1e-6)


def test_render_eval_shapes_and_ranges(setup):
    renderer, state, params = setup
    inputs = make_inputs(6)
    out = renderer.render(params, state, inputs, train=False)
    R = 6
    assert out["rgb_values"].shape == (R, 3)
    assert out["normal_values"].shape == (R, 3)
    assert out["acc_map"].shape == (R,)
    assert out["acc_person_list"].shape == (R, 2)
    a = np.asarray(out["acc_map"])
    assert np.all(a >= -1e-5) and np.all(a <= 1 + 1e-5)
    assert np.all(np.isfinite(np.asarray(out["rgb_values"])))
    # acc_person sums to acc_map
    np.testing.assert_allclose(
        np.asarray(out["acc_person_list"]).sum(-1), a, atol=1e-5
    )
    # transmittance + acc = 1 (within interval-composition tolerance)
    np.testing.assert_allclose(
        np.asarray(out["bg_transmittance"]) + a, 1.0, atol=0.05
    )


def test_render_train_outputs(setup):
    renderer, state, params = setup
    inputs = make_inputs(5)
    out = renderer.render(
        params, state, inputs, train=True, key=jax.random.PRNGKey(1)
    )
    assert out["grad_theta"].shape[-1] == 3
    assert out["index_off_surface"].shape == (5,)
    assert out["index_in_surface"].shape == (5,)
    assert np.isfinite(float(out["smpl_surface_loss"]))
    # eikonal gradients should be ~unit-norm at geometric init
    norms = np.linalg.norm(np.asarray(out["grad_theta"]), axis=-1)
    assert 0.3 < np.median(norms) < 3.0


def test_render_grads_flow(setup):
    """Loss gradients reach network params AND smpl pose/translation."""
    renderer, state, params = setup
    inputs = make_inputs(4)

    def loss_fn(p, transl):
        out = renderer.render(
            p,
            state,
            inputs._replace(transl=transl),
            train=True,
            key=jax.random.PRNGKey(2),
        )
        return jnp.mean(out["rgb_values"] ** 2) + jnp.mean(out["acc_map"])

    (g_params, g_transl) = jax.grad(loss_fn, argnums=(0, 1))(params, inputs.transl)
    g_imp = jax.tree_util.tree_leaves(g_params["fg_implicit"])
    assert any(float(jnp.abs(g).max()) > 0 for g in g_imp)
    assert np.isfinite(np.asarray(g_transl)).all()
    assert float(jnp.abs(g_transl).max()) > 0
    g_beta = g_params["beta"]
    assert np.isfinite(np.asarray(g_beta)).all()


def test_three_person_render():
    """BASELINE config #4 shape: 3 persons composited (MMM-style)."""
    from multiply_tpu.body import SMPLServer, synthetic_body_model

    model = synthetic_body_model()
    servers = [SMPLServer.create(model, betas=np.full(10, 0.1 * i)) for i in range(3)]
    renderer = MultiplyRenderer(TINY_CONF, num_persons=3, num_frames=2)
    state = renderer.build_person_state(servers, grid_res=10)
    params = renderer.init_params(jax.random.PRNGKey(0))

    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.5]
    intr = np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1]], np.float32)
    uv = np.stack([np.linspace(16, 48, 5), np.full(5, 32.0)], -1).astype(np.float32)
    thetas = np.stack([np.asarray(canonical_pose_params())] * 3)
    inputs = RenderInputs(
        uv=jnp.asarray(uv), pose=jnp.asarray(pose), intrinsics=jnp.asarray(intr),
        scale=jnp.ones(3),
        transl=jnp.asarray([[0.6, 0, 0], [0.0, 0, 0], [-0.6, 0, 0]], jnp.float32),
        thetas=jnp.asarray(thetas), betas=jnp.stack([jnp.full(10, 0.1 * i) for i in range(3)]),
        frame_idx=jnp.asarray(0), epoch=jnp.asarray(100),
    )
    out = renderer.render(params, state, inputs, train=False)
    assert out["acc_person_list"].shape == (5, 3)
    np.testing.assert_allclose(
        np.asarray(out["acc_person_list"]).sum(-1), np.asarray(out["acc_map"]), atol=1e-5
    )
    assert np.isfinite(np.asarray(out["rgb_values"])).all()


def test_smpl_tri_conditioning_trains():
    """cond: smpl_tri (reference networks.py:32-39,140-148): per-person
    tri-plane features augment the pose conditioning; render works and
    gradients reach the planes (through the 2nd-order-safe grid sample)."""
    from multiply_tpu.body import SMPLServer, synthetic_body_model

    import copy

    conf = Config(copy.deepcopy(TINY_CONF.to_dict()))
    conf.implicit_network["cond"] = "smpl_tri"
    conf.implicit_network["triplane_resolution"] = 16

    model = synthetic_body_model()
    servers = [
        SMPLServer.create(model, betas=np.zeros(10)),
        SMPLServer.create(model, betas=np.ones(10) * 0.2),
    ]
    renderer = MultiplyRenderer(conf, num_persons=2, num_frames=4)
    assert renderer.triplane_on
    state = renderer.build_person_state(servers, grid_res=12)
    params = renderer.init_params(jax.random.PRNGKey(0))
    assert params["triplane"]["params"]["planes"].shape == (2, 3, 64, 16, 16)

    inputs = make_inputs(4)
    out = renderer.render(params, state, inputs, train=True, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["rgb_values"])).all()
    assert np.isfinite(np.asarray(out["grad_theta"])).all()

    # eikonal + rgb losses reach the tri-plane params
    def loss(p):
        o = renderer.render(p, state, inputs, train=True, key=jax.random.PRNGKey(1))
        return (
            jnp.mean(o["rgb_values"] ** 2)
            + jnp.mean((jnp.linalg.norm(o["grad_theta"], axis=-1) - 1.0) ** 2)
        )

    # at geometric init the conditioning columns of layer 0 are zeroed
    # (networks.py:55-76), so tri-plane gradients are exactly 0 — parity with
    # the reference's silent-conditioning start
    g = jax.grad(loss)(params)
    gp = np.asarray(g["triplane"]["params"]["planes"])
    assert np.isfinite(gp).all()
    assert np.abs(gp).max() == 0, "cond columns not silent at geometric init"

    # once the cond columns wake up (as training does), gradients flow into
    # the planes through the 2nd-order-safe grid sample
    k0 = params["fg_implicit"]["params"]["lin0"]["kernel"]
    pe_dim = 15  # multires=2, d_in=3
    k0_live = k0.at[:, pe_dim:, :].set(
        0.01 * jax.random.normal(jax.random.PRNGKey(2), k0[:, pe_dim:, :].shape)
    )
    params_live = jax.tree.map(lambda x: x, params)
    params_live["fg_implicit"]["params"]["lin0"]["kernel"] = k0_live
    g = jax.grad(loss)(params_live)
    gp = np.asarray(g["triplane"]["params"]["planes"])
    assert np.isfinite(gp).all()
    assert np.abs(gp).max() > 0, "no gradient reached the tri-planes"


def test_multi_triplane_dsdf_trains():
    """multi_triplane: true routes TriPlaneMulti (reference networks.py:36-37)
    — the pyramid's delta-SDF is added to the SDF output, so SDF-dependent
    losses reach the plane pyramid even while the conditioning columns are
    still silent from geometric init (the Δsdf path bypasses the cond
    concat entirely)."""
    from multiply_tpu.body import SMPLServer, synthetic_body_model

    import copy

    conf = Config(copy.deepcopy(TINY_CONF.to_dict()))
    conf.implicit_network["cond"] = "smpl_tri"
    conf.implicit_network["multi_triplane"] = True
    conf.implicit_network["triplane_res"] = [8, 16]

    model = synthetic_body_model()
    servers = [
        SMPLServer.create(model, betas=np.zeros(10)),
        SMPLServer.create(model, betas=np.ones(10) * 0.2),
    ]
    renderer = MultiplyRenderer(conf, num_persons=2, num_frames=4)
    assert renderer.triplane_on and renderer.multi_triplane
    state = renderer.build_person_state(servers, grid_res=12)
    params = renderer.init_params(jax.random.PRNGKey(0))
    tri = params["triplane"]["params"]
    assert tri["planes_8"].shape == (2, 3, 64, 8, 8)
    assert tri["planes_16"].shape == (2, 3, 64, 16, 16)

    inputs = make_inputs(4)
    out = renderer.render(params, state, inputs, train=True, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["rgb_values"])).all()

    def sdf_loss(p):
        o = renderer.render(p, state, inputs, train=True, key=jax.random.PRNGKey(1))
        return (
            jnp.mean(o["rgb_values"] ** 2)
            + jnp.mean((jnp.linalg.norm(o["grad_theta"], axis=-1) - 1.0) ** 2)
        )

    g = jax.grad(sdf_loss)(params)
    g_tri = g["triplane"]["params"]
    leaves = jax.tree_util.tree_leaves(g_tri)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the Δsdf path contributes gradients at geometric init — unlike the
    # cond-concat path, it does not wait for the cond columns to wake up
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves), (
        "Δsdf path contributed no gradient to the pyramid"
    )

    # one training step moves the pyramid params
    from multiply_tpu.body.params import BodyParamTable
    from multiply_tpu.engine.train import Batch, TrainStep
    from multiply_tpu.models.loss import LossConfig

    tables = [
        BodyParamTable.create(
            4,
            betas=np.zeros(10, np.float32),
            global_orient=np.zeros((4, 3), np.float32),
            transl=np.zeros((4, 3), np.float32),
            body_pose=np.tile(np.asarray(canonical_pose_params())[3:], (4, 1)),
        )
        for _ in range(2)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *tables)
    builder = TrainStep(renderer, state, LossConfig())
    ts = builder.init_state(jax.random.PRNGKey(2), stacked)
    batch = Batch(
        uv=inputs.uv,
        rgb=jnp.zeros((4, 3)),
        pose=inputs.pose,
        intrinsics=inputs.intrinsics,
        frame_idx=jnp.asarray(0),
        smpl_scale=jnp.ones((2,)),
    )
    before = np.asarray(ts.params["net"]["triplane"]["params"]["planes_8"])
    ts2, logs = jax.jit(builder.step)(ts, batch, jax.random.PRNGKey(3), state)
    after = np.asarray(ts2.params["net"]["triplane"]["params"]["planes_8"])
    assert np.isfinite(float(logs["loss"]))
    assert not np.allclose(before, after), "training did not move the pyramid"


def test_composite_matmul_matches_sort(setup):
    """The pairwise-attenuation composite (composite_matmul: true) must equal
    the depth-sorted composite exactly (same math, different schedule): both
    implement the reference's packed multi-person interval rendering
    (multiply.py:482-516). The matmul path is the default since the round-4
    on-chip A/B (+3.3%); the sort path must be pinned off explicitly."""
    _, state, params = setup
    renderer = MultiplyRenderer(
        Config({**dict(TINY_CONF), "composite_matmul": False}),
        num_persons=2,
        num_frames=4,
    )
    assert not renderer.composite_matmul
    renderer2 = MultiplyRenderer(
        Config({**dict(TINY_CONF), "composite_matmul": True}),
        num_persons=2,
        num_frames=4,
    )
    assert renderer2.composite_matmul
    inputs = make_inputs(8)
    out_sort = renderer.render(params, state, inputs, train=False)
    out_mm = renderer2.render(params, state, inputs, train=False)
    for k in (
        "rgb_values",
        "normal_values",
        "acc_map",
        "acc_person_list",
        "bg_transmittance",
    ):
        np.testing.assert_allclose(
            np.asarray(out_sort[k]), np.asarray(out_mm[k]), atol=2e-5,
            err_msg=k,
        )
    # gradients flow through the pairwise path to translations
    def loss_fn(transl):
        o = renderer2.render(
            params, state, inputs._replace(transl=transl), train=True,
            key=jax.random.PRNGKey(5),
        )
        return jnp.mean(o["rgb_values"] ** 2) + jnp.mean(o["acc_map"])

    g = jax.grad(loss_fn)(inputs.transl)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
