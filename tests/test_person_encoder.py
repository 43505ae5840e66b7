"""Shared-network (person-encoder) path: one SDF net + identity latents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiply_tpu.body import SMPLServer, synthetic_body_model
from multiply_tpu.config import Config
from multiply_tpu.models.renderer import MultiplyRenderer

from test_renderer import TINY_CONF, make_inputs


@pytest.fixture(scope="module")
def shared_setup():
    conf = Config(TINY_CONF.to_dict())
    conf["use_person_encoder"] = True
    conf["implicit_network"]["cond"] = "smpl_id"
    # geometric init zeroes conditioning weight rows (identical to the
    # reference init), making latent gradients exactly 0 at initialization —
    # use plain init so the latent pathway is live for these tests
    conf["implicit_network"]["init"] = "none"
    model = synthetic_body_model()
    servers = [
        SMPLServer.create(model, betas=np.zeros(10)),
        SMPLServer.create(model, betas=np.ones(10) * 0.2),
    ]
    renderer = MultiplyRenderer(conf, num_persons=2, num_frames=4)
    state = renderer.build_person_state(servers, grid_res=12)
    params = renderer.init_params(jax.random.PRNGKey(0))
    return renderer, state, params


def test_shared_params_structure(shared_setup):
    renderer, state, params = shared_setup
    assert "person_latent" in params
    assert params["person_latent"].shape == (2, 64)
    # shared implicit net: leaves have NO leading person axis
    imp_leaf = jax.tree_util.tree_leaves(params["fg_implicit"])[0]
    ren_leaf = jax.tree_util.tree_leaves(params["fg_render"])[0]
    assert ren_leaf.shape[0] == 2  # render nets stay per-person


def test_shared_render_runs_and_latents_matter(shared_setup):
    renderer, state, params = shared_setup
    inputs = make_inputs(5)
    out = renderer.render(params, state, inputs, train=False)
    assert out["rgb_values"].shape == (5, 3)
    assert np.isfinite(np.asarray(out["rgb_values"])).all()

    # swapping person latents changes per-person opacity assignment
    import copy

    p2 = dict(params)
    p2["person_latent"] = params["person_latent"][::-1]
    out2 = renderer.render(p2, state, inputs, train=False)
    assert not np.allclose(
        np.asarray(out["acc_person_list"]), np.asarray(out2["acc_person_list"])
    )


def test_shared_train_grads(shared_setup):
    renderer, state, params = shared_setup
    inputs = make_inputs(4)

    def loss_fn(p):
        out = renderer.render(p, state, inputs, train=True, key=jax.random.PRNGKey(0))
        return jnp.mean(out["rgb_values"] ** 2) + jnp.mean(out["grad_theta"] ** 2)

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["person_latent"]).max()) > 0
    assert any(
        float(jnp.abs(l).max()) > 0
        for l in jax.tree_util.tree_leaves(g["fg_implicit"])
    )


def test_offset_head_and_beta_encoding_path():
    """Shared net + per-person offset heads + beta encoding (networks.py
    offset_head/beta_encoding options): runs, and heads differentiate people."""
    from multiply_tpu.body import SMPLServer, synthetic_body_model

    conf = Config(TINY_CONF.to_dict())
    conf["use_person_encoder"] = True
    conf["implicit_network"]["cond"] = "smpl_id"
    conf["implicit_network"]["offset_head"] = True
    conf["implicit_network"]["beta_encoding"] = True

    model = synthetic_body_model()
    servers = [SMPLServer.create(model, betas=np.zeros(10)) for _ in range(2)]
    renderer = MultiplyRenderer(conf, num_persons=2, num_frames=2)
    state = renderer.build_person_state(servers, grid_res=12)
    params = renderer.init_params(jax.random.PRNGKey(0))
    assert "offset_head" in params and "beta_encoder" in params

    inputs = make_inputs(4)
    out = renderer.render(params, state, inputs, train=True, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["rgb_values"])).all()

    # near-zero-initialized heads start close to the shared field
    bundle_full = renderer.implicit_bundle(params, 0)
    bundle_bare = {"imp": params["fg_implicit"]}
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 3)).astype(np.float32))
    cond = jnp.zeros((133,))
    sdf_full = renderer._implicit(bundle_full, x, cond, betas=jnp.zeros(10))[:, 0]
    sdf_bare = renderer._implicit(bundle_bare, x, cond)[:, 0]
    np.testing.assert_allclose(np.asarray(sdf_full), np.asarray(sdf_bare), atol=1e-2)
