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
