"""SMPL-init SDF pretraining: the field learns the body's signed distance."""

import numpy as np
import jax
import jax.numpy as jnp

from multiply_tpu.body import SMPLServer, synthetic_body_model
from multiply_tpu.engine.smpl_init import (
    load_init,
    pretrain_smpl_init,
    sample_training_points,
    save_init,
)
from multiply_tpu.models.networks import ImplicitNet


def test_sample_training_points_sdf_signs():
    model = synthetic_body_model()
    server = SMPLServer.create(model)
    rng = np.random.default_rng(0)
    pts, gt = sample_training_points(server, 256, rng)
    assert pts.shape == (256, 3) and gt.shape == (256,)
    # near-surface samples have small |sdf|
    assert np.median(np.abs(gt[:102])) < 0.05
    # uniform box samples include clearly-outside points
    assert gt[205:].max() > 0.2


def test_pretrain_fits_body_sdf():
    model = synthetic_body_model()
    server = SMPLServer.create(model)
    net = ImplicitNet(
        dims=(32, 32), skip_in=(), multires=2, cond="smpl", feature_vector_size=16
    )
    params = pretrain_smpl_init(
        net, server, steps=300, batch=512, lr=3e-4, pool=4096, seed=0
    )

    rng = np.random.default_rng(1)
    from multiply_tpu.engine.smpl_init import sample_training_points as stp

    pts, gt = stp(server, 512, rng)
    pred = np.asarray(
        net.apply(params, jnp.asarray(pts), jnp.zeros((69,)))[:, 0]
    )
    err = np.abs(pred - gt)
    # loose: a 300-step tiny net should beat the sphere init by a wide margin
    sphere_err = np.abs((np.linalg.norm(pts, axis=-1) - 0.6) - gt)
    assert err.mean() < sphere_err.mean() * 0.8, (err.mean(), sphere_err.mean())
    assert err.mean() < 0.15


def test_init_save_load_roundtrip(tmp_path):
    net = ImplicitNet(dims=(16,), skip_in=(), multires=0, cond="none", feature_vector_size=8)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)), None)
    path = str(tmp_path / "init.npz")
    save_init(path, params)
    loaded = load_init(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
