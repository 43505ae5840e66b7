"""Fused SDF-MLP kernel vs ImplicitNet golden reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from multiply_tpu.models.networks import ImplicitNet
from multiply_tpu.ops.mlp_pallas import FusedSDFMLP


def _check(net, cond_dim, n=700, seed=0):
    rng = np.random.default_rng(seed)
    cond = jnp.asarray(rng.standard_normal(cond_dim).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(seed), x[:2], cond)

    ref = net.apply(params, x, cond)[:, 0]

    fused = FusedSDFMLP(net, cond_dim)
    w = fused.pack_weights(params)
    xin = fused.pack_inputs(x, cond)
    out = fused(w, xin, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_matches_full_scale_arch():
    net = ImplicitNet(
        dims=(256,) * 8, skip_in=(4,), multires=6, cond="smpl",
        feature_vector_size=256,
    )
    _check(net, 69, n=300)


def test_fused_matches_small_arch_no_skip():
    net = ImplicitNet(
        dims=(128, 128), skip_in=(), multires=2, cond="smpl",
        feature_vector_size=32, init_mode="none",
    )
    _check(net, 69, n=500, seed=1)


def test_fused_matches_person_encoder_cond():
    net = ImplicitNet(
        dims=(256,) * 4, skip_in=(2,), multires=6, cond="smpl_id",
        feature_vector_size=128,
    )
    _check(net, 133, n=256, seed=2)
