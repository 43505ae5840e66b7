"""Error-bound sampler tests against an analytic sphere SDF."""

import jax
import jax.numpy as jnp
import numpy as np

from multiply_tpu.models.ray_sampler import (
    SamplerConfig,
    _dstar,
    _sample_cdf,
    error_bound_sample,
    uniform_z_vals,
)

CFG = SamplerConfig(
    near=0.0,
    N_samples=16,
    N_samples_eval=32,
    N_samples_extra=8,
    eps=0.1,
    beta_iters=10,
    max_total_iters=3,
    N_samples_inverse_sphere=8,
    add_tiny=1e-6,
    scene_bounding_sphere=3.0,
)


def sphere_sdf(pts, center=jnp.zeros(3), r=0.5):
    return jnp.linalg.norm(pts - center, axis=-1) - r


def make_rays(n=8):
    """Rays from z=-2 toward the origin-ish (all hit the r=0.5 sphere)."""
    rng = np.random.default_rng(0)
    o = np.tile([0.0, 0.0, -2.0], (n, 1)).astype(np.float32)
    target = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_uniform_z_vals_deterministic_and_stratified():
    near = jnp.zeros((4, 1))
    far = jnp.ones((4, 1)) * 2
    z = uniform_z_vals(near, far, 16)
    np.testing.assert_allclose(np.asarray(z[:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(z[:, -1]), 2.0)
    zs = uniform_z_vals(near, far, 16, jax.random.PRNGKey(0))
    assert np.all(np.diff(np.asarray(zs), axis=-1) > -1e-6)
    assert not np.allclose(np.asarray(zs), np.asarray(z))


def test_sample_cdf_inverts_uniform():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (2, 11))
    cdf = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (2, 11))
    u = jnp.asarray([[0.05, 0.5, 0.95], [0.25, 0.33, 0.75]])
    z = _sample_cdf(bins, cdf, u)
    np.testing.assert_allclose(np.asarray(z), np.asarray(u), atol=1e-5)


def test_dstar_zero_on_sign_change():
    z = jnp.asarray([[0.0, 1.0, 2.0]])
    sdf = jnp.asarray([[0.5, -0.5, 0.5]])
    _, d_star = _dstar(z, sdf)
    np.testing.assert_allclose(np.asarray(d_star), 0.0)


def test_dstar_triangle_bound():
    z = jnp.asarray([[0.0, 1.0]])
    sdf = jnp.asarray([[1.0, 1.2]])
    dists, d_star = _dstar(z, sdf)
    assert dists.shape == (1, 1)
    d = float(d_star[0, 0])
    assert 0.0 < d <= 1.2 + 1e-6


def test_error_bound_sampler_concentrates_near_surface():
    ray_o, ray_d = make_rays(8)
    out = error_bound_sample(CFG, sphere_sdf, ray_o, ray_d, jnp.asarray(0.01), key=None)
    z = np.asarray(out["z_vals"])
    R = z.shape[0]
    assert z.shape == (R, CFG.N_samples + CFG.N_samples_extra + 2)
    assert np.all(np.diff(z, axis=-1) >= -1e-5)  # sorted
    assert np.all(z >= 0) and np.all(z <= 2 * CFG.scene_bounding_sphere + 1e-4)

    # density of samples near the surface should beat uniform by a wide margin
    pts = np.asarray(ray_o)[:, None, :] + z[..., None] * np.asarray(ray_d)[:, None, :]
    sdf = np.abs(np.asarray(sphere_sdf(jnp.asarray(pts.reshape(-1, 3)))))
    frac_near = (sdf < 0.1).mean()
    # uniform sampling over [0,6] through an r=0.5 sphere puts ~2*0.2/6 ~ 7%
    # of samples within |sdf|<0.1; the error-bound sampler should do much better
    assert frac_near > 0.25, frac_near

    assert out["z_eik"].shape == (R, 1)
    assert out["z_bg"].shape == (R, CFG.N_samples_inverse_sphere)
    assert np.all(np.asarray(out["z_bg"]) <= 1.0 / CFG.scene_bounding_sphere + 1e-6)


def test_error_bound_sampler_training_mode_random():
    ray_o, ray_d = make_rays(4)
    out1 = error_bound_sample(
        CFG, sphere_sdf, ray_o, ray_d, jnp.asarray(0.01), key=jax.random.PRNGKey(0)
    )
    out2 = error_bound_sample(
        CFG, sphere_sdf, ray_o, ray_d, jnp.asarray(0.01), key=jax.random.PRNGKey(1)
    )
    assert not np.allclose(np.asarray(out1["z_vals"]), np.asarray(out2["z_vals"]))


def test_error_bound_sampler_jits():
    ray_o, ray_d = make_rays(4)
    f = jax.jit(
        lambda o, d: error_bound_sample(CFG, sphere_sdf, o, d, jnp.asarray(0.01))[
            "z_vals"
        ]
    )
    z = f(ray_o, ray_d)
    assert np.all(np.isfinite(np.asarray(z)))


def test_error_bound_sampler_ray_range_clipping():
    """bbox ray-range mode: samples stay inside the given interval."""
    ray_o, ray_d = make_rays(4)
    rn = jnp.full((4,), 1.2)
    rf = jnp.full((4,), 2.2)
    out = error_bound_sample(
        CFG, sphere_sdf, ray_o, ray_d, jnp.asarray(0.01), ray_range=(rn, rf)
    )
    z = np.asarray(out["z_vals"])
    assert z.min() >= 1.2 - 1e-5
    assert z.max() <= 2.2 + 1e-5
