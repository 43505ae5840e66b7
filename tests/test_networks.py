"""Network tests: geometric init => approximate sphere SDF at start."""

import jax
import jax.numpy as jnp
import numpy as np

from multiply_tpu.models.networks import ImplicitNet, RenderingNet, WNDense, softplus100


def test_softplus100_matches_torch_semantics():
    x = jnp.asarray([-0.1, -0.01, 0.0, 0.01, 0.1])
    out = np.asarray(softplus100(x))
    expected = np.log1p(np.exp(100 * np.asarray(x))) / 100
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_wndense_init_equals_raw_kernel():
    """Weight-normed layer must start exactly at the raw initialization."""
    key = jax.random.PRNGKey(0)
    x = jnp.ones((4, 8))
    layer_wn = WNDense(16, use_weight_norm=True)
    layer_raw = WNDense(16, use_weight_norm=False)
    p_wn = layer_wn.init(key, x)
    p_raw = layer_raw.init(key, x)
    np.testing.assert_allclose(
        np.asarray(layer_wn.apply(p_wn, x)),
        np.asarray(layer_raw.apply(p_raw, x)),
        atol=1e-5,
    )


def test_implicit_geometric_init_approximates_sphere():
    """SAL geometric init gives SDF(x) ~ |x| - bias at initialization."""
    net = ImplicitNet(multires=6, cond="smpl", bias=0.6)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)), jnp.zeros((69,)))

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((128, 3)).astype(np.float32)
    out = net.apply(params, jnp.asarray(pts), jnp.zeros((69,)))
    sdf = np.asarray(out[:, 0])
    expected = np.linalg.norm(pts, axis=-1) - 0.6
    err = np.abs(sdf - expected)
    # geometric init is approximate; typical deviation is < 0.1 at |x|~1
    assert np.median(err) < 0.25, (np.median(err), err.max())
    assert out.shape == (128, 257)


def test_implicit_cond_broadcast_and_batched():
    net = ImplicitNet(multires=6, cond="smpl")
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((2, 3)), jnp.zeros((69,)))
    x = jnp.ones((5, 3))
    out1 = net.apply(params, x, jnp.zeros((69,)))
    out2 = net.apply(params, x, jnp.zeros((5, 69)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_implicit_none_cond():
    net = ImplicitNet(multires=0, cond="none", dims=(32, 32), skip_in=(), init_mode="none")
    params = net.init(jax.random.PRNGKey(2), jnp.zeros((2, 3)), None)
    out = net.apply(params, jnp.ones((3, 3)), None)
    assert out.shape == (3, 257)


def test_rendering_net_pose_no_view():
    net = RenderingNet(mode="pose_no_view", dims=(64, 64))
    n = 6
    args = (
        jnp.ones((n, 3)),  # points
        jnp.ones((n, 3)),  # normals
        -jnp.ones((n, 3)),  # view dirs
        jnp.zeros((69,)),  # body pose
        jnp.ones((n, 256)),  # features
    )
    params = net.init(jax.random.PRNGKey(3), *args)
    rgb = net.apply(params, *args)
    assert rgb.shape == (n, 3)
    assert np.all(np.asarray(rgb) >= 0) and np.all(np.asarray(rgb) <= 1)


def test_rendering_net_bg_frame_encoding():
    net = RenderingNet(mode="nerf_frame_encoding", dims=(128,), multires_view=4)
    n = 4
    view = jnp.ones((n, 3))
    feat = jnp.ones((n, 256))
    fl = jnp.ones((32,))
    params = net.init(jax.random.PRNGKey(4), None, None, view, None, feat, frame_latent=fl)
    rgb = net.apply(params, None, None, view, None, feat, frame_latent=fl)
    assert rgb.shape == (n, 3)


def test_person_stacked_params_vmap():
    """Per-person nets = stacked params + vmap (the reference's ModuleList)."""
    net = ImplicitNet(multires=6, cond="smpl", dims=(32, 32), skip_in=())
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    params = jax.vmap(lambda k: net.init(k, jnp.zeros((2, 3)), jnp.zeros((69,))))(keys)
    x = jnp.ones((4, 3))
    out = jax.vmap(lambda p: net.apply(p, x, jnp.zeros((69,))))(params)
    assert out.shape == (3, 4, 257)
    # persons differ (independent init)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
