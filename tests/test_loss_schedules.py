"""Epoch-keyed loss schedule exactness (reference loss.py:140-164)."""

import jax.numpy as jnp
import numpy as np

from multiply_tpu.models.loss import (
    LossConfig,
    bce_opacity,
    masked_mean,
    rgb_l1,
    sam_mask_clip,
    total_loss,
)


def make_outputs(n=16, p=2):
    return {
        "rgb_values": jnp.full((n, 3), 0.5),
        "acc_map": jnp.full((n,), 0.4),
        "acc_person_list": jnp.full((n, p), 0.2),
        "grad_theta": jnp.ones((n, 3)) * jnp.asarray([1.0, 0.0, 0.0]),
        "index_in_surface": jnp.ones((n,), bool),
        "index_off_surface": jnp.zeros((n,), bool),
        "temporal_loss": jnp.asarray(0.01),
        "smpl_surface_loss": jnp.asarray(0.5),
        "zero_pose_loss": jnp.asarray(0.3),
    }


def test_in_shape_decays_to_zero_at_milestone():
    cfg = LossConfig(sam_start_epoch=10_000)
    out = make_outputs()
    gt = jnp.zeros((16, 3))
    _, logs0 = total_loss(cfg, out, gt, epoch=0)
    _, logs_mid = total_loss(cfg, out, gt, epoch=100)
    # raw in_shape value constant; the decay applies inside the total
    l0, lm = float(logs0["in_shape_loss"]), float(logs_mid["in_shape_loss"])
    assert l0 == lm > 0
    # in-shape stage disabled entirely after epoch 250 (multiply.py:313)
    _, logs_late = total_loss(cfg, out, gt, epoch=300)
    assert float(logs_late["in_shape_loss"]) == 0.0


def test_sam_loss_gated_by_start_epoch():
    cfg = LossConfig(sam_start_epoch=50)
    out = make_outputs()
    gt = jnp.zeros((16, 3))
    # one person claims the pixel, the other doesn't (both-positive pixels
    # are excluded by the sum<=1 validity gate, loss.py:65)
    sam = jnp.tile(jnp.asarray([[4.0, -4.0]]), (16, 1))
    _, early = total_loss(cfg, out, gt, epoch=10, sam_mask_logits=sam)
    _, late = total_loss(cfg, out, gt, epoch=60, sam_mask_logits=sam)
    assert float(early["sam_mask_loss"]) == 0.0
    assert float(late["sam_mask_loss"]) > 0.0


def test_depth_order_decay():
    cfg = LossConfig(sam_start_epoch=0, depth_loss_milestone=1000)
    out = make_outputs()
    gt = jnp.zeros((16, 3))
    d = jnp.asarray(2.0)
    _, l0 = total_loss(cfg, out, gt, epoch=0, depth_order_loss=d)
    _, l500 = total_loss(cfg, out, gt, epoch=500, depth_order_loss=d)
    _, l1000 = total_loss(cfg, out, gt, epoch=1500, depth_order_loss=d)
    np.testing.assert_allclose(float(l0["depth_order_loss"]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(l500["depth_order_loss"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(l1000["depth_order_loss"]), 0.0, atol=1e-7)


def test_zero_pose_decay():
    cfg = LossConfig(sam_start_epoch=10_000, zero_pose_weight=1.0)
    out = make_outputs()
    gt = jnp.zeros((16, 3))
    _, l0 = total_loss(cfg, out, gt, epoch=0)
    _, l500 = total_loss(cfg, out, gt, epoch=500)
    np.testing.assert_allclose(float(l0["zero_pose_loss"]), 0.3, rtol=1e-6)
    np.testing.assert_allclose(float(l500["zero_pose_loss"]), 0.15, rtol=1e-6)


def test_sam_clip_excludes_confident_agreement():
    # pixels where both acc and sam are ~0 or ~1 contribute nothing
    acc = jnp.asarray([[0.01, 0.01], [0.99, 0.01], [0.5, 0.01]])
    sam_logits = jnp.asarray([[-8.0, -8.0], [8.0, -8.0], [8.0, -8.0]])
    loss = sam_mask_clip(sam_logits, acc)
    # only the third pixel's first channel (0.5 vs ~1) contributes
    expected = abs(0.5 - 1 / (1 + np.exp(-8.0))) / (3 * 2)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_rgb_l1_nan_filtering():
    vals = jnp.asarray([[0.5, 0.5, 0.5], [jnp.nan, 0.0, 0.0]])
    gt = jnp.zeros((2, 3))
    loss = rgb_l1(vals, gt)
    np.testing.assert_allclose(float(loss), 0.5, rtol=1e-6)


def test_bce_opacity_nan_guard():
    assert float(bce_opacity(jnp.asarray([jnp.nan, 0.5]))) == 0.0


def test_bce_opacity_saturated_acc_finite_grads():
    """acc slightly past 1 (composite rounding) must give FINITE grads: a
    traced where(isfinite) guard alone still backprops 0*log(negative)=NaN
    through the saturated pixels and poisons every param upstream of acc_map
    (the round-5 TPU demo regression — all updates skipped)."""
    import jax

    a = jnp.asarray([0.5, 1.0 + 3e-3, -1e-3, 1.0])
    val, grad = jax.value_and_grad(bce_opacity)(a)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_masked_mean_empty():
    assert float(masked_mean(jnp.ones(4), jnp.zeros(4, bool))) == 0.0
