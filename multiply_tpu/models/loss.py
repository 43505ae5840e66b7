"""Training losses with epoch-keyed decay schedules.

Parity target: code/lib/model/loss.py — L1 RGB, eikonal, BCE opacity
sharpening, in-shape (decays to zero over `milestone` epochs), SAM
instance-mask clip loss (L1 excluding confidently-agreeing pixels), temporal
pose smoothness, SMPL-surface clamp, depth-order decay, zero-pose decay.

All branches are fixed-shape: masked means replace boolean indexing, and the
reference's NaN guards become jnp.where filters (same semantics: drop
offending pixels instead of poisoning the step).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossConfig(NamedTuple):
    eikonal_weight: float = 0.1
    bce_weight: float = 5e-3
    opacity_sparse_weight: float = 3e-3
    in_shape_weight: float = 1e-2
    sam_mask_weight: float = 3e-2
    smpl_surface_weight: float = 0.0
    zero_pose_weight: float = 0.0
    temporal_loss_weight: float = 1.0
    sam_start_epoch: int = 200
    increase_sam: bool = False
    milestone: int = 200
    smpl_surface_milestone: int = 800
    depth_loss_milestone: int = 1000
    zero_pose_milestone: int = 1000
    # pose-opt step losses (multiply_model.py:195-202 / :718-736)
    depth_order_weight: float = 0.005
    silhouette_weight: float = 0.0
    interpenetration_weight: float = 0.0
    eps: float = 1e-6

    @staticmethod
    def from_config(opt) -> "LossConfig":
        return LossConfig(
            eikonal_weight=opt.eikonal_weight,
            bce_weight=opt.bce_weight,
            opacity_sparse_weight=opt.opacity_sparse_weight,
            in_shape_weight=opt.in_shape_weight,
            sam_mask_weight=opt.sam_mask_weight,
            smpl_surface_weight=opt.get("smpl_surface_weight", 0),
            zero_pose_weight=opt.get("zero_pose_weight", 0),
            temporal_loss_weight=opt.get("temporal_loss_weight", 1.0),
            sam_start_epoch=opt.get("sam_start_epoch", 200),
            increase_sam=bool(opt.get("increase_sam", False)),
            milestone=opt.get("milestone", 200),
            smpl_surface_milestone=opt.get("smpl_surface_milestone", 800),
            depth_loss_milestone=opt.get("depth_loss_milestone", 1000),
            zero_pose_milestone=opt.get("zero_pose_milestone", 1000),
            depth_order_weight=opt.get("depth_order_weight", 0.005),
            silhouette_weight=opt.get("silhouette_weight", 0.0),
            interpenetration_weight=opt.get("interpenetration_loss_weight", 0.0),
        )


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over masked entries; 0 when the mask is empty."""
    s = jnp.sum(jnp.where(mask, x, 0.0))
    n = jnp.sum(mask)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)


def rgb_l1(rgb_values: jnp.ndarray, rgb_gt: jnp.ndarray) -> jnp.ndarray:
    """L1 with per-pixel NaN filtering (loss.py:120-122)."""
    finite = jnp.all(jnp.isfinite(rgb_values), axis=-1, keepdims=True)
    err = jnp.abs(jnp.where(finite, rgb_values, 0.0) - jnp.where(finite, rgb_gt, 0.0))
    return masked_mean(err, jnp.broadcast_to(finite, err.shape))


def eikonal(grad_theta: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.linalg.norm(grad_theta, axis=-1) - 1.0) ** 2)


def bce_opacity(acc_map: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Entropy sharpening of accumulated opacity (loss.py:40-42).

    acc is clamped to [0, 1] BEFORE the logs: composite rounding can push
    acc slightly past 1 (the reference's packed composite does too —
    bf16-precision cross-person attenuation sums did it for ours on TPU),
    and log(1-a+eps) then goes NaN. The reference guards this with a
    Python-level branch (loss.py:125-128) that fully DETACHES the NaN
    graph; a traced jnp.where is not equivalent — the backward still
    computes 0 * log(negative) = NaN and poisons every grad upstream of
    acc_map. Clamping (clip routes grad 0 to out-of-range inputs via
    select) is the jit-compatible fix."""
    a = jnp.clip(acc_map, 0.0, 1.0)
    loss = -(a * jnp.log(a + eps) + (1 - a) * jnp.log(1 - a + eps)).mean() * 2
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def in_shape(acc_map: jnp.ndarray, index_in_surface: jnp.ndarray) -> jnp.ndarray:
    """Pull opacity toward 1 on rays through the SMPL interior (loss.py:50-52)."""
    loss = masked_mean(jnp.abs(acc_map - 1.0), index_in_surface)
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def opacity_sparse(acc_map: jnp.ndarray, index_off_surface: jnp.ndarray) -> jnp.ndarray:
    return masked_mean(jnp.abs(acc_map), index_off_surface)


def sam_mask_clip(sam_mask_logits: jnp.ndarray, acc_person: jnp.ndarray) -> jnp.ndarray:
    """Per-person opacity vs sigmoid(SAM logits), skipping pixels where both
    confidently agree, normalized by batch*persons (loss.py:61-78)."""
    n_pix, n_person = sam_mask_logits.shape
    sam = jax.nn.sigmoid(sam_mask_logits)
    valid = (jnp.sum(sam, axis=1) <= 1.0 + 1e-2)[:, None]  # (N,1)
    min_min = (acc_person < 0.04) & (sam < 0.04)
    max_max = (acc_person > 0.96) & (sam > 0.96)
    clip = ~(min_min | max_max) & valid
    total = jnp.sum(jnp.where(clip, jnp.abs(acc_person - sam), 0.0))
    return total / (n_pix * n_person)


def depth_order(
    t_front: jnp.ndarray,  # (N,) depth of the geometrically frontmost person
    t_correct: jnp.ndarray,  # (N,) depth of the person SAM says owns the pixel
    valid: jnp.ndarray,  # (N,) pixels where both are defined
) -> jnp.ndarray:
    """Softplus ranking: push the SAM-owner person in front (loss.py:95-106,
    multiply_model.py:730)."""
    return jnp.sum(jnp.where(valid, jnp.log1p(jnp.exp(t_correct - t_front)), 0.0))


def total_loss(
    cfg: LossConfig,
    outputs: dict,
    rgb_gt: jnp.ndarray,
    epoch: jnp.ndarray,
    sam_mask_logits: jnp.ndarray | None = None,
    depth_order_loss: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Combine all terms with the reference's epoch schedules (loss.py:108-177)."""
    epoch = jnp.asarray(epoch, jnp.float32)
    rgb_loss = rgb_l1(outputs["rgb_values"], rgb_gt)
    eik_loss = eikonal(outputs["grad_theta"])
    bce_loss = bce_opacity(outputs["acc_map"], cfg.eps)
    opacity_sparse_loss = jnp.zeros(())  # disabled in the reference (loss.py:129-130)

    if outputs.get("index_in_surface") is not None:
        in_shape_loss = in_shape(outputs["acc_map"], outputs["index_in_surface"])
    else:
        in_shape_loss = jnp.zeros(())
    # the in-shape stage only runs before epoch 250 (multiply.py:313)
    in_shape_loss = jnp.where(epoch < 250, in_shape_loss, 0.0)

    curr = jnp.minimum(float(cfg.milestone), epoch)
    temporal_loss = outputs.get("temporal_loss", jnp.zeros(()))
    smpl_surface_loss = outputs.get("smpl_surface_loss", jnp.zeros(())) * cfg.smpl_surface_weight

    if sam_mask_logits is not None:
        sam_loss = sam_mask_clip(sam_mask_logits, outputs["acc_person_list"])
        sam_loss = jnp.where(epoch >= cfg.sam_start_epoch, sam_loss, 0.0)
    else:
        sam_loss = jnp.zeros(())

    if depth_order_loss is None:
        depth_order_loss = jnp.zeros(())
    d_decay = 1.0 - jnp.minimum(float(cfg.depth_loss_milestone), epoch) / cfg.depth_loss_milestone
    depth_order_loss = jnp.where(
        epoch >= cfg.sam_start_epoch, depth_order_loss * d_decay, 0.0
    )

    zero_pose_loss = outputs.get("zero_pose_loss", jnp.zeros(())) * cfg.zero_pose_weight
    zero_pose_loss = zero_pose_loss * (
        1.0 - jnp.minimum(float(cfg.zero_pose_milestone), epoch) / cfg.zero_pose_milestone
    )

    increase = jnp.minimum(1.0, epoch / 100.0) if cfg.increase_sam else 1.0

    loss = (
        rgb_loss
        + cfg.eikonal_weight * eik_loss
        + cfg.bce_weight * bce_loss
        + cfg.opacity_sparse_weight * (1 + curr**2 / 40) * opacity_sparse_loss
        + cfg.in_shape_weight * (1 - curr / cfg.milestone) * in_shape_loss
        + temporal_loss * cfg.temporal_loss_weight
        + cfg.sam_mask_weight * sam_loss * increase
        + smpl_surface_loss
        * (1 - jnp.minimum(float(cfg.smpl_surface_milestone), epoch) / cfg.smpl_surface_milestone)
        + depth_order_loss
        + zero_pose_loss
    )
    return loss, {
        "loss": loss,
        "rgb_loss": rgb_loss,
        "eikonal_loss": eik_loss,
        "bce_loss": bce_loss,
        "opacity_sparse_loss": opacity_sparse_loss,
        "in_shape_loss": in_shape_loss,
        "temporal_loss": temporal_loss,
        "sam_mask_loss": sam_loss,
        "smpl_surface_loss": smpl_surface_loss,
        "depth_order_loss": depth_order_loss,
        "zero_pose_loss": zero_pose_loss,
    }
