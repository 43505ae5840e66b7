"""Jitted training step with the reference's optimizer-switching schedule.

Parity target: code/multiply_model.py:131-227 (training_step) —
  * mode selection per frame: joint (shape+pose), pose-only (during
    depth-order optimization windows), delayed-pose (uncertain frames before
    pose_correction_epoch: shape frozen, edge rays substituted by the data
    layer);
  * frame-indexed SMPL params injected from the optimizable tables;
  * temporal pose-smoothness term vs. the previous frame (epoch > 250);
  * NaN guard: a non-finite loss skips the update;
  * MultiStepLR per epoch, Adam eps 1e-8, body params at 0.1x lr.

One jitted step covers all modes — the mode is a traced int and parameter
masking happens inside the hand-rolled Adam (engine/optim.py), so there is a
single XLA program instead of per-mode recompiles.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..body.params import BodyParamTable
from ..body.server import smpl_server_forward
from ..models.loss import LossConfig, total_loss
from ..models.renderer import MultiplyRenderer, PersonState, RenderInputs
from ..utils.cameras import get_camera_params
from .optim import AdamState, adam_init, adam_update, multistep_lr
from .pose_losses import (
    interpenetration_loss,
    sparse_depth_order_loss,
    sparse_silhouette_loss,
)

MODE_JOINT = 0
MODE_POSE_ONLY = 1
MODE_DELAYED_POSE = 2  # uncertain frame: body+latents only, shape frozen


class TrainState(NamedTuple):
    params: Any  # {"net": renderer params, "body": stacked BodyParamTable}
    opt_joint: AdamState
    opt_pose: AdamState
    epoch: jnp.ndarray  # ()


class Batch(NamedTuple):
    """One frame's ray batch (the reference trains with batch_size=1 frames)."""

    uv: jnp.ndarray  # (R, 2)
    rgb: jnp.ndarray  # (R, 3)
    pose: jnp.ndarray  # (4, 4)
    intrinsics: jnp.ndarray  # (3, 3)
    frame_idx: jnp.ndarray  # ()
    smpl_scale: jnp.ndarray  # (P,)
    sam_mask: jnp.ndarray | None = None  # (R, P) logits or None
    mode: jnp.ndarray = jnp.asarray(MODE_JOINT)  # () int


class PoseLossBatch(NamedTuple):
    """Host-extracted mesh payload for the pose-opt step losses
    (multiply_model.py:195-202): canonical meshes (padded to a common bucket
    so shapes stay static across frames) plus a SAM-confident pixel sample.
    The meshes are constants inside the step — gradients flow through the
    deformer/LBS into the per-frame SMPL params only, like the reference's
    detached generate_mesh output."""

    verts_c: jnp.ndarray  # (P, V, 3) padded canonical verts
    faces: jnp.ndarray  # (P, F, 3) padded faces (degenerate 0,0,0 padding)
    uv: jnp.ndarray  # (M, 2) sampled pixels in the SAM-confident region
    sam_probs: jnp.ndarray  # (M, P) sigmoid SAM probabilities at those pixels
    scale_to_full: jnp.ndarray  # () n_valid_pixels / M (sum-loss rescale)


def make_lr_factors(params, body_factor: float = 0.1):
    """Per-leaf lr multipliers: 1.0 for the model, 0.1 for body params
    (multiply_model.py:95-97)."""
    net = jax.tree.map(lambda p: 1.0, params["net"])
    body = jax.tree.map(lambda p: body_factor, params["body"])
    return {"net": net, "body": body}


def _active_masks(params, mode: jnp.ndarray):
    """Traced per-leaf activity for the current mode.

    joint: everything. pose-only: body only. delayed: body + frame latents +
    density beta (freeze_shape_model leaves those trainable,
    multiply_model.py:109-118).
    """
    is_joint = mode == MODE_JOINT
    is_pose = mode == MODE_POSE_ONLY
    is_delayed = mode == MODE_DELAYED_POSE

    def net_leaf_active(path_has_shape_net):
        return jnp.where(
            is_joint, True, jnp.where(is_delayed, ~path_has_shape_net, False)
        )

    shape_net_keys = ("fg_implicit", "fg_render", "bg_implicit", "bg_render")
    net = {
        k: jax.tree.map(
            lambda p, k=k: net_leaf_active(jnp.asarray(k in shape_net_keys)),
            params["net"][k],
        )
        for k in params["net"]
    }
    body_active = jnp.logical_or(is_joint, jnp.logical_or(is_pose, is_delayed))
    body = jax.tree.map(lambda p: body_active, params["body"])
    return {"net": net, "body": body}


class TrainStep:
    """Builds the pure (jittable) step function for a fixed renderer/state."""

    def __init__(
        self,
        renderer: MultiplyRenderer,
        person_state: PersonState,
        loss_cfg: LossConfig,
        learning_rate: float = 5e-4,
        sched_milestones: tuple[int, ...] = (200, 500),
        sched_factor: float = 0.5,
        interp_samples: int = 5120,
    ):
        self.renderer = renderer
        self.state = person_state
        self.loss_cfg = loss_cfg
        self.lr = learning_rate
        self.milestones = tuple(sched_milestones)
        self.gamma = sched_factor
        self.interp_samples = interp_samples

    def init_state(self, key: jax.Array, body_tables: BodyParamTable) -> TrainState:
        """body_tables: stacked-over-persons BodyParamTable."""
        net_params = self.renderer.init_params(key)
        params = {"net": net_params, "body": body_tables}
        return TrainState(
            params=params,
            opt_joint=adam_init(params),
            opt_pose=adam_init(params["body"]),
            epoch=jnp.zeros((), jnp.int32),
        )

    # -- loss ----------------------------------------------------------

    def _pose_step_losses(
        self, params, person_state, batch: Batch, pose_batch: PoseLossBatch, key
    ):
        """Raw depth-order / silhouette / interpenetration losses on the
        deformed learned meshes (multiply_model.py:578-736 at step time).
        Differentiable to the per-frame SMPL pose/shape/translation params."""
        body: BodyParamTable = params["body"]
        idx = batch.frame_idx
        thetas = jax.vmap(lambda t: t.thetas(idx))(body)  # (P, 72)
        transl = jax.vmap(lambda t: t.transl[idx])(body)
        betas = jax.vmap(lambda t: t.betas[0])(body)

        ray_d, cam_loc = get_camera_params(pose_batch.uv, batch.pose, batch.intrinsics)
        ray_o = jnp.broadcast_to(cam_loc, ray_d.shape)

        verts_d, faces_list = [], []
        for p in range(self.renderer.P):
            st = jax.tree.map(lambda x: x[p], person_state)
            smpl_out = smpl_server_forward(
                st.server, batch.smpl_scale[p], transl[p], thetas[p], betas[p]
            )
            vd = st.deformer.forward(pose_batch.verts_c[p], smpl_out["smpl_tfs"])
            # meshes live in un-normalized (1/scale) space, like the
            # reference's renderer (multiply_model.py:621)
            verts_d.append(vd / batch.smpl_scale[p])
            faces_list.append(pose_batch.faces[p])

        scale0 = batch.smpl_scale[0]
        d_loss, _ = sparse_depth_order_loss(
            ray_o / scale0, ray_d, verts_d, faces_list, pose_batch.sam_probs,
            scale_to_full=pose_batch.scale_to_full,
        )
        i_loss = interpenetration_loss(
            verts_d, faces_list, key, num_samples=self.interp_samples
        )
        s_loss = sparse_silhouette_loss(
            ray_o / scale0, ray_d, verts_d, faces_list, pose_batch.sam_probs
        )
        return d_loss, s_loss, i_loss

    def _forward_loss(
        self, params, person_state, batch: Batch, epoch, key, pose_batch=None
    ):
        body: BodyParamTable = params["body"]
        idx = batch.frame_idx
        thetas = jax.vmap(lambda t: t.thetas(idx))(body)  # (P, 72)
        transl = jax.vmap(lambda t: t.transl[idx])(body)
        betas = jax.vmap(lambda t: t.betas[0])(body)

        inputs = RenderInputs(
            uv=batch.uv,
            pose=batch.pose,
            intrinsics=batch.intrinsics,
            scale=batch.smpl_scale,
            transl=transl,
            thetas=thetas,
            betas=betas,
            frame_idx=idx,
            epoch=epoch,
        )
        out = self.renderer.render(params["net"], person_state, inputs, train=True, key=key)

        # temporal pose smoothness vs previous frame (multiply_model.py:175-184, 242-243)
        last_idx = jnp.maximum(idx - 1, 0)
        thetas_last = jax.vmap(lambda t: t.thetas(last_idx))(body)
        temporal = jnp.mean(jnp.square(thetas_last - thetas))
        out["temporal_loss"] = jnp.where(epoch > 250, temporal, 0.0)

        loss, logs = total_loss(
            self.loss_cfg,
            out,
            batch.rgb,
            epoch,
            sam_mask_logits=batch.sam_mask,
        )

        # pose-opt step losses (multiply_model.py:195-202): weighted and
        # decayed over depth_loss_milestone exactly like get_depth_order_loss
        zero = jnp.zeros(())
        d_w, s_w, i_w = zero, zero, zero
        if pose_batch is not None:
            d_raw, s_raw, i_raw = self._pose_step_losses(
                params, person_state, batch, pose_batch, jax.random.fold_in(key, 7)
            )
            cfg = self.loss_cfg
            decay = 1.0 - (
                jnp.minimum(float(cfg.depth_loss_milestone), jnp.asarray(epoch, jnp.float32))
                / cfg.depth_loss_milestone
            )
            d_w = cfg.depth_order_weight * decay * d_raw
            s_w = cfg.silhouette_weight * decay * s_raw
            i_w = cfg.interpenetration_weight * decay * i_raw
            loss = loss + d_w + s_w + i_w
            logs["loss"] = loss
        logs["pose_depth_order_loss"] = d_w
        logs["pose_silhouette_loss"] = s_w
        logs["pose_interpenetration_loss"] = i_w
        return loss, logs

    # -- step ----------------------------------------------------------

    def step(
        self, ts: TrainState, batch: Batch, key: jax.Array, person_state=None,
        pose_batch: PoseLossBatch | None = None,
    ):
        """One optimization step. Jit this (static self via closure).

        `person_state` carries the refreshable canonical-mesh state (SDF
        grids re-baked every 20 epochs, reference multiply_model.py:491-508)
        as a traced argument so refreshes don't recompile.

        `pose_batch` (MODE_POSE_ONLY frames only) adds the mesh-based
        depth-order + silhouette + interpenetration losses to the step
        (multiply_model.py:195-202); passing it traces a second jit variant.
        """
        if person_state is None:
            person_state = self.state
        epoch = ts.epoch
        (loss, logs), grads = jax.value_and_grad(
            self._forward_loss, has_aux=True
        )(ts.params, person_state, batch, epoch, key, pose_batch)

        # NaN guard (multiply_model.py:212-214): skip the update entirely —
        # params AND optimizer state (m, v, count) stay untouched, matching
        # the reference's `continue` (see the jnp.where gates on the results
        # below; zeroed grads alone would still advance Adam along momentum).
        finite = jnp.isfinite(loss) & jax.tree.reduce(
            jnp.logical_and,
            jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads),
        )
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)

        lr_now = multistep_lr(self.lr, epoch, self.milestones, self.gamma)
        masks = _active_masks(ts.params, batch.mode)
        lr_factors = make_lr_factors(ts.params)

        # joint optimizer owns all params (modes joint/delayed)
        use_joint = batch.mode != MODE_POSE_ONLY
        joint_masks = jax.tree.map(
            lambda a: jnp.logical_and(a, use_joint), masks
        )
        new_params, new_joint = adam_update(
            grads, ts.opt_joint, ts.params, lr_now, lr_factors, joint_masks
        )

        # pose optimizer owns only the body subtree (mode pose-only)
        pose_masks = jax.tree.map(
            lambda a: jnp.logical_and(a, batch.mode == MODE_POSE_ONLY),
            masks["body"],
        )
        new_body, new_pose = adam_update(
            grads["body"],
            ts.opt_pose,
            new_params["body"],
            lr_now,
            jax.tree.map(lambda p: 0.1, ts.params["body"]),
            pose_masks,
        )
        new_params = {"net": new_params["net"], "body": new_body}

        # full skip on non-finite: revert params and optimizer state
        new_params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_params, ts.params
        )
        new_joint = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_joint, ts.opt_joint
        )
        new_pose = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_pose, ts.opt_pose
        )

        logs["lr"] = lr_now
        # observability: a frozen loss curve with update_skipped=1 means the
        # non-finite guard is rejecting every step (some grad leaf is NaN)
        logs["update_skipped"] = 1.0 - finite.astype(jnp.float32)
        return (
            TrainState(
                params=new_params,
                opt_joint=new_joint,
                opt_pose=new_pose,
                epoch=ts.epoch,
            ),
            logs,
        )

    def jitted_step(self, donate: bool = False):
        """`donate=True` aliases the train-state buffers (callers must
        reassign their state every call, exactly like Trainer._step does)."""
        return jax.jit(self.step, donate_argnums=(0,) if donate else ())
