"""Per-scene optimization orchestrator: epoch loop, mode scheduling, the
epoch-end self-refinement stages, pose-only depth optimization, checkpoints.

Parity target: code/train.py + code/multiply_model.py —
  * per-frame mode selection (joint / pose-only / delayed-pose,
    multiply_model.py:137-160);
  * canonical-mesh refresh every 20 epochs (multiply_model.py:489-508) — here
    it re-bakes the per-person canonical SDF grids used by the in/off-surface
    tests (the jitted step takes them as traced args, no recompile);
  * instance-mask + SAM refinement every 50 epochs (multiply_model.py:509-513)
    writing stage_instance_mask/ + stage_sam_mask/ artifacts the dataset
    re-reads (the filesystem feedback loop);
  * opt_depth at configured epochs (multiply_model.py:230-484): per-frame
    inner Adam loop on translations (or full pose) against depth-order +
    interpenetration + render losses;
  * orbax checkpoints every 100 epochs + last (train.py:16-22), resumable.
"""

from __future__ import annotations

import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..body.params import BodyParamTable
from ..data.dataset import weighted_sampling
from ..models.loss import LossConfig, total_loss
from ..models.renderer import MultiplyRenderer, RenderInputs
from ..ops.mesh_ops import sdf_grid
from ..utils.cameras import get_camera_params
from .instance_masks import run_instance_mask_stage
from .mesh_export import generate_mesh
from .optim import adam_init, adam_update
from .pose_losses import (
    depth_loss_schedule,
    interpenetration_loss,
    sparse_depth_order_loss,
)
from .train import (
    MODE_DELAYED_POSE,
    MODE_JOINT,
    MODE_POSE_ONLY,
    Batch,
    PoseLossBatch,
    TrainStep,
)


def _pad_mesh_to(verts: np.ndarray, faces: np.ndarray, v_to: int, f_to: int):
    """Pad mesh arrays to exact target sizes. Verts repeat a real vertex
    (phantom origin points would leak into interpenetration sampling); faces
    pad degenerate (0,0,0)."""
    verts_p = np.full((v_to, 3), verts[-1] if len(verts) else 0.0, np.float32)
    verts_p[: len(verts)] = verts
    faces_p = np.zeros((f_to, 3), np.int64)
    faces_p[: len(faces)] = faces
    return verts_p, faces_p


def _bucket_size(n: int, base: int) -> int:
    """Next power-of-two bucket >= n (floored at `base`).

    Linear buckets (ceil to a multiple of base) gave one XLA compile per
    distinct mesh size — a learned-mesh refresh mid-training could stall a
    pose/depth epoch for minutes on a fresh compile. Power-of-two buckets
    bound the number of jit shapes at log2(range) for <=2x padding (the
    padded work is linear in faces, the recompiles are not)."""
    b = base
    while b < n:
        b *= 2
    return b


def _pad_mesh(verts: np.ndarray, faces: np.ndarray, bucket: int = 8192):
    """Pad mesh arrays to bucketed sizes so jitted pose-loss steps don't
    recompile for every extraction (degenerate face 0,0,0 padding)."""
    fv = _bucket_size(len(faces), bucket)
    vv = _bucket_size(len(verts), bucket)
    return _pad_mesh_to(verts, faces, vv, fv)


class Trainer:
    def __init__(
        self,
        conf,
        seq,  # Hi4DSequence-like (or SyntheticSequence adapter)
        servers: list,  # per-person SMPLServer
        run_dir: str = ".",
        segmenter: Callable | None = None,  # SAM stage callable or None
        seed: int = 42,
        devices: int | None = None,  # >1: shard rays over a device mesh
    ):
        self.conf = conf
        self.seq = seq
        self.run_dir = run_dir
        self.segmenter = segmenter
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

        model_conf = conf.model
        self.num_person = seq.num_person
        self.num_frames = len(seq)
        self.renderer = MultiplyRenderer(
            model_conf, num_persons=self.num_person, num_frames=self.num_frames
        )
        self.grid_res = int(model_conf.get("cano_grid_res", 64))
        self.mesh_res_up = int(model_conf.get("cano_mesh_res_up", 2))
        # SMPL-surface loss sampling weights: exclude head/hands/feet when the
        # standard vertex segmentation is available (multiply.py:112-113)
        surface_logits = None
        seg_path = str(
            model_conf.get("smpl_vert_segmentation", "outputs/smpl_vert_segmentation.json")
        )
        if model_conf.loss.get("smpl_surface_weight", 0) > 0 and os.path.exists(seg_path):
            from ..body.segmentation import surface_sample_logits

            surface_logits = [
                surface_sample_logits(seg_path, s.verts_c.shape[0]) for s in servers
            ]
        self.person_state = self.renderer.build_person_state(
            servers, surface_logits=surface_logits, grid_res=self.grid_res
        )
        self.servers = servers

        self.loss_cfg = LossConfig.from_config(model_conf.loss)
        self.interp_samples = int(model_conf.get("interp_samples", 5120))
        self.builder = TrainStep(
            self.renderer,
            self.person_state,
            self.loss_cfg,
            learning_rate=model_conf.learning_rate,
            sched_milestones=tuple(model_conf.sched_milestones),
            sched_factor=model_conf.sched_factor,
            interp_samples=self.interp_samples,
        )
        # donate the train state: params/opt-state buffers are overwritten in
        # place instead of allocated fresh each step (set
        # MULTIPLY_TPU_NO_DONATE=1 to disable if a backend rejects aliasing)
        donate = () if os.environ.get("MULTIPLY_TPU_NO_DONATE") else (0,)
        self._step = jax.jit(self.builder.step, donate_argnums=donate)
        # multi-chip: rays data-parallel over a 1-D mesh, params replicated,
        # grad psum inserted by XLA (SURVEY §2.4; reference is single-GPU)
        self.mesh = None
        if devices is not None and devices > 1:
            from ..parallel import make_mesh

            self.mesh = make_mesh(devices)
        # one shared jitted canonical-SDF eval: params/cond are traced args,
        # so person switches and epoch refreshes reuse the compilation (and
        # host-parallel stage threads share one cache)
        self._sdf_eval = jax.jit(
            lambda b, cp, be, x: self.renderer._implicit(b, x, cp, betas=be)[:, 0]
        )

        # schedules (multiply_model.py:62-78)
        self.pose_correction_epoch = model_conf.get("pose_correction_epoch", 500)
        self.depth_end = bool(model_conf.get("depth_end", False))
        self.pose_start_epoch = model_conf.get("pose_start_epoch", 200)
        self.pose_end_epoch = model_conf.get("pose_end_epoch", 1000)
        self.pose_opt_interval = model_conf.get("pose_opt_interval", 10)
        self.pose_opt_epoch = model_conf.get("pose_opt_epoch", 1)
        self.depth_pose = bool(model_conf.get("depth_pose", False))
        self.depth_epoch = list(model_conf.get("depth_epoch", []))
        self.depth_cond_zero = bool(model_conf.get("depth_cond_zero", False))
        self.it_per_loop = model_conf.get("it_per_loop", 100)
        self.depth_pixel_samples = int(model_conf.get("depth_pixel_samples", 4096))
        self.pose_pixel_samples = int(model_conf.get("pose_pixel_samples", 2048))
        self.mesh_pad_bucket = int(model_conf.get("mesh_pad_bucket", 8192))
        self.using_sam = bool(conf.dataset.train.get("using_SAM", True))
        self.depth_order_weight = model_conf.loss.get("depth_order_weight", 0.005)
        self.interpenetration_weight = model_conf.loss.get(
            "interpenetration_loss_weight", 0.0
        )
        self.silhouette_weight = model_conf.loss.get("silhouette_weight", 0.0)

        # init body tables from preprocessed poses (multiply_model.py:76-93)
        tables = [
            BodyParamTable.create(
                self.num_frames,
                betas=seq.shape[p],
                global_orient=seq.poses[:, p, :3],
                transl=seq.trans[:, p],
                body_pose=seq.poses[:, p, 3:],
            )
            for p in range(self.num_person)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *tables)
        self.ts = self.builder.init_state(jax.random.PRNGKey(seed), stacked)
        self.epoch = 0

        if model_conf.get("smpl_init", False):
            self._apply_smpl_init(model_conf)

        if self.mesh is not None:
            from ..parallel import replicate

            self.ts = replicate(self.ts, self.mesh)
            self.person_state = replicate(self.person_state, self.mesh)

    def _run_step(self, batch, key, pose_batch=None):
        """One optimization step; under a mesh the batch's per-ray arrays are
        sharded across devices and mesh payloads replicate."""
        if self.mesh is not None:
            from ..parallel import replicate
            from ..parallel.sharding import shard_batch

            batch = shard_batch(batch, self.mesh)
            if pose_batch is not None:
                pose_batch = replicate(pose_batch, self.mesh)
        return self._step(self.ts, batch, key, self.person_state, pose_batch)

    def _apply_smpl_init(self, model_conf) -> None:
        """Start the SDF fields as the canonical body instead of a sphere
        (reference loads a downloaded init at multiply.py:102-108; we pretrain
        and cache our own, one per gender)."""
        from .smpl_init import get_or_pretrain

        steps = int(model_conf.get("smpl_init_steps", 2000))
        cache_dir = str(model_conf.get("smpl_init_cache_dir", "outputs"))
        genders = getattr(self.seq, "genders", ["neutral"] * self.num_person)
        per_gender: dict = {}
        new_params = []
        for p in range(self.num_person):
            g = genders[p]
            if g not in per_gender:
                cache = os.path.join(cache_dir, f"smpl_init_{g}.npz")
                per_gender[g] = get_or_pretrain(
                    self.renderer.fg_implicit, self.servers[p], cache, steps=steps
                )
            new_params.append(per_gender[g])
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *new_params)
        net = dict(self.ts.params["net"])
        net["fg_implicit"] = stacked
        self.ts = self.ts._replace(
            params={"net": net, "body": self.ts.params["body"]}
        )

    # ------------------------------------------------------------------
    # mode selection per frame (multiply_model.py:137-160)
    # ------------------------------------------------------------------

    def _select_mode(self, is_certain: bool, has_sam: bool) -> int:
        ep = self.epoch
        pose_epoch = ep % self.pose_opt_interval
        is_pose_depth = (
            has_sam
            and ep >= self.pose_start_epoch
            and pose_epoch < self.pose_opt_epoch
            and ep < self.pose_end_epoch
            and not self.depth_end
        )
        if self.using_sam:
            if is_pose_depth:
                return MODE_POSE_ONLY
            if ep < self.pose_correction_epoch and not is_certain:
                return MODE_DELAYED_POSE
        return MODE_JOINT

    def _pose_window(self) -> bool:
        """True when this epoch CAN produce MODE_POSE_ONLY steps (the epoch
        part of _select_mode's is_pose_depth condition)."""
        ep = self.epoch
        return (
            self.using_sam
            and ep >= self.pose_start_epoch
            and ep % self.pose_opt_interval < self.pose_opt_epoch
            and ep < self.pose_end_epoch
            and not self.depth_end
        )

    # ------------------------------------------------------------------
    # canonical SDF queries for mesh extraction
    # ------------------------------------------------------------------

    def _params_snapshot(self):
        """Donation-proof device-side COPY of the current params. The jitted
        step donates self.ts, which invalidates its buffers the moment the
        next step dispatches — any host thread that outlives a step (the
        batch producer in pose-opt windows, the overlapped stage executor)
        must work from a copy, not from self.ts itself."""
        return jax.tree.map(jnp.array, self.ts.params)

    def canonical_sdf_fn(self, person_id: int, cond_pose=None, params=None):
        """Host callable (N,3)->(N,) evaluating one person's canonical SDF
        (incl. per-person offset head / beta encoding when configured,
        matching the reference's query_oc). `params` pins a snapshot for
        background threads (defaults to the live train state)."""
        params = self.ts.params if params is None else params
        if cond_pose is None:
            cond_dim = 69 + 64 if self.renderer.use_person_encoder else 69
            cond_pose = jnp.zeros((cond_dim,))
        elif self.renderer.use_person_encoder:
            latent = params["net"]["person_latent"][person_id]
            cond_pose = jnp.concatenate([jnp.asarray(cond_pose), latent])
        bundle = self.renderer.implicit_bundle(params["net"], person_id)
        betas = params["body"].betas[person_id, 0]
        return lambda pts: np.asarray(
            self._sdf_eval(bundle, cond_pose, betas, jnp.asarray(pts, jnp.float32))
        )

    def extract_canonical_meshes(self, res_up: int | None = None, cond_pose_per_person=None, params=None):
        res_up = self.mesh_res_up if res_up is None else res_up
        meshes = []
        for p in range(self.num_person):
            cp = None if cond_pose_per_person is None else cond_pose_per_person[p]
            verts, faces = generate_mesh(
                self.canonical_sdf_fn(p, cp, params=params),
                np.asarray(self.servers[p].verts_c),
                res_up=res_up,
            )
            meshes.append((verts, faces))
        return meshes

    def _compute_canonical_grids(self, params=None):
        """Bake in/off-surface SDF grids from the learned canonical meshes
        (multiply_model.py:489-508 equivalent). Pure compute — safe to run in
        a background thread on a params snapshot while training continues;
        apply the result with _apply_canonical_grids on the main thread."""
        grids = []
        for p in range(self.num_person):
            try:
                verts, faces = generate_mesh(
                    self.canonical_sdf_fn(p, params=params),
                    np.asarray(self.servers[p].verts_c),
                    res_up=self.mesh_res_up,
                )
                if len(verts) < 16 or len(faces) < 16:
                    raise ValueError("degenerate mesh")
                grids.append(
                    sdf_grid(jnp.asarray(verts), jnp.asarray(faces), res=self.grid_res)
                )
            except Exception as e:  # keep previous state (reference try/except)
                print(f"canonical mesh refresh failed for person {p}: {e}")
                grids.append(
                    jax.tree.map(lambda x: x[p], self.person_state.cano_grid)
                )
        return jax.tree.map(lambda *xs: jnp.stack(xs), *grids)

    def _apply_canonical_grids(self, stacked) -> None:
        self.person_state = self.person_state._replace(cano_grid=stacked)
        if self.mesh is not None:
            from ..parallel import replicate

            self.person_state = replicate(self.person_state, self.mesh)

    def refresh_canonical_state(self, params=None) -> None:
        self._apply_canonical_grids(self._compute_canonical_grids(params))

    # ------------------------------------------------------------------
    # deformed meshes (for instance masks / depth losses)
    # ------------------------------------------------------------------

    def deformed_meshes_for_frame(self, frame_idx: int, res_up: int | None = None, unscale: bool = True, params=None):
        """Extract canonical meshes and deform to a frame's pose; returns
        ([(verts, faces)], [joints]) in un-normalized (1/scale) space."""
        res_up = self.mesh_res_up if res_up is None else res_up
        params = self.ts.params if params is None else params
        body = params["body"]
        meshes, joints = [], []
        for p in range(self.num_person):
            table = jax.tree.map(lambda x: x[p], body)
            thetas = jnp.concatenate(
                [table.global_orient[frame_idx], table.body_pose[frame_idx]]
            )
            scale = float(self.seq.scale) if hasattr(self.seq, "scale") else 1.0
            out = self.servers[p](
                jnp.asarray(scale), table.transl[frame_idx], thetas, table.betas[0]
            )
            cond = np.asarray(table.body_pose[frame_idx]) / np.pi
            verts_c, faces = generate_mesh(
                self.canonical_sdf_fn(p, jnp.asarray(cond)),
                np.asarray(self.servers[p].verts_c),
                res_up=res_up,
            )
            deformer = jax.tree.map(lambda x: x[p], self.person_state.deformer)
            verts_d = np.asarray(deformer.forward(jnp.asarray(verts_c), out["smpl_tfs"]))
            if unscale:
                verts_d = verts_d / scale
            meshes.append((verts_d, faces))
            j = np.asarray(out["smpl_all_jnts"])
            if unscale:
                j = j / scale
            joints.append(j)
        return meshes, joints

    # ------------------------------------------------------------------
    # epoch-end stages
    # ------------------------------------------------------------------

    def instance_mask_stage(self, max_workers: int = 4, params=None,
                            epoch: int | None = None) -> None:
        """Frames are independent — run them host-parallel (the C++ MISE
        octree and rasterizer are handle-based and release the GIL via
        ctypes; jitted SDF evals serialize on the device but overlap with
        host meshing). Reference loops frames sequentially."""
        from concurrent.futures import ThreadPoolExecutor

        epoch = self.epoch if epoch is None else epoch
        stage_params = self.ts.params if params is None else params

        def frame_payload(i: int) -> dict:
            item = self.seq.get_eval_item(i)
            if epoch <= 190:
                # SMPL meshes as prompts early on (multiply_model.py:825-850)
                meshes, joints = [], []
                body = stage_params["body"]
                for p in range(self.num_person):
                    table = jax.tree.map(lambda x: x[p], body)
                    thetas = jnp.concatenate(
                        [table.global_orient[i], table.body_pose[i]]
                    )
                    out = self.servers[p](
                        jnp.asarray(float(self.seq.scale)),
                        table.transl[i],
                        thetas,
                        table.betas[0],
                    )
                    scale = float(self.seq.scale)
                    meshes.append(
                        (
                            np.asarray(out["smpl_verts"]) / scale,
                            np.asarray(self.servers[p].model.faces),
                        )
                    )
                    joints.append(np.asarray(out["smpl_all_jnts"]) / scale)
            else:
                meshes, joints = self.deformed_meshes_for_frame(i, params=stage_params)
            return {
                "P": item["P"] @ np.diag([float(self.seq.scale)] * 3 + [1.0]),
                "img_size": item["img_size"],
                "meshes": meshes,
                "joints": joints,
            }

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            frames = list(pool.map(frame_payload, range(self.num_frames)))
        run_instance_mask_stage(epoch, frames, out_dir=self.run_dir)

    def sam_stage(self, epoch: int | None = None) -> None:
        if self.segmenter is not None:
            self.segmenter(self.epoch if epoch is None else epoch,
                           run_dir=self.run_dir)

    # ------------------------------------------------------------------
    # pose-opt step losses (multiply_model.py:195-202)
    # ------------------------------------------------------------------

    def pose_loss_batch(self, frame_idx: int, rng, params=None) -> PoseLossBatch | None:
        """Mesh payload for a MODE_POSE_ONLY step: canonical meshes extracted
        with the frame's pose conditioning (like the reference's per-step
        generate_mesh, multiply_model.py:602-616) plus a SAM-confident pixel
        sample. Returns None until full-image SAM masks exist.

        `params`: donation-proof snapshot for the producer thread (the live
        self.ts may be donated mid-extraction otherwise)."""
        sam = getattr(self.seq, "_sam_masks", None)
        if sam is None:
            return None
        probs = 1.0 / (1.0 + np.exp(-np.asarray(sam[frame_idx], np.float32)))
        sam_sum = probs.sum(-1)
        valid = (sam_sum >= 0.7) & (sam_sum <= 1.01)
        vy, vx = np.nonzero(valid)
        n_valid = len(vx)
        if n_valid == 0:
            return None
        M = self.pose_pixel_samples
        sel = rng.choice(n_valid, M, replace=n_valid < M)
        uv = np.stack([vx[sel], vy[sel]], -1).astype(np.float32)

        params = self.ts.params if params is None else params
        body = params["body"]
        meshes = []
        for p in range(self.num_person):
            table = jax.tree.map(lambda x: x[p], body)
            cond = np.asarray(table.body_pose[frame_idx]) / np.pi
            try:
                verts_c, faces = generate_mesh(
                    self.canonical_sdf_fn(p, jnp.asarray(cond), params=params),
                    np.asarray(self.servers[p].verts_c),
                    res_up=self.mesh_res_up,
                )
                if len(verts_c) < 16 or len(faces) < 16:
                    raise ValueError("degenerate mesh")
            except Exception as e:  # fall back to SMPL body (early training)
                print(f"pose-loss mesh extraction failed for person {p}: {e}")
                verts_c = np.asarray(self.servers[p].verts_c)
                faces = np.asarray(self.servers[p].model.faces)
            meshes.append((verts_c, faces))
        bucket = self.mesh_pad_bucket
        v_to = max(_bucket_size(len(m[0]), bucket) for m in meshes)
        f_to = max(_bucket_size(len(m[1]), bucket) for m in meshes)
        padded = [_pad_mesh_to(v, f, v_to, f_to) for v, f in meshes]
        return PoseLossBatch(
            verts_c=jnp.asarray(np.stack([m[0] for m in padded])),
            faces=jnp.asarray(np.stack([m[1] for m in padded])),
            uv=jnp.asarray(uv),
            sam_probs=jnp.asarray(probs[vy[sel], vx[sel]]),
            scale_to_full=jnp.asarray(n_valid / M, jnp.float32),
        )

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------

    def make_batch(self, item: dict, mode: int) -> Batch:
        return Batch(
            uv=jnp.asarray(item["edge_uv"] if mode == MODE_DELAYED_POSE and "edge_uv" in item else item["uv"]),
            rgb=jnp.asarray(item["edge_rgb"] if mode == MODE_DELAYED_POSE and "edge_rgb" in item else item["rgb"]),
            pose=jnp.asarray(item["pose"]),
            intrinsics=jnp.asarray(item["intrinsics"]),
            frame_idx=jnp.asarray(item["idx"]),
            smpl_scale=jnp.asarray(item["smpl_scale"]),
            sam_mask=jnp.asarray(
                item["edge_sam_mask"]
                if mode == MODE_DELAYED_POSE and "edge_sam_mask" in item
                else item.get("sam_mask", np.zeros((len(item["uv"]), self.num_person), np.float32))
            ),
            mode=jnp.asarray(mode),
        )

    def train_epoch(self) -> dict:
        """One pass over shuffled frames, with a host prefetch thread that
        builds the next step's ENTIRE device batch (item sampling, pose-loss
        mesh payloads, and the host->device transfers) while the device runs
        the current step (the reference feeds a GPU with 8 DataLoader
        workers; one producer thread saturates an on-device step). The main
        thread only dequeues and dispatches — on the remote-tunnel backend
        every host->device transfer is a round trip, so keeping them off the
        dispatch thread is most of the 130->~90 ms/step gap
        (docs/step_overhead.json)."""
        import queue
        import threading

        order = self.rng.permutation(self.num_frames)
        # separate generators: both are consumed by the producer thread, but
        # item/pose streams stay independent so mode flips don't shift the
        # item sampling sequence
        item_rng = np.random.default_rng(self.rng.integers(0, 2**31))
        pose_rng = np.random.default_rng(self.rng.integers(0, 2**31))
        # ONE PRNG dispatch for the whole epoch: a per-step jax.random.split
        # is a compiled-program round trip through the tunnel
        keys = jax.random.split(self.key, self.num_frames + 1)
        self.key = keys[0]
        q: queue.Queue = queue.Queue(maxsize=2)
        # pose-only epochs: the producer's mesh extraction must read a
        # donation-proof epoch-start copy of the params (the reference
        # re-extracts per step from live params; one epoch of staleness is
        # the same order of drift)
        snap = self._params_snapshot() if self._pose_window() else None

        def producer():
            try:
                for i in order:
                    item = self.seq.get_train_item(int(i), item_rng)
                    has_sam = "sam_mask" in item
                    mode = self._select_mode(item.get("is_certain", True), has_sam)
                    batch = self.make_batch(item, mode)
                    pose_batch = (
                        self.pose_loss_batch(int(i), pose_rng, params=snap)
                        if mode == MODE_POSE_ONLY
                        else None
                    )
                    q.put((mode, batch, pose_batch))
                q.put(None)
            except BaseException as e:  # surface in the main thread
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        logs = None
        mode_counts = {MODE_JOINT: 0, MODE_POSE_ONLY: 0, MODE_DELAYED_POSE: 0}
        self.ts = self.ts._replace(epoch=jnp.asarray(self.epoch, jnp.int32))
        step_i = 0
        while True:
            got = q.get()
            if got is None:
                break
            if isinstance(got, BaseException):
                raise got
            mode, batch, pose_batch = got
            mode_counts[mode] += 1
            step_i += 1
            self.ts, logs = self._run_step(batch, keys[step_i], pose_batch)
        t.join()
        out = {k: float(v) for k, v in (logs or {}).items()}
        out["n_joint"] = float(mode_counts[MODE_JOINT])
        out["n_pose_only"] = float(mode_counts[MODE_POSE_ONLY])
        out["n_delayed_pose"] = float(mode_counts[MODE_DELAYED_POSE])
        return out

    def fit(self, max_epochs: int, log_every: int = 10, ckpt_every: int = 100,
            val_every: int = 50, ckpt_dir: str | None = None,
            render_val: bool = True) -> None:
        """Training loop with epoch-end stages (reference
        training_epoch_end, multiply_model.py:489-519).

        With model.stage_overlap=true the /20 mesh refresh and the /50
        instance-mask + SAM stages run in a background thread on a
        donation-proof params snapshot while the next epoch trains — the
        stages are feedback-delayed by design (the reference consumes their
        file outputs on the NEXT dataloader pass too), so one epoch of
        staleness changes nothing semantically but removes their wall-clock
        from the critical path (docs/runlog_fullscale.md measured 36-62 s
        per mesh refresh on this host)."""
        from concurrent.futures import ThreadPoolExecutor

        from ..utils.logging import MetricsLogger

        overlap = bool(self.conf.model.get("stage_overlap", False))
        stage_pool = ThreadPoolExecutor(max_workers=1) if overlap else None
        mesh_fut = None  # -> stacked canonical grids (applied on main thread)
        mask_fut = None  # -> None (publishes files the data layer polls)

        def harvest(wait_mesh: bool, wait_mask: bool) -> None:
            nonlocal mesh_fut, mask_fut
            if mesh_fut is not None and (wait_mesh or mesh_fut.done()):
                try:
                    self._apply_canonical_grids(mesh_fut.result())
                except Exception as e:  # stage failure must never kill training
                    print(f"overlapped mesh refresh failed: {e}")
                mesh_fut = None
            if mask_fut is not None and (wait_mask or mask_fut.done()):
                try:
                    mask_fut.result()
                except Exception as e:
                    print(f"overlapped mask/SAM stage failed: {e}")
                mask_fut = None

        metrics = MetricsLogger(self.run_dir)
        for _ in range(max_epochs - self.epoch):
            t0 = time.time()
            logs = self.train_epoch()
            logs["epoch_seconds"] = time.time() - t0
            metrics.log(logs, epoch=self.epoch)
            if self.epoch % log_every == 0:
                msg = " ".join(
                    f"{k}={v:.4f}" for k, v in logs.items() if k not in ("lr",)
                )
                print(f"epoch {self.epoch} ({logs['epoch_seconds']:.1f}s) {msg}")

            if overlap:
                harvest(wait_mesh=False, wait_mask=False)

            if self.epoch != 0 and self.epoch % 20 == 0:
                if overlap:
                    harvest(wait_mesh=True, wait_mask=False)
                    mesh_fut = stage_pool.submit(
                        self._compute_canonical_grids, self._params_snapshot()
                    )
                else:
                    self.refresh_canonical_state()
            if self.epoch % val_every == 0 and self.using_sam:
                if overlap:
                    harvest(wait_mesh=False, wait_mask=True)
                    snap, ep = self._params_snapshot(), self.epoch

                    def mask_job(snap=snap, ep=ep):
                        self.instance_mask_stage(params=snap, epoch=ep)
                        self.sam_stage(epoch=ep)

                    mask_fut = stage_pool.submit(mask_job)
                else:
                    self.instance_mask_stage()
                    self.sam_stage()
            if self.epoch % val_every == 0 and render_val:
                try:
                    psnr = self.validate()
                    metrics.log({"val_psnr": psnr}, epoch=self.epoch)
                except Exception as e:  # validation must never kill training
                    print(f"validation render failed: {e}")
            if self.epoch in self.depth_epoch and self.depth_end:
                if overlap:  # opt_depth rewrites body params: settle stages
                    harvest(wait_mesh=True, wait_mask=True)
                self.opt_depth()
            if ckpt_dir and self.epoch % ckpt_every == 0:
                self.save_checkpoint(ckpt_dir)
            self.epoch += 1
        if overlap:
            harvest(wait_mesh=True, wait_mask=True)
            stage_pool.shutdown(wait=True)
        if ckpt_dir:
            self.save_checkpoint(ckpt_dir, tag="last")
        metrics.close()

    def validate(self, frame_idx: int | None = None) -> float:
        """Render one validation frame side-by-side with GT (the reference's
        every-50-epoch validation image, multiply_model.py:982-1122).
        Returns PSNR."""
        import imageio

        from .evaluator import Evaluator

        if frame_idx is None:
            frame_idx = int(self.rng.integers(0, self.num_frames))
        if not hasattr(self, "_evaluator"):
            self._evaluator = Evaluator(
                self.renderer, self.person_state, self.servers,
                pixel_per_batch=int(
                    self.conf.dataset.get("valid", {}).get("pixel_per_batch", 512)
                ),
            )
        item = self.seq.get_eval_item(frame_idx)
        merged = self._evaluator.render_image(
            self.ts.params["net"], self.ts.params["body"], item,
            epoch=self.epoch, person_state=self.person_state,
        )
        H, W = item["img_size"]
        gt = np.asarray(item["rgb"], np.float32).reshape(H, W, 3)
        side = np.concatenate([gt, merged["rgb_image"]], axis=1)
        out_dir = os.path.join(self.run_dir, "val")
        os.makedirs(out_dir, exist_ok=True)
        imageio.imwrite(
            os.path.join(out_dir, f"epoch_{self.epoch:05d}.png"),
            (np.clip(side, 0, 1) * 255).astype(np.uint8),
        )
        # per-person validation meshes (the reference exports .ply at every
        # validation, multiply_model.py:1083-1122)
        try:
            from .mesh_export import save_ply

            for p, (verts, faces) in enumerate(self.extract_canonical_meshes()):
                save_ply(
                    os.path.join(
                        out_dir, f"epoch_{self.epoch:05d}_person_{p}.ply"
                    ),
                    verts,
                    faces,
                )
        except Exception as e:
            print(f"validation mesh export failed: {e}")
        psnr = merged.get("psnr", 0.0)
        print(f"validation epoch {self.epoch}: PSNR {psnr:.2f} dB")
        return psnr

    # ------------------------------------------------------------------
    # opt_depth: per-frame translation refinement (multiply_model.py:230-484)
    # ------------------------------------------------------------------

    def opt_depth(self) -> None:
        print(f"opt_depth at epoch {self.epoch}")
        if self.seq._sam_masks is None:
            print("no SAM masks yet; skipping opt_depth")
            return
        for frame_idx in range(self.num_frames):
            self._opt_depth_frame(frame_idx)

    def _opt_depth_frame(self, frame_idx: int) -> None:
        item = self.seq.get_eval_item(frame_idx)
        H, W = item["img_size"]
        frame = self.seq.load_frame(frame_idx)  # full-image arrays for the
        # per-iteration render-anchor ray sampling
        sam = self.seq._sam_masks[frame_idx]  # (H, W, P) logits
        sam_probs_full = 1.0 / (1.0 + np.exp(-sam))

        # canonical meshes extracted once per frame (reference: once per frame)
        body = self.ts.params["body"]
        meshes = []
        for p in range(self.num_person):
            table = jax.tree.map(lambda x: x[p], body)
            cond = np.zeros(69, np.float32) if self.depth_cond_zero else (
                np.asarray(table.body_pose[frame_idx]) / np.pi
            )
            verts_c, faces = generate_mesh(
                self.canonical_sdf_fn(p, jnp.asarray(cond)),
                np.asarray(self.servers[p].verts_c),
                res_up=self.mesh_res_up,
            )
            meshes.append((verts_c, faces))
        # shared bucket across persons: the jitted loss takes stacked meshes
        v_to = max(_bucket_size(len(m[0]), self.mesh_pad_bucket) for m in meshes)
        f_to = max(_bucket_size(len(m[1]), self.mesh_pad_bucket) for m in meshes)
        meshes = [_pad_mesh_to(v, f, v_to, f_to) for v, f in meshes]

        scale = float(self.seq.scale)
        pose_cam = jnp.asarray(item["pose"])
        intr = jnp.asarray(item["intrinsics"])

        # sample valid pixels once (SAM-confident region)
        sam_sum = sam_probs_full.sum(-1)
        valid = (sam_sum >= 0.7) & (sam_sum <= 1.01)
        vy, vx = np.nonzero(valid)
        n_valid = len(vx)
        if n_valid == 0:
            return
        M = min(self.depth_pixel_samples, n_valid)
        sel = self.rng.choice(n_valid, M, replace=False)
        uv = np.stack([vx[sel], vy[sel]], -1).astype(np.float32)
        sam_probs = jnp.asarray(sam_probs_full[vy[sel], vx[sel]])
        scale_to_full = n_valid / M

        ep = self.epoch
        d_sched = float(depth_loss_schedule(1.0, ep))

        verts_all = jnp.stack([jnp.asarray(m[0]) for m in meshes])  # (P,V,3)
        faces_all = jnp.stack([jnp.asarray(m[1]) for m in meshes])  # (P,F,3)

        grad_fn = self._depth_grad_fn()
        consts = (
            jnp.asarray(uv), pose_cam, intr, jnp.asarray(frame_idx),
            verts_all, faces_all, sam_probs,
            jnp.asarray(scale_to_full, jnp.float32),
            jnp.asarray(d_sched, jnp.float32), jnp.asarray(scale),
        )
        anchor_consts = (
            self.ts.params["net"],
            self.person_state,
            jnp.asarray(self.epoch, jnp.int32),
        )
        # render-anchor ray sampling data (reference weighted-samples 512
        # fresh rays per iteration, multiply_model.py:332-336)
        n_rays = int(self.conf.model.get("depth_render_rays", 512))
        ray_data = {
            "rgb": frame["img"],
            "uv": frame["uv"],
            "object_mask": frame["mask_union"],
            "sam_mask": sam,  # logits; the loss sigmoids them
        }
        opt_state = adam_init(body)
        lr = jnp.asarray(self.conf.model.learning_rate)
        if self.depth_pose:
            active = jax.tree.map(lambda p: jnp.asarray(True), body)
        else:
            # translations only (multiply_model.py:256-260)
            active = BodyParamTable(
                betas=jnp.asarray(False),
                global_orient=jnp.asarray(False),
                transl=jnp.asarray(True),
                body_pose=jnp.asarray(False),
            )

        params = body
        skipped = 0
        for it in range(self.it_per_loop):
            samples, _ = weighted_sampling(ray_data, (H, W), n_rays, self.rng)
            rays = (
                jnp.asarray(samples["uv"], jnp.float32),
                jnp.asarray(samples["rgb"], jnp.float32),
                jnp.asarray(samples["sam_mask"], jnp.float32),
            )
            self.key, k = jax.random.split(self.key)
            params, opt_state, val, parts, finite = grad_fn(
                params, opt_state, lr, active, k, *consts, *rays,
                *anchor_consts
            )
            skipped += int(not bool(finite))
            if it == 0 or it == self.it_per_loop - 1:
                print(
                    f"  opt_depth frame {frame_idx} it {it}: "
                    f"total={float(val):.4f} "
                    f"depth={float(parts['depth_order']):.4f} "
                    f"interp={float(parts['interpenetration']):.4f} "
                    f"render={float(parts['render']):.4f}"
                )
                self._dump_depth_maps(
                    frame_idx, it, item, params, meshes, sam_probs_full
                )
        if skipped:
            print(
                f"  opt_depth frame {frame_idx}: skipped {skipped}/"
                f"{self.it_per_loop} non-finite iterations (NaN guard)"
            )
        self.ts = self.ts._replace(
            params={"net": self.ts.params["net"], "body": params}
        )

    def _depth_grad_fn(self):
        """One persistent jitted value_and_grad for the opt_depth loss: frame
        data (meshes, camera, pixels, anchor rays) are traced ARGUMENTS, so
        the XLA compilation is shared across frames/epochs with the same mesh
        bucket — the closure-per-frame version recompiled the whole ray-mesh
        graph for every frame (minutes each on the host).

        The objective is the reference's exact opt_depth composition
        (multiply_model.py:360-384,465-478): mesh depth-order +
        interpenetration terms PLUS the full model render loss on freshly
        weighted-sampled rays, added unweighted. The render anchor is what
        keeps the translation pass from drifting in-plane; gradients flow to
        the body params only (net params enter as non-differentiated args).

        The Adam update is fused in, behind the same non-finite skip the main
        step uses (multiply_model.py:212-214): one NaN gradient must not
        corrupt params + optimizer state for the rest of the loop."""
        if getattr(self, "_depth_grad", None) is None:
            deformers = [
                jax.tree.map(lambda x: x[p], self.person_state.deformer)
                for p in range(self.num_person)
            ]
            servers = self.servers
            P_count = self.num_person
            sil_weight = float(self.silhouette_weight)  # trace-time constant
            renderer = self.renderer
            loss_cfg = self.loss_cfg
            cond_zero = bool(self.depth_cond_zero)

            def loss_fn(body_params, key, uv, pose_cam, intr, frame_idx,
                        verts_all, faces_all, sam_probs, scale_to_full,
                        d_sched, scale,
                        ray_uv, ray_rgb, ray_sam, net_params, person_state,
                        epoch):
                ray_d, cam_loc = get_camera_params(uv, pose_cam, intr)
                ray_o = jnp.broadcast_to(cam_loc, ray_d.shape)
                verts_d, faces_list = [], []
                for p in range(P_count):
                    table = jax.tree.map(lambda x: x[p], body_params)
                    thetas = jnp.concatenate(
                        [table.global_orient[frame_idx], table.body_pose[frame_idx]]
                    )
                    out = servers[p](
                        scale, table.transl[frame_idx], thetas, table.betas[0]
                    )
                    vd = deformers[p].forward(verts_all[p], out["smpl_tfs"])
                    verts_d.append(vd / scale)
                    faces_list.append(faces_all[p])
                # rays are in normalized space; meshes were unscaled like the
                # reference's renderer (1/scale) — transform rays equivalently
                d_loss, _ = sparse_depth_order_loss(
                    ray_o / scale, ray_d, verts_d, faces_list, sam_probs,
                    scale_to_full=scale_to_full,
                )
                i_loss = interpenetration_loss(
                    verts_d, faces_list, key, num_samples=self.interp_samples
                )
                d_w = self.depth_order_weight * d_sched * d_loss
                i_w = self.interpenetration_weight * d_sched * i_loss
                total = d_w + i_w
                if sil_weight > 0:
                    from .pose_losses import sparse_silhouette_loss

                    s_loss = sparse_silhouette_loss(
                        ray_o / scale, ray_d, verts_d, faces_list, sam_probs
                    )
                    total = total + sil_weight * d_sched * s_loss

                # render anchor: full forward + Loss on the sampled rays
                # (temporal term disabled, multiply_model.py:334)
                body = body_params
                thetas_r = jax.vmap(lambda t: t.thetas(frame_idx))(body)
                transl_r = jax.vmap(lambda t: t.transl[frame_idx])(body)
                betas_r = jax.vmap(lambda t: t.betas[0])(body)
                rinputs = RenderInputs(
                    uv=ray_uv,
                    pose=pose_cam,
                    intrinsics=intr,
                    scale=jnp.broadcast_to(scale, (P_count,)),
                    transl=transl_r,
                    thetas=thetas_r,
                    betas=betas_r,
                    frame_idx=frame_idx,
                    epoch=epoch,
                )
                rout = renderer.render(
                    net_params, person_state, rinputs, train=True,
                    key=jax.random.fold_in(key, 3), cond_zero=cond_zero,
                )
                rout["temporal_loss"] = jnp.zeros(())
                render_loss, _ = total_loss(
                    loss_cfg, rout, ray_rgb, epoch, sam_mask_logits=ray_sam
                )
                total = total + render_loss
                parts = {
                    "depth_order": d_w,
                    "interpenetration": i_w,
                    "render": render_loss,
                }
                return total, parts

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def step_fn(params, opt_state, lr, active, key, *args):
                (val, parts), grads = grad_fn(params, key, *args)
                finite = jnp.isfinite(val) & jax.tree.reduce(
                    jnp.logical_and,
                    jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads),
                )
                upd_params, upd_opt = adam_update(
                    grads, opt_state, params, lr, None, active
                )
                # full skip on non-finite, matching the reference's
                # `if not torch.isfinite(loss): continue`
                # (multiply_model.py:212-214): params AND optimizer state
                # (m, v, count) are left untouched, not just the gradient.
                new_params = jax.tree.map(
                    lambda new, old: jnp.where(finite, new, old),
                    upd_params, params,
                )
                new_opt = jax.tree.map(
                    lambda new, old: jnp.where(finite, new, old),
                    upd_opt, opt_state,
                )
                return new_params, new_opt, val, parts, finite

            self._depth_grad = jax.jit(step_fn)
        return self._depth_grad

    def _dump_depth_maps(
        self, frame_idx, it, item, body_params, meshes, sam_probs_full
    ) -> None:
        """stage_depth_map front/gt debug dumps at the first/last opt_depth
        iteration (multiply_model.py:434-456): rasterize the deformed meshes
        with the current translations, colormap front depth and the
        SAM-argmax person's depth."""
        try:
            import cv2

            from .instance_masks import project_depth

            H, W = item["img_size"]
            scale = float(self.seq.scale)
            P_mat = item["P"] @ np.diag([scale] * 3 + [1.0])
            depths = []
            for p in range(self.num_person):
                table = jax.tree.map(lambda x: x[p], body_params)
                thetas = jnp.concatenate(
                    [table.global_orient[frame_idx], table.body_pose[frame_idx]]
                )
                out = self.servers[p](
                    jnp.asarray(scale), table.transl[frame_idx], thetas,
                    table.betas[0],
                )
                deformer = jax.tree.map(
                    lambda x: x[p], self.person_state.deformer
                )
                vd = np.asarray(
                    deformer.forward(jnp.asarray(meshes[p][0]), out["smpl_tfs"])
                ) / scale
                vp = project_depth(P_mat, vd).astype(np.float32)
                from ..native import rasterize_depth

                depths.append(rasterize_depth(vp, meshes[p][1], W, H))
            depth = np.stack(depths, 0)  # (P, H, W), inf = miss
            finite = np.isfinite(depth)
            depth_f = np.where(finite, depth, 999.0)
            front = depth_f.min(0)
            gt_idx = np.argmax(sam_probs_full, axis=-1)  # (H, W)
            gt = np.take_along_axis(depth_f, gt_idx[None], axis=0)[0]

            def colormap(d):
                d = np.clip(d, 2.5, 5.0)
                d = ((d - 2.5) / 2.5 * 255).astype(np.uint8)
                return cv2.applyColorMap(255 - d, cv2.COLORMAP_JET)

            out_dir = os.path.join(
                self.run_dir, "stage_depth_map",
                f"{self.epoch:05d}", f"{it:05d}",
            )
            os.makedirs(os.path.join(out_dir, "front"), exist_ok=True)
            os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)
            cv2.imwrite(
                os.path.join(out_dir, "front", f"front_{frame_idx:04d}.png"),
                colormap(front),
            )
            cv2.imwrite(
                os.path.join(out_dir, "gt", f"gt_{frame_idx:04d}.png"),
                colormap(gt),
            )
        except Exception as e:  # debug dumps must never kill the pass
            print(f"stage_depth_map dump failed: {e}")

    # ------------------------------------------------------------------
    # checkpointing (orbax)
    # ------------------------------------------------------------------

    def save_checkpoint(self, ckpt_dir: str, tag: str | None = None) -> None:
        import orbax.checkpoint as ocp

        name = tag or f"epoch_{self.epoch:05d}"
        path = os.path.abspath(os.path.join(ckpt_dir, name))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"ts": self.ts, "epoch": self.epoch}, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path), {"ts": self.ts, "epoch": self.epoch}
        )
        self.ts = restored["ts"]
        self.epoch = int(restored["epoch"])
