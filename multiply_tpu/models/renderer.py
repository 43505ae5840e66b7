"""Multi-person VolSDF renderer: per-person canonical SDF fields + SMPL
deformation + NeRF++ background, composited with interval-based volume
rendering.

Parity target: code/lib/model/multiply.py (class Multiply). TPU-first
redesign relative to the reference:

  * the python `for person_id in person_list` loop (multiply.py:254) is a
    **vmapped person axis** over stacked per-person params/state;
  * host-side trimesh OBB ray culling (multiply.py:256, a GPU->CPU sync every
    step) becomes an in-graph ray/AABB mask — non-hitting rays keep static
    shapes and are zeroed by masking, not compacted;
  * nerfacc's variable-length packed composition (multiply.py:425-480) becomes
    a fixed-shape (R, P*S) sort + cumulative free-energy scan — identical
    interval math (alpha_i = 1-exp(-sigma_i * delta_i) with each person's own
    interval lengths, transmittance in sorted order);
  * the reverse-mode autograd chains for normals (multiply.py:620-661) become
    one batched VJP for the SDF gradient; the deformer Jacobian is the blended
    bone rotation in closed form (weights are stop-grad);
  * kaolin in/off-surface mesh tests (multiply.py:313-316) query a per-person
    canonical SDF voxel grid baked once at setup.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..body.server import SMPLServer, smpl_server_forward
from ..ops.density import laplace_beta, laplace_density
from ..ops.grid_pallas import grid_query_auto
from ..ops.mesh_ops import ray_aabb_hit, sdf_grid
from ..utils.cameras import get_camera_params
from .deformer import SMPLDeformer
from .networks import BetaEncoder, ImplicitNet, OffsetHead, RenderingNet
from .ray_sampler import SamplerConfig, error_bound_sample

OUTLIER_SDF = 4.0  # large SDF for KNN outliers at eval (multiply.py:143)


class PersonState(NamedTuple):
    """Stacked-over-persons pytree of all per-person static state."""

    server: SMPLServer
    deformer: SMPLDeformer
    cano_grid: dict  # baked canonical SDF grid {"grid","origin","spacing"}
    surface_sample_logits: jnp.ndarray  # (V,) vertex sampling logits for the
    # SMPL-surface loss (head/hands/feet excluded, multiply.py:339-346)


class RenderInputs(NamedTuple):
    """One frame's render request (single camera, R rays)."""

    uv: jnp.ndarray  # (R, 2)
    pose: jnp.ndarray  # (4, 4) cam-to-world
    intrinsics: jnp.ndarray  # (3, 3)
    scale: jnp.ndarray  # (P,)
    transl: jnp.ndarray  # (P, 3)
    thetas: jnp.ndarray  # (P, 72)
    betas: jnp.ndarray  # (P, 10)
    frame_idx: jnp.ndarray  # () int
    epoch: jnp.ndarray  # () int — drives loss/conditioning schedules


class MultiplyRenderer:
    """Static model definition; all compute methods are pure in `params`."""

    def __init__(self, conf, num_persons: int, num_frames: int):
        self.conf = conf
        self.P = num_persons
        self.num_frames = num_frames
        self.dim_frame = conf.get("dim_frame_encoding", 32)
        self.scene_sphere = conf.implicit_network.get("scene_bounding_sphere", 3.0)
        self.threshold = 0.05  # off-surface threshold (multiply.py:88)
        self.smpl_surface_weight = conf.loss.get("smpl_surface_weight", 0)
        self.zero_pose_weight = conf.loss.get("zero_pose_weight", 0)
        # shared shape net + per-person identity latents (multiply.py:30-51)
        self.use_person_encoder = bool(conf.get("use_person_encoder", False))
        # per-person refinement head / shape-code injection over a shared net
        # (networks.py offset_head / beta_encoding options)
        self.offset_head_on = bool(conf.implicit_network.get("offset_head", False))
        self.beta_encoding_on = bool(conf.implicit_network.get("beta_encoding", False))

        self.fg_implicit = ImplicitNet.from_config(conf.implicit_network)
        # per-person tri-plane identity conditioning (cond: smpl_tri,
        # reference networks.py:32-39,140-148): the 69-d pose is concatenated
        # with a 64-d tri-plane feature sampled at x/2 inside _implicit
        self.triplane_on = self.fg_implicit.cond == "smpl_tri"
        # multi-resolution pyramid + delta-SDF variant (reference
        # networks.py:36-37 selects TriPlaneMulti via `multi_triplane`)
        self.multi_triplane = self.triplane_on and bool(
            conf.implicit_network.get("multi_triplane", False)
        )
        if self.multi_triplane:
            from .triplane import TriPlaneMulti

            self.triplane = TriPlaneMulti(
                features=64,
                resolutions=tuple(
                    conf.implicit_network.get("triplane_res", (128, 64, 32, 16))
                ),
            )
        elif self.triplane_on:
            from .triplane import TriPlane

            self.triplane = TriPlane(
                features=64,
                resolution=int(conf.implicit_network.get("triplane_resolution", 128)),
            )
        self.offset_head = OffsetHead(
            feature_vector_size=conf.implicit_network.feature_vector_size,
            no_head_feature=bool(conf.implicit_network.get("no_head_feature", False)),
        )
        self.beta_encoder = BetaEncoder(width=conf.implicit_network.dims[0])
        self.fg_render = RenderingNet.from_config(conf.rendering_network)
        self.bg_implicit = ImplicitNet.from_config(conf.bg_implicit_network)
        self.bg_render = RenderingNet.from_config(conf.bg_rendering_network)
        self.sampler_cfg = SamplerConfig.from_config(
            conf.ray_sampler, scene_bounding_sphere=self.scene_sphere
        )
        self.beta_init = float(conf.density.params_init.get("beta", 0.1))
        self.beta_min = float(conf.density.get("beta_min", 1e-4))
        # bf16 for the sampler's SDF evals (placement-only decisions; the
        # final render evals stay f32). Off by default for reference parity.
        self.sampler_bf16 = bool(conf.get("sampler_bf16", False))
        # pairwise-attenuation composite: replaces the 9-operand depth sort
        # with per-person cumsums + an (R,S,S) cross-person mask contraction
        # (MXU work instead of sort-network data movement); numerically
        # identical to the sorted composite up to float association.
        # On by default: won the round-4 on-chip A/B (+3.3% end-to-end,
        # 5853 vs 5665 rays/s at the 512-ray full-scale config, docs/
        # ab_r4.jsonl). Cost is O(P²·R·S²) — disable if raising render
        # samples far past the production 98/person.
        self.composite_matmul = bool(conf.get("composite_matmul", True))
        # clip each person's sampling interval to its box entry/exit
        # (use_bbox_sampler concept; off by default for reference parity)
        self.bbox_ray_range = bool(conf.get("bbox_ray_range", False))
        # NOTE: a fused Pallas sampler-MLP kernel was evaluated and removed:
        # with bf16 weights it beats XLA by 14% in isolation (1.50 vs 1.74 ms
        # at 65k pts x 8x256 on v5e) but loses 12% end-to-end because the
        # kernel boundary blocks XLA from fusing the deformer-inverse/PE
        # pipeline into the matmuls. XLA's own pipeline is the fast path.

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def init_params(self, key: jax.Array) -> dict:
        kf, kr, kb, kbr, kl = jax.random.split(key, 5)
        d_in = self.fg_implicit.d_in
        cond_dim = {"smpl": 69, "frame": 32, "smpl_id": 133, "smpl_tri": 133, "none": 0}[
            self.fg_implicit.cond
        ]
        x = jnp.zeros((2, d_in))
        if self.use_person_encoder and not self.triplane_on:
            cond_dim = 69 + 64  # pose + person identity latent ('smpl_id')
        cond = jnp.zeros((cond_dim,)) if cond_dim else None

        feat = jnp.zeros((2, self.fg_implicit.feature_vector_size))
        if self.use_person_encoder:
            # one shared shape network; separate per-person render nets
            # (multiply.py:41-45 for rendering mode 'pose_no_view')
            fg_imp = self.fg_implicit.init(kf, x, cond)
        else:
            fg_imp = jax.vmap(lambda k: self.fg_implicit.init(k, x, cond))(
                jax.random.split(kf, self.P)
            )
        render_id = jnp.zeros((64,)) if self.fg_render.mode == "pose_id_no_view" else None
        fg_ren = jax.vmap(
            lambda k: self.fg_render.init(
                k, x, x, -x, jnp.zeros((69,)), feat, id_latent=render_id
            )
        )(jax.random.split(kr, self.P))

        bg_x = jnp.zeros((2, self.bg_implicit.d_in))
        bg_imp = self.bg_implicit.init(kb, bg_x, jnp.zeros((self.dim_frame,)))
        bg_ren = self.bg_render.init(
            kbr,
            None,
            None,
            jnp.zeros((2, 3)),
            None,
            feat,
            frame_latent=jnp.zeros((self.dim_frame,)),
        )
        frame_latent = (
            jax.random.normal(kl, (self.num_frames, self.dim_frame)) * 0.01
        )
        params = {
            "fg_implicit": fg_imp,
            "fg_render": fg_ren,
            "bg_implicit": bg_imp,
            "bg_render": bg_ren,
            "frame_latent": frame_latent,
            "beta": jnp.asarray([self.beta_init]),
        }
        if self.use_person_encoder:
            params["person_latent"] = (
                jax.random.normal(jax.random.fold_in(kl, 1), (self.P, 64)) * 0.1
            )
        if self.triplane_on:
            params["triplane"] = jax.vmap(
                lambda k: self.triplane.init(k, jnp.zeros((2, 3)))
            )(jax.random.split(jax.random.fold_in(kf, 4), self.P))
        if self.offset_head_on:
            out0 = jnp.zeros((2, 1 + self.fg_implicit.feature_vector_size))
            from ..ops.embedders import embedding_dim

            inp0 = jnp.zeros((2, embedding_dim(self.fg_implicit.multires, d_in)))
            params["offset_head"] = jax.vmap(
                lambda k: self.offset_head.init(k, out0, cond, inp0)
            )(jax.random.split(jax.random.fold_in(kf, 2), self.P))
        if self.beta_encoding_on:
            params["beta_encoder"] = jax.vmap(
                lambda k: self.beta_encoder.init(k, jnp.zeros((10,)), 2)
            )(jax.random.split(jax.random.fold_in(kf, 3), self.P))
        return params

    def implicit_bundle(self, params: dict, person_id: int | None = None) -> dict:
        """Per-person implicit-field parameter bundle (shared net + optional
        per-person head/encoder). person_id=None returns the stacked bundle
        for vmapping; an int selects one person (host-side callers)."""
        sel = (
            (lambda t, ax0: t)
            if person_id is None
            else (lambda t, ax0: jax.tree.map(lambda x: x[person_id], t) if ax0 else t)
        )
        bundle = {
            "imp": sel(params["fg_implicit"], not self.use_person_encoder)
            if person_id is not None
            else params["fg_implicit"]
        }
        if self.offset_head_on:
            bundle["head"] = sel(params["offset_head"], True)
        if self.beta_encoding_on:
            bundle["benc"] = sel(params["beta_encoder"], True)
        if self.triplane_on:
            bundle["tri"] = sel(params["triplane"], True)
        return bundle

    def bundle_axes(self) -> dict:
        axes = {"imp": None if self.use_person_encoder else 0}
        if self.offset_head_on:
            axes["head"] = 0
        if self.beta_encoding_on:
            axes["benc"] = 0
        if self.triplane_on:
            axes["tri"] = 0
        return axes

    def build_person_state(
        self,
        servers: list[SMPLServer],
        surface_logits: list[np.ndarray] | None = None,
        grid_res: int = 64,
    ) -> PersonState:
        """Bake per-person canonical state (host-time, not jitted)."""
        states = []
        for i, server in enumerate(servers):
            deformer = SMPLDeformer.create(server)
            grid = sdf_grid(server.verts_c, server.model.faces, res=grid_res)
            logits = (
                jnp.asarray(surface_logits[i], jnp.float32)
                if surface_logits is not None
                else jnp.zeros((server.verts_c.shape[0],))
            )
            states.append(
                PersonState(
                    server=server,
                    deformer=deformer,
                    cano_grid=grid,
                    surface_sample_logits=logits,
                )
            )
        return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *states)

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------

    def _implicit(self, bundle, x, cond_vec, betas=None):
        """Foreground SDF+feature for one person: (N,3) -> (N, 1+F).

        `bundle`: {"imp": shared/per-person ImplicitNet params,
        optional "head": OffsetHead params, "benc": BetaEncoder params}."""
        if not isinstance(bundle, dict):
            bundle = {"imp": bundle}
        dsdf = None
        if "tri" in bundle:
            # smpl_tri conditioning (reference networks.py:140-148): keep the
            # first 69 pose dims (strip any person latent), append a per-point
            # tri-plane feature sampled at x/2 (the reference's range guard)
            if self.multi_triplane:
                tri, dsdf = self.triplane.apply(bundle["tri"], x * 0.5)
            else:
                tri = self.triplane.apply(bundle["tri"], x * 0.5)
            pose = jnp.broadcast_to(
                cond_vec[..., :69], x.shape[:-1] + (69,)
            )
            cond_vec = jnp.concatenate([pose, tri.astype(pose.dtype)], axis=-1)
        # match the input dtype to the params: bf16 sampler bundles must not
        # promote back to f32 through a mixed-dtype matmul
        param_dtype = jax.tree_util.tree_leaves(bundle["imp"])[0].dtype
        if param_dtype == jnp.bfloat16 and x.dtype != jnp.bfloat16:
            x = x.astype(jnp.bfloat16)
            cond_vec = None if cond_vec is None else cond_vec.astype(jnp.bfloat16)
            betas = None if betas is None else betas.astype(jnp.bfloat16)
        layer0_extra = None
        if "benc" in bundle and betas is not None:
            layer0_extra = self.beta_encoder.apply(bundle["benc"], betas, x.shape[0])
        out = self.fg_implicit.apply(
            bundle["imp"], x, cond_vec, layer0_extra=layer0_extra
        )
        if dsdf is not None and "head" not in bundle:
            # pyramid delta-SDF added to the SDF channel. The reference adds
            # it only when no per-person offset head exists ("since we have
            # separate head, we do not need dsdf here", networks.py:183-205 —
            # with a head, the head's own delta takes over).
            out = jnp.concatenate(
                [out[:, :1] + dsdf[:, None].astype(out.dtype), out[:, 1:]],
                axis=-1,
            )
        if "head" in bundle:
            from ..ops.embedders import positional_encoding

            inp = positional_encoding(x, self.fg_implicit.multires)
            out = self.offset_head.apply(bundle["head"], out, cond_vec, inp)
        return out

    def _sdf_with_deformer(
        self, bundle, deformer: SMPLDeformer, tfs, posed_verts, cond_vec,
        x, train: bool, betas=None,
    ):
        """multiply.py:137-151 — inverse-warp then canonical SDF."""
        x_c, outlier = deformer.inverse(x, tfs, posed_verts)
        out = self._implicit(bundle, x_c, cond_vec, betas=betas)
        sdf = out[:, 0]
        if not train:
            sdf = jnp.where(outlier, OUTLIER_SDF, sdf)
        return sdf, x_c, out[:, 1:]

    def _person_rays(
        self,
        bundle,
        state: PersonState,
        scale,
        transl,
        thetas,
        betas,
        cond_vec,
        ray_o,
        ray_d,
        beta0,
        train: bool,
        key,
    ) -> dict:
        """Everything per-person: SMPL, sampling, SDF, color, normals.

        vmapped over the person axis by the caller.
        """
        R = ray_o.shape[0]
        smpl_out = smpl_server_forward(state.server, scale, transl, thetas, betas)
        tfs = smpl_out["smpl_tfs"]
        verts = smpl_out["smpl_verts"]

        # in-graph replacement of the OBB ray culling: padded AABB hit mask
        center = 0.5 * (jnp.max(verts, 0) + jnp.min(verts, 0))
        half = 0.5 * (jnp.max(verts, 0) - jnp.min(verts, 0)) * 1.2
        from ..ops.mesh_ops import ray_aabb_range

        t_near, t_far, hit = ray_aabb_range(ray_o, ray_d, center - half, center + half)

        if self.sampler_bf16:
            bundle16 = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                bundle,
            )
            cond16 = cond_vec.astype(jnp.bfloat16)

            def sdf_only(pts):
                s = self._sdf_with_deformer(
                    bundle16, state.deformer, tfs, verts, cond16,
                    pts, train, betas=betas,
                )[0]
                return s.astype(jnp.float32)

        else:
            sdf_only = lambda pts: self._sdf_with_deformer(
                bundle, state.deformer, tfs, verts, cond_vec, pts, train, betas=betas
            )[0]
        ray_range = None
        if self.bbox_ray_range:
            # miss rays keep the full interval (they're masked out anyway)
            rn = jnp.where(hit, t_near, 0.0)
            rf = jnp.where(hit, t_far, 2.0 * self.scene_sphere)
            ray_range = (jax.lax.stop_gradient(rn), jax.lax.stop_gradient(rf))
        samp = error_bound_sample(
            self.sampler_cfg,
            lambda pts: jax.lax.stop_gradient(sdf_only(jax.lax.stop_gradient(pts))),
            ray_o,
            ray_d,
            beta0,
            key=key if train else None,
            ray_range=ray_range,
        )
        z_all = jax.lax.stop_gradient(samp["z_vals"])  # (R, S+1) incl. far
        z_vals, z_max = z_all[:, :-1], z_all[:, -1]
        S = z_vals.shape[-1]

        pts = (ray_o[:, None, :] + z_vals[..., None] * ray_d[:, None, :]).reshape(-1, 3)
        # one implicit forward shared between the render values and the
        # normals VJP (a separate jax.vjp would re-run the whole network)
        x_c, outlier = state.deformer.inverse(pts, tfs, verts)

        def f(xc):
            out = self._implicit(bundle, xc, cond_vec, betas=betas)
            return out[:, 0], out[:, 1:]

        (sdf, feat), vjp_fn = jax.vjp(f, x_c)
        if not train:
            sdf = jnp.where(outlier, OUTLIER_SDF, sdf)
        (sdf_grad_c,) = vjp_fn((jnp.ones_like(sdf), jnp.zeros_like(feat)))
        _, m_rows = state.deformer.forward_jacobian_rows(x_c, tfs)
        from ..ops.skinning import covector_apply_rows, rotation_inverse_rows

        # n_d = g^T J^{-1}, all SoA — no (N,3,3) materialization
        n_d = covector_apply_rows(rotation_inverse_rows(m_rows), sdf_grad_c)
        normals = n_d / jnp.maximum(
            jnp.linalg.norm(n_d, axis=-1, keepdims=True), 1e-6
        )

        return {
            "z_vals": z_vals,
            "z_max": z_max,
            "sdf": sdf.reshape(R, S),
            "x_c": x_c,
            "feat": feat,
            "normals": normals,
            "hit": hit,
            "tfs": tfs,
            "verts": verts,
            "smpl_out": smpl_out,
        }

    # ------------------------------------------------------------------
    # full forward
    # ------------------------------------------------------------------

    def render(
        self,
        params: dict,
        state: PersonState,  # stacked over P
        inputs: RenderInputs,
        train: bool,
        key: jax.Array | None = None,
        cond_zero: bool = False,  # static: force zero pose conditioning
        # (reference cond_zero_shit flag, multiply.py:272 — used by the
        # opt_depth render anchor under depth_cond_zero)
    ) -> dict[str, Any]:
        cfg = self.sampler_cfg
        ray_d, cam_loc = get_camera_params(inputs.uv, inputs.pose, inputs.intrinsics)
        R = ray_d.shape[0]
        ray_o = jnp.broadcast_to(cam_loc, (R, 3))

        beta = laplace_beta(params["beta"][0], self.beta_min)
        beta0 = jax.lax.stop_gradient(beta)

        # epoch-keyed conditioning pose (multiply.py:270-273)
        cond_pose = inputs.thetas[:, 3:] / jnp.pi  # (P, 69)
        if train:
            ep = inputs.epoch
            zero_cond = jnp.logical_or(ep < 20, ep % 20 == 0)
            if cond_zero:
                zero_cond = jnp.asarray(True)
            cond_pose = jnp.where(zero_cond, 0.0, cond_pose)

        # implicit-net conditioning: pose, or pose + person identity latent
        if self.use_person_encoder:
            cond_vec = jnp.concatenate([cond_pose, params["person_latent"]], axis=-1)
            id_latent = params["person_latent"]
        else:
            cond_vec = cond_pose
            id_latent = jnp.zeros((self.P, 64))

        keys = jax.random.split(key, self.P) if key is not None else None

        def person_fn(pp, pr, st, sc, tr, th, be, cv, cp, il, k):
            out = self._person_rays(
                pp, st, sc, tr, th, be, cv, ray_o, ray_d, beta0, train, k
            )
            view = -jnp.repeat(ray_d, out["z_vals"].shape[-1], axis=0)
            if self.fg_render.mode == "pose_id_no_view":
                rgb = self.fg_render.apply(
                    pr, out["x_c"], out["normals"], view, cp, out["feat"],
                    id_latent=il,
                )
            else:
                rgb = self.fg_render.apply(
                    pr, out["x_c"], out["normals"], view, cp, out["feat"],
                )
            out["rgb"] = rgb
            return out

        bundle = self.implicit_bundle(params)
        pout = jax.vmap(
            person_fn, in_axes=(self.bundle_axes(), 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
        )(
            bundle,
            params["fg_render"],
            state,
            inputs.scale,
            inputs.transl,
            inputs.thetas,
            inputs.betas,
            cond_vec,
            cond_pose,
            id_latent,
            keys if keys is not None else jnp.zeros((self.P, 2), jnp.uint32),
        )

        S = pout["z_vals"].shape[-1]

        # ---------------- interval composition over persons ----------------
        z = pout["z_vals"]  # (P, R, S)
        z_max = pout["z_max"]  # (P, R)
        ends = jnp.concatenate([z[..., 1:], z_max[..., None]], axis=-1)
        delta = ends - z  # (P, R, S)
        sigma = laplace_density(pout["sdf"], beta)  # (P, R, S)
        sigma = sigma * pout["hit"][:, :, None]  # mask non-hitting rays

        fe = sigma * delta  # free energy per interval
        rgb = pout["rgb"].reshape(self.P, R, S, 3)
        normals = pout["normals"].reshape(self.P, R, S, 3)

        if self.composite_matmul:
            # -------- pairwise-attenuation composite (sort-free) --------
            # weight of interval i of person p = alpha_i * exp(-(own prefix
            # free energy + Σ_{q≠p} fe_q over intervals ending before
            # end_p[i])). Equals the globally-depth-sorted composite exactly
            # (stable sort resolves cross-person ties person-major, hence
            # <= for q < p, < for q > p). The cross term is an (R,S,S)
            # mask·fe contraction — MXU work instead of a 9-operand sort.
            # COST: O(P²·R·S²) FLOPs and an (R,S,S) f32 mask per ordered
            # pair (~20 MB at R=512, S=98; grows quadratically if anyone
            # raises render samples). Default since the round-4 on-chip
            # A/B: +3.3% end-to-end vs the sort (docs/ab_r4.jsonl).
            cum_own = jnp.cumsum(fe, axis=-1)
            own_prefix = cum_own - fe  # exclusive prefix, (P,R,S)
            cross = []
            for p in range(self.P):
                acc = jnp.zeros((R, S))
                for q in range(self.P):
                    if q == p:
                        continue
                    if q < p:
                        m = ends[q][:, None, :] <= ends[p][:, :, None]
                    else:
                        m = ends[q][:, None, :] < ends[p][:, :, None]
                    # HIGHEST: the cross-attenuation sum must be exact-ish —
                    # bf16 underestimates let Σ w_p exceed 1 (acc_map > 1
                    # NaNs the bce backward); the matvec is ~10 MFLOPs, noise
                    acc = acc + jnp.einsum(
                        "rij,rj->ri", m.astype(fe.dtype), fe[q],
                        precision=jax.lax.Precision.HIGHEST,
                    )
                cross.append(acc)
            cross = jnp.stack(cross)  # (P,R,S)
            w_p = (1.0 - jnp.exp(-fe)) * jnp.exp(-(own_prefix + cross))
            bg_transmittance = jnp.exp(-jnp.sum(fe, axis=(0, -1)))  # (R,)
            fg_rgb_values = jnp.einsum("prs,prsc->rc", w_p, rgb)
            normal_values = jnp.einsum("prs,prsc->rc", w_p, normals)
            acc_person = jnp.sum(w_p, axis=-1).T  # (R, P)
            acc_map = jnp.sum(acc_person, axis=-1)
            weights = jnp.moveaxis(w_p, 0, 1).reshape(R, self.P * S)
        else:
            def flat(x):  # (P,R,S,...) -> (R, P*S, ...)
                x = jnp.moveaxis(x, 0, 1)  # (R,P,S,...)
                return x.reshape((R, self.P * S) + x.shape[3:])

            ends_f, fe_f = flat(ends), flat(fe)
            rgb_f, nrm_f = flat(rgb), flat(normals)
            pid = jnp.broadcast_to(
                jnp.arange(self.P)[:, None, None], (self.P, R, S)
            )
            pid_f = flat(pid)

            # one multi-operand sort (key = interval end) instead of argsort +
            # five gathers — TPU gathers dominated the profiled step otherwise
            (_, fe_s, r0, r1, r2, n0, n1, n2, pid_s) = jax.lax.sort(
                (
                    ends_f, fe_f,
                    rgb_f[..., 0], rgb_f[..., 1], rgb_f[..., 2],
                    nrm_f[..., 0], nrm_f[..., 1], nrm_f[..., 2],
                    pid_f.astype(jnp.float32),
                ),
                dimension=-1,
                num_keys=1,
            )
            rgb_s = jnp.stack([r0, r1, r2], axis=-1)
            nrm_s = jnp.stack([n0, n1, n2], axis=-1)
            pid_s = pid_s.astype(jnp.int32)

            alpha = 1.0 - jnp.exp(-fe_s)
            shifted = jnp.concatenate([jnp.zeros((R, 1)), fe_s[:, :-1]], axis=-1)
            trans = jnp.exp(-jnp.cumsum(shifted, axis=-1))
            weights = alpha * trans  # (R, P*S)

            bg_transmittance = jnp.exp(-jnp.sum(fe_s, axis=-1))  # (R,)
            fg_rgb_values = jnp.sum(weights[..., None] * rgb_s, axis=-2)
            normal_values = jnp.sum(weights[..., None] * nrm_s, axis=-2)
            acc_map = jnp.sum(weights, axis=-1)
            acc_person = jnp.sum(
                weights[:, :, None]
                * (pid_s[:, :, None] == jnp.arange(self.P)[None, None, :]),
                axis=1,
            )  # (R, P)

        # ---------------- background (NeRF++ inverse sphere) ----------------
        # fresh inverse-sphere samples, flipped 1->0 (multiply.py:482-484, 516)
        frame_latent = params["frame_latent"][inputs.frame_idx]
        z_bg = jnp.flip(self._bg_z(R, key, train), axis=-1)
        bg_rgb_values = self._render_background(
            params, ray_o, ray_d, z_bg, frame_latent
        )

        rgb_values = fg_rgb_values + bg_transmittance[:, None] * bg_rgb_values

        out: dict[str, Any] = {
            "rgb_values": rgb_values,
            "fg_rgb_values": fg_rgb_values
            + bg_transmittance[:, None] * jnp.ones_like(fg_rgb_values),
            "normal_values": normal_values,
            "acc_map": acc_map,
            "acc_person_list": acc_person,
            "bg_transmittance": bg_transmittance,
            "weights": weights,
            "hit": pout["hit"],
        }

        if train:
            out.update(
                self._training_extras(params, state, inputs, pout, cond_vec, key)
            )
        return out

    # -- helpers -------------------------------------------------------

    def _bg_z(self, R: int, key, train: bool) -> jnp.ndarray:
        from .ray_sampler import uniform_z_vals

        k = jax.random.fold_in(key, 17) if (train and key is not None) else None
        z = uniform_z_vals(
            jnp.zeros((R, 1)), jnp.ones((R, 1)), self.sampler_cfg.N_samples_inverse_sphere, k
        )
        return z * (1.0 / self.scene_sphere)

    def _render_background(self, params, ray_o, ray_d, z_bg, frame_latent):
        """NeRF++ inverse-sphere background (multiply.py:513-541, 682-726)."""
        R, Nb = z_bg.shape
        bg_dirs = jnp.repeat(ray_d[:, None, :], Nb, axis=1)
        bg_locs = jnp.repeat(ray_o[:, None, :], Nb, axis=1)
        bg_pts = depth2pts_outside(bg_locs, bg_dirs, z_bg, self.scene_sphere)

        bg_out = self.bg_implicit.apply(
            params["bg_implicit"], bg_pts.reshape(-1, 4), frame_latent
        )
        bg_sdf, bg_feat = bg_out[:, :1], bg_out[:, 1:]
        bg_rgb_flat = self.bg_render.apply(
            params["bg_render"],
            None,
            None,
            bg_dirs.reshape(-1, 3),
            None,
            bg_feat,
            frame_latent=frame_latent,
        )
        if bg_rgb_flat.shape[-1] == 4:
            shadow = bg_rgb_flat[:, 3:]
            bg_rgb_flat = (1.0 - shadow) * bg_rgb_flat[:, :3]
        bg_rgb = bg_rgb_flat.reshape(R, Nb, 3)

        # AbsDensity volume rendering in flipped (1->0) order (multiply.py:682-696)
        bg_density = jnp.abs(bg_sdf).reshape(R, Nb)
        bg_dists = z_bg[:, :-1] - z_bg[:, 1:]
        bg_dists = jnp.concatenate([bg_dists, jnp.full((R, 1), 1e10)], axis=-1)
        fe = bg_dists * bg_density
        shifted = jnp.concatenate([jnp.zeros((R, 1)), fe[:, :-1]], axis=-1)
        bg_alpha = 1.0 - jnp.exp(-fe)
        bg_trans = jnp.exp(-jnp.cumsum(shifted, axis=-1))
        bg_weights = bg_alpha * bg_trans
        return jnp.sum(bg_weights[..., None] * bg_rgb, axis=1)

    def _training_extras(self, params, state, inputs, pout, cond_pose, key):
        """Eikonal samples, in/off-surface tests, SMPL-surface loss
        (multiply.py:312-390). `cond_pose` here is the full implicit-net
        conditioning vector (pose, or pose+identity when sharing nets)."""
        P = self.P
        R, S = pout["sdf"].shape[1], pout["sdf"].shape[2]
        ep = inputs.epoch

        # in/off-surface per person via baked canonical SDF grid
        def person_surf(st, x_c):
            d = grid_query_auto(st.cano_grid, x_c).reshape(R, S)
            dmin = jnp.min(d, axis=-1)
            return dmin > self.threshold, dmin <= 0.0

        off_p, in_p = jax.vmap(person_surf)(state, pout["x_c"])
        # non-hitting rays: off=True, in=False (multiply.py:551-557)
        off_p = jnp.logical_or(off_p, ~pout["hit"])
        in_p = jnp.logical_and(in_p, pout["hit"])
        index_off_surface = jnp.all(off_p, axis=0)
        index_in_surface = jnp.any(in_p, axis=0)

        # eikonal: jitter around 512 random canonical verts per person
        n_eik = 512
        keys = jax.random.split(
            key if key is not None else jax.random.PRNGKey(0), 2 * P
        )

        def person_eik(pp, st, cp, be, k1, k2):
            V = st.server.verts_c.shape[0]
            idx = jax.random.randint(k1, (n_eik,), 0, V)
            sample = st.server.verts_c[idx] + jax.random.normal(k2, (n_eik, 3)) * 0.01

            def sdf_batch(x):
                return self._implicit(pp, x, cp, betas=be)[:, 0]

            _, vjp_fn = jax.vjp(sdf_batch, sample)
            (g,) = vjp_fn(jnp.ones((n_eik,)))
            return g

        bundle = self.implicit_bundle(params)
        grad_theta = jax.vmap(person_eik, in_axes=(self.bundle_axes(), 0, 0, 0, 0, 0))(
            bundle, state, cond_pose, inputs.betas, keys[:P], keys[P:]
        )  # (P, n_eik, 3)

        # SMPL-surface anchoring loss (multiply.py:336-362)
        smpl_surface_loss = jnp.zeros(())
        if self.smpl_surface_weight > 0:
            def person_surface_loss(pp, st, cp, be, tfs, verts, k):
                idx = jax.random.categorical(
                    k, st.surface_sample_logits, shape=(R,)
                )
                sample = verts[idx]
                x_c, _ = st.deformer.inverse(sample, tfs, verts)
                sdf = self._implicit(pp, x_c, cp, betas=be)[:, 0]
                viol = sdf > 0.02
                return jnp.sum(jnp.where(viol, sdf - 0.02, 0.0)) / jnp.maximum(
                    jnp.sum(viol), 1.0
                )

            ks = jax.random.split(jax.random.fold_in(key, 23), P)
            smpl_surface_loss = jnp.sum(
                jax.vmap(
                    person_surface_loss,
                    in_axes=(self.bundle_axes(), 0, 0, 0, 0, 0, 0),
                )(
                    bundle, state, cond_pose, inputs.betas,
                    pout["tfs"], pout["verts"], ks,
                )
            )

        # zero-pose consistency: the canonical field under the current pose
        # conditioning should match the zero-pose conditioning on canonical
        # surface points (multiply.py:364-390)
        zero_pose_loss = jnp.zeros(())
        if self.zero_pose_weight > 0:
            n_zp = 2000

            def person_zero_pose(pp, st, cp, be, k):
                V = st.server.verts_c.shape[0]
                idx = jax.random.randint(k, (n_zp,), 0, V)
                sample = st.server.verts_c[idx]
                out_pred = self._implicit(pp, sample, cp, betas=be)
                cp_zero = cp.at[:69].set(0.0) if cp.ndim == 1 else cp * 0.0
                out_zero = self._implicit(pp, sample, cp_zero, betas=be)
                return jnp.mean(jnp.abs(out_pred[:, :1] - out_zero[:, :1])) + jnp.mean(
                    jnp.abs(out_pred[:, 1:] - out_zero[:, 1:])
                )

            kz = jax.random.split(jax.random.fold_in(key, 31), P)
            zero_pose_loss = jnp.sum(
                jax.vmap(person_zero_pose, in_axes=(self.bundle_axes(), 0, 0, 0, 0))(
                    bundle, state, cond_pose, inputs.betas, kz
                )
            )

        return {
            "index_off_surface": index_off_surface,
            "index_in_surface": index_in_surface,
            "grad_theta": grad_theta.reshape(-1, 3),
            "smpl_surface_loss": smpl_surface_loss,
            "zero_pose_loss": zero_pose_loss,
            "epoch": ep,
        }


def depth2pts_outside(
    ray_o: jnp.ndarray, ray_d: jnp.ndarray, depth: jnp.ndarray, r: float
) -> jnp.ndarray:
    """NeRF++ inverse-sphere parameterization (multiply.py:698-726).

    depth is 1/distance in [0, 1/r]; returns (..., 4) points on the unit
    sphere + inverse depth.
    """
    o_dot_d = jnp.sum(ray_d * ray_o, axis=-1)
    under_sqrt = o_dot_d**2 - (jnp.sum(ray_o**2, axis=-1) - r**2)
    d_sphere = jnp.sqrt(jnp.maximum(under_sqrt, 0.0)) - o_dot_d
    p_sphere = ray_o + d_sphere[..., None] * ray_d
    p_mid = ray_o - o_dot_d[..., None] * ray_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1)

    rot_axis = jnp.cross(ray_o, p_sphere)
    rot_axis = rot_axis / jnp.maximum(
        jnp.linalg.norm(rot_axis, axis=-1, keepdims=True), 1e-12
    )
    phi = jnp.arcsin(jnp.clip(p_mid_norm / r, -1.0, 1.0))
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth, -1.0, 1.0))
    rot_angle = (phi - theta)[..., None]

    cosr, sinr = jnp.cos(rot_angle), jnp.sin(rot_angle)
    p_new = (
        p_sphere * cosr
        + jnp.cross(rot_axis, p_sphere) * sinr
        + rot_axis * jnp.sum(rot_axis * p_sphere, axis=-1, keepdims=True) * (1.0 - cosr)
    )
    p_new = p_new / jnp.maximum(jnp.linalg.norm(p_new, axis=-1, keepdims=True), 1e-12)
    return jnp.concatenate([p_new, depth[..., None]], axis=-1)
