"""SDF and appearance MLPs (flax.linen).

Parity targets: code/lib/model/networks.py —
  * ImplicitNet: 8x256 softplus(beta=100) MLP, skip connection at layer 4,
    Fourier PE, pose/frame conditioning injected at layer 0, geometric
    initialization (SAL), weight normalization, output [sdf, 256-d feature].
  * RenderingNet: modes 'idr', 'nerf_frame_encoding' (background),
    'pose_no_view' (foreground default), 'pose_id_no_view', 'nerf'.

Design notes (TPU): weight norm is an explicit reparameterization
w = g * v / ||v|| with g initialized to ||v|| (matching torch semantics where
initialization == the underlying init); everything is a pure function of
params so persons become a stacked leading axis via vmap.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.embedders import embedding_dim, positional_encoding


def softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """softplus with beta=100 (reference networks.py:85), numerically stable."""
    return jax.nn.softplus(100.0 * x) / 100.0


class WNDense(nn.Module):
    """Dense layer with optional torch-style weight normalization.

    The direction param `v` carries the chosen initialization; the magnitude
    `g` is initialized to ||v|| per output feature so the initial effective
    kernel equals the raw initialization — exactly torch's
    nn.utils.weight_norm contract, which the geometric init relies on.
    """

    features: int
    use_weight_norm: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        if self.use_weight_norm:
            g = self.param(
                "g", lambda key: jnp.linalg.norm(kernel, axis=0)
            )
            norm = jnp.linalg.norm(kernel, axis=0, keepdims=True)
            kernel = kernel * (g[None, :] / jnp.maximum(norm, 1e-12))
        return x @ kernel + bias


def _geometric_init(
    layer: int,
    num_layers: int,
    in_dim: int,
    out_dim: int,
    d_in: int,
    input_dim_embedded: int,
    skip_in: Sequence[int],
    multires: int,
    bias_const: float,
):
    """Kernel/bias initializers reproducing networks.py:55-76 (SAL geometric init).

    Torch weights are (out, in); flax kernels are (in, out) — transposed here.
    """

    def kernel_init(key, shape):
        in_d, out_d = shape
        if layer == num_layers - 2:  # final layer: mean sqrt(pi)/sqrt(in)
            return (
                np.sqrt(np.pi) / np.sqrt(in_dim)
                + jax.random.normal(key, shape) * 1e-4
            ).astype(jnp.float32)
        if multires > 0 and layer == 0:
            w = jax.random.normal(key, shape) * (np.sqrt(2) / np.sqrt(out_d))
            # zero all input columns except the raw xyz coordinates (the PE
            # and conditioning channels start silent)
            mask = jnp.zeros((in_d, 1)).at[:d_in].set(1.0)
            return (w * mask).astype(jnp.float32)
        if multires > 0 and layer in skip_in:
            w = jax.random.normal(key, shape) * (np.sqrt(2) / np.sqrt(out_d))
            # zero the PE part of the skip input (last input_dim_embedded - d_in columns)
            n_zero = input_dim_embedded - d_in
            mask = jnp.ones((in_d, 1)).at[in_d - n_zero :].set(0.0)
            return (w * mask).astype(jnp.float32)
        return (jax.random.normal(key, shape) * (np.sqrt(2) / np.sqrt(out_d))).astype(
            jnp.float32
        )

    def bias_init(key, shape):
        if layer == num_layers - 2:
            return jnp.full(shape, -bias_const, jnp.float32)
        return jnp.zeros(shape, jnp.float32)

    return kernel_init, bias_init


COND_DIMS = {"smpl": 69, "frame": 32, "smpl_id": 69 + 64, "smpl_tri": 69 + 64, "none": 0}


class ImplicitNet(nn.Module):
    """Canonical-space SDF + feature field.

    Config keys mirror the reference YAML (confs/model/*_model.yaml:17-30).
    """

    d_in: int = 3
    d_out: int = 1
    dims: Sequence[int] = (256,) * 8
    feature_vector_size: int = 256
    skip_in: Sequence[int] = (4,)
    multires: int = 6
    cond: str = "smpl"
    init_mode: str = "geometry"
    bias: float = 0.6
    weight_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond_vec: jnp.ndarray | None = None,
        layer0_extra: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """x: (N, d_in); cond_vec: (cond_dim,) or (N, cond_dim) or None.
        layer0_extra: optional (N, dims[1]) activation added after layer 0
        (the beta-encoding hook, networks.py:169-177).

        Returns (N, 1 + feature_vector_size) — [sdf, features].
        """
        in0 = embedding_dim(self.multires, self.d_in)
        dims = [in0] + list(self.dims) + [self.d_out + self.feature_vector_size]
        num_layers = len(dims)

        inp = positional_encoding(x, self.multires)

        if self.cond != "none":
            assert cond_vec is not None
            if cond_vec.ndim == 1:
                cond_vec = jnp.broadcast_to(
                    cond_vec, (x.shape[0], cond_vec.shape[-1])
                )

        h = inp
        for l in range(num_layers - 1):
            out_dim = dims[l + 1]
            if l + 1 in self.skip_in:
                out_dim = dims[l + 1] - dims[0]

            if self.cond != "none" and l == 0:
                h = jnp.concatenate([h, cond_vec], axis=-1)
            if l in self.skip_in:
                h = jnp.concatenate([h, inp], axis=-1) / jnp.sqrt(2.0)

            if self.init_mode == "geometry":
                k_init, b_init = _geometric_init(
                    l, num_layers, h.shape[-1], out_dim, self.d_in, dims[0],
                    self.skip_in, self.multires, self.bias,
                )
            else:
                k_init = nn.initializers.lecun_normal()
                b_init = nn.initializers.zeros
            h = WNDense(
                out_dim,
                use_weight_norm=self.weight_norm,
                kernel_init=k_init,
                bias_init=b_init,
                name=f"lin{l}",
            )(h)
            if l == 0 and layer0_extra is not None:
                h = h + layer0_extra
            if l < num_layers - 2:
                h = softplus100(h)
        return h

    @staticmethod
    def from_config(opt) -> "ImplicitNet":
        return ImplicitNet(
            d_in=opt.d_in,
            d_out=opt.d_out,
            dims=tuple(opt.dims),
            feature_vector_size=opt.feature_vector_size,
            skip_in=tuple(opt.skip_in),
            multires=opt.multires,
            cond=opt.cond,
            init_mode=opt.get("init", "geometry"),
            bias=opt.get("bias", 0.6),
            weight_norm=opt.get("weight_norm", True),
        )


class OffsetHead(nn.Module):
    """Per-person refinement head over a shared ImplicitNet (networks.py:86-106,
    190-206): takes [shared output, conditioning, embedded input] and emits a
    delta-SDF plus (optionally) replacement features. Initialized near zero so
    the shared field dominates at start."""

    feature_vector_size: int = 256
    width: int = 256
    no_head_feature: bool = False

    @nn.compact
    def __call__(self, shared_out: jnp.ndarray, cond: jnp.ndarray, inp: jnp.ndarray) -> jnp.ndarray:
        n = shared_out.shape[0]
        cond = jnp.broadcast_to(cond, (n, cond.shape[-1]))
        h = jnp.concatenate([shared_out, cond, inp], axis=-1)
        for i in range(4):
            h = WNDense(self.width, name=f"head{i}")(h)
            h = softplus100(h)
        init_val = 1e-6
        h = WNDense(
            self.feature_vector_size + 1,
            kernel_init=nn.initializers.uniform(scale=init_val),
            name="last",
        )(h)
        sdf = shared_out[:, 0:1] + h[:, 0:1]
        feat = shared_out[:, 1:] if self.no_head_feature else h[:, 1:]
        return jnp.concatenate([sdf, feat], axis=-1)


class BetaEncoder(nn.Module):
    """Per-person shape-code injection at layer 0 (networks.py:107-116,
    169-177): a near-zero-initialized Linear(10 -> width) added to the first
    layer's activations."""

    width: int = 256

    @nn.compact
    def __call__(self, betas: jnp.ndarray, n: int) -> jnp.ndarray:
        init_val = 1e-5
        h = WNDense(
            self.width,
            kernel_init=nn.initializers.uniform(scale=init_val),
            name="beta_layer",
        )(jnp.broadcast_to(betas, (n, betas.shape[-1])))
        return h


class RenderingNet(nn.Module):
    """Appearance MLP. Mode semantics follow networks.py:263-312."""

    mode: str = "pose_no_view"
    d_in: int = 14
    d_out: int = 3
    dims: Sequence[int] = (256,) * 4
    feature_vector_size: int = 256
    multires_view: int = -1
    weight_norm: bool = True
    dim_frame_encoding: int = 32
    dim_cond_embed: int = 8

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray | None,
        normals: jnp.ndarray | None,
        view_dirs: jnp.ndarray | None,
        body_pose: jnp.ndarray | None,
        feature_vectors: jnp.ndarray,
        frame_latent: jnp.ndarray | None = None,
        id_latent: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        n = feature_vectors.shape[0]

        if self.mode == "idr":
            if self.multires_view > 0:
                view_dirs = positional_encoding(view_dirs, self.multires_view)
            h = jnp.concatenate([points, view_dirs, normals, feature_vectors], axis=-1)
        elif self.mode == "nerf_frame_encoding":
            if self.multires_view > 0:
                view_dirs = positional_encoding(view_dirs, self.multires_view)
            fl = jnp.broadcast_to(frame_latent, (n, frame_latent.shape[-1]))
            h = jnp.concatenate([view_dirs, fl, feature_vectors], axis=-1)
        elif self.mode == "pose_no_view":
            if self.multires_view > 0:
                points = positional_encoding(points, self.multires_view)
            bp = jnp.broadcast_to(body_pose, (n, body_pose.shape[-1]))
            bp = nn.Dense(self.dim_cond_embed, name="lin_pose")(bp)
            h = jnp.concatenate([points, normals, bp, feature_vectors], axis=-1)
        elif self.mode == "pose_id_no_view":
            bp = jnp.broadcast_to(body_pose, (n, body_pose.shape[-1]))
            bp = nn.Dense(self.dim_cond_embed, name="lin_pose")(bp)
            il = jnp.broadcast_to(id_latent, (n, id_latent.shape[-1]))
            il = nn.Dense(self.dim_cond_embed, name="lin_id")(il)
            h = jnp.concatenate([points, normals, bp, il, feature_vectors], axis=-1)
        elif self.mode == "nerf":
            h = jnp.concatenate([view_dirs, feature_vectors], axis=-1)
        else:
            raise NotImplementedError(self.mode)

        num_layers = len(self.dims) + 2
        dims_out = list(self.dims) + [self.d_out]
        for l, out_dim in enumerate(dims_out):
            h = WNDense(out_dim, use_weight_norm=self.weight_norm, name=f"lin{l}")(h)
            if l < num_layers - 2:
                h = nn.relu(h)
        return nn.sigmoid(h)

    @staticmethod
    def from_config(opt, dim_frame_encoding: int = 32) -> "RenderingNet":
        return RenderingNet(
            mode=opt.mode,
            d_in=opt.d_in,
            d_out=opt.d_out,
            dims=tuple(opt.dims),
            feature_vector_size=opt.feature_vector_size,
            multires_view=opt.get("multires_view", -1),
            weight_norm=opt.get("weight_norm", True),
            dim_frame_encoding=dim_frame_encoding,
        )
