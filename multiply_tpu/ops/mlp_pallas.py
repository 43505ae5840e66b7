"""Pallas TPU kernel: fused forward-only ImplicitNet SDF evaluation.

The VolSDF sampler evaluates the 9-layer SDF MLP on ~65k points per person
per round with NO gradients (sample placement is stop-grad). XLA runs that as
nine HBM-roundtripping matmuls; this kernel keeps the whole layer stack's
effective weights (~2.3 MB for 8x256) and the running activation tile in VMEM
and emits only the SDF column — one HBM read of the inputs, one write of the
outputs.

Exact same math as models/networks.ImplicitNet (softplus beta=100; the skip
concat + 1/sqrt(2) is realized as an injection into the zero-padded columns
of the previous layer's output); weight norm folds into effective kernels in
`pack_weights`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

POINT_BLOCK = 2048


def _pad128(d: int) -> int:
    return ((d + 127) // 128) * 128


def _softplus100(x):
    return jax.nn.softplus(100.0 * x) / 100.0


def _make_kernel(layer_dims, skip_layer: int, skip_offset: int, skip_width: int):
    """layer_dims: [(in_pad, out_pad)]; skip_layer: layer whose input gets the
    concat; skip_offset: column where the re-injected PE block starts;
    skip_width: PE width."""
    num_layers = len(layer_dims)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)

    def kernel(xin_ref, *refs):
        out_ref = refs[-1]
        xin = xin_ref[:, :]
        h = xin
        for l in range(num_layers):
            if l == skip_layer and skip_layer >= 0:
                in_l = layer_dims[l][0]
                col = jax.lax.broadcasted_iota(jnp.int32, (h.shape[0], in_l), 1)
                # place xin's first skip_width columns at [offset, offset+width)
                src = jnp.pad(
                    xin[:, :skip_width], ((0, 0), (skip_offset, 0))
                )[:, :in_l]
                inject = (col >= skip_offset) & (col < skip_offset + skip_width)
                h = jnp.where(inject, src, h[:, :in_l]) * inv_sqrt2
            W = refs[2 * l][:, :]
            b = refs[2 * l + 1][0, :]
            z = jnp.dot(h, W, preferred_element_type=jnp.float32) + b[None, :]
            h = _softplus100(z) if l < num_layers - 1 else z
        out_ref[:, :] = h

    return kernel


class FusedSDFMLP:
    """Padded effective weights + jittable fused forward (SDF column only).

    Mirrors ImplicitNet(dims, skip_in=(k,)) exactly; caller supplies the
    embedded + conditioned input (xin = [PE(x), cond] zero-padded to in_pad).
    """

    def __init__(self, net, cond_dim: int):
        from .embedders import embedding_dim

        self.net = net
        self.pe_dim = embedding_dim(net.multires, net.d_in)
        self.cond_dim = cond_dim
        dims = [self.pe_dim + cond_dim] + list(net.dims) + [
            net.d_out + net.feature_vector_size
        ]
        self.raw_dims = dims
        self.skip_layer = list(net.skip_in)[0] if len(net.skip_in) else -1
        n_layers = len(dims) - 1

        self.raw_io = []
        for l in range(n_layers):
            raw_in = dims[l]
            raw_out = dims[l + 1]
            if l + 1 == self.skip_layer:
                raw_out -= self.pe_dim  # concat restores full width
            if l == n_layers - 1:
                raw_out = 1  # sdf column only
            self.raw_io.append((raw_in, raw_out))

        self.layer_dims = []
        for l, (ri, ro) in enumerate(self.raw_io):
            in_pad = _pad128(ri)
            out_pad = (
                _pad128(self.raw_io[l + 1][0]) if l + 1 < n_layers else _pad128(ro)
            )
            # the skip PE block must fit inside the previous layer's padding
            if l + 1 == self.skip_layer:
                assert ro + self.pe_dim <= out_pad, "skip does not fit padding"
            self.layer_dims.append((in_pad, out_pad))
        self.skip_offset = (
            self.raw_io[self.skip_layer - 1][1] if self.skip_layer >= 1 else 0
        )
        self.in_pad = self.layer_dims[0][0]

    def pack_weights(self, params) -> list:
        """Flax ImplicitNet params -> padded effective kernels (+ biases).

        Weight norm folds in: k_eff = kernel * g / ||kernel||_col.
        """
        p = params["params"] if "params" in params else params
        out = []
        for l, ((raw_in, raw_out), (in_pad, out_pad)) in enumerate(
            zip(self.raw_io, self.layer_dims)
        ):
            lp = p[f"lin{l}"]
            k = lp["kernel"]
            if "g" in lp:
                norm = jnp.linalg.norm(k, axis=0, keepdims=True)
                k = k * (lp["g"][None, :] / jnp.maximum(norm, 1e-12))
            b = lp["bias"]
            k, b = k[:, :raw_out], b[:raw_out]
            kp = jnp.zeros((in_pad, out_pad), jnp.float32)
            kp = kp.at[: k.shape[0], : k.shape[1]].set(k)
            bp = jnp.zeros((1, out_pad), jnp.float32)
            bp = bp.at[0, : b.shape[0]].set(b)
            out += [kp, bp]
        return out

    def pack_inputs(self, x: jnp.ndarray, cond_vec: jnp.ndarray) -> jnp.ndarray:
        """(N,3) points + (C,) or (N,C) cond -> (N, in_pad) [PE, cond, 0...]."""
        from .embedders import positional_encoding

        pe = positional_encoding(x, self.net.multires)
        if cond_vec.ndim == 1:
            cond = jnp.broadcast_to(cond_vec, (x.shape[0], cond_vec.shape[-1]))
        else:
            cond = cond_vec
        xin = jnp.concatenate([pe, cond], axis=-1)
        return jnp.pad(xin, ((0, 0), (0, self.in_pad - xin.shape[-1])))

    def __call__(self, packed_weights, xin: jnp.ndarray, interpret: bool = False):
        """xin: (N, in_pad) -> sdf (N,)."""
        n = xin.shape[0]
        n_padded = ((n + POINT_BLOCK - 1) // POINT_BLOCK) * POINT_BLOCK
        x = jnp.pad(xin, ((0, n_padded - n), (0, 0)))

        kernel = _make_kernel(
            self.layer_dims, self.skip_layer, self.skip_offset, self.pe_dim
        )
        in_specs = [
            pl.BlockSpec(
                (POINT_BLOCK, self.in_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        for (ip, op) in self.layer_dims:
            in_specs.append(
                pl.BlockSpec((ip, op), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            in_specs.append(
                pl.BlockSpec((1, op), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )

        out = pl.pallas_call(
            kernel,
            grid=(n_padded // POINT_BLOCK,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (POINT_BLOCK, self.layer_dims[-1][1]),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_padded, self.layer_dims[-1][1]), jnp.float32
            ),
            interpret=interpret,
        )(x, *packed_weights)
        return out[:n, 0]
