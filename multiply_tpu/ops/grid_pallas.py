"""Pallas TPU kernel: trilinear sampling of a small 3-D voxel grid.

The XLA lowering of `grid_query` (mesh_ops.py) is 8 corner gathers; TPU
gathers run on the scalar unit at ~80M elem/s, which profiled at ~10 ms/step
for the renderer's in/off-surface tests (99k points x 8 corners x persons).
This kernel reformulates trilinear interpolation as a one-hot contraction:

    out[n] = sum_{jkl} Wx[n,j] Wy[n,k] Wz[n,l] G[j,k,l]

The x-axis contraction is a (B, G) @ (G, G^2) MXU matmul against the whole
grid held in VMEM (G<=128: <=4 MB bf16); the y/z contractions are fused
VPU one-hot multiplies on the (B, G^2) intermediate. No gathers anywhere.

Non-differentiable by design (zero tangent): the only consumer thresholds
the result (in/off-surface booleans), exactly like the stop-grad mesh tests
in the reference (multiply.py:312-335).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_BLOCK = 1024  # (8, 128)-tileable output rows (Mosaic layout rule)
SUB_BLOCK = 256  # keeps the (SUB, G^2) f32 intermediate ~4 MB at G=64


def _kernel(q_ref, grid_ref, lo_ref, inv_sp_ref, out_ref, *, res: int):
    g2 = res * res
    lo = lo_ref[0, :]  # (3,)
    inv_sp = inv_sp_ref[0, :]

    def body(s, carry):
        q = q_ref[pl.ds(s * SUB_BLOCK, SUB_BLOCK), :]  # (S, 3)
        x = (q - lo[None, :]) * inv_sp[None, :]
        x = jnp.clip(x, 0.0, res - 1 - 1e-6)
        xf = jnp.floor(x)
        f = x - xf
        i0 = xf.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, res - 1)

        # one-hot x row weights -> MXU contraction over the leading grid axis
        jx = jax.lax.broadcasted_iota(jnp.int32, (SUB_BLOCK, res), 1)
        wx = (
            jnp.where(jx == i0[:, 0:1], 1.0 - f[:, 0:1], 0.0)
            + jnp.where(jx == i1[:, 0:1], f[:, 0:1], 0.0)
        )
        m1 = jax.lax.dot_general(
            wx.astype(jnp.bfloat16),
            grid_ref[:, :],  # (res, g2) bf16
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, g2)

        # fused one-hot y/z contraction on the VPU
        jyz = jax.lax.broadcasted_iota(jnp.int32, (SUB_BLOCK, g2), 1)
        ky = jyz // res
        kz = jyz % res
        wy = (
            jnp.where(ky == i0[:, 1:2], 1.0 - f[:, 1:2], 0.0)
            + jnp.where(ky == i1[:, 1:2], f[:, 1:2], 0.0)
        )
        wz = (
            jnp.where(kz == i0[:, 2:3], 1.0 - f[:, 2:3], 0.0)
            + jnp.where(kz == i1[:, 2:3], f[:, 2:3], 0.0)
        )
        val = jnp.sum(m1 * wy * wz, axis=1)  # (S,)
        rows = SUB_BLOCK // 128
        out_ref[pl.ds(s * rows, rows), :] = val.reshape(rows, 128)
        return carry

    jax.lax.fori_loop(0, QUERY_BLOCK // SUB_BLOCK, body, 0)


@functools.partial(jax.custom_jvp, nondiff_argnums=(4,))
def _grid_trilinear(grid3d, points, origin, spacing, interpret=False):
    res = grid3d.shape[0]
    n = points.shape[0]
    n_pad = (-n) % QUERY_BLOCK
    q = jnp.pad(points.astype(jnp.float32), ((0, n_pad), (0, 0)))
    n_blocks = (n + n_pad) // QUERY_BLOCK
    rows = QUERY_BLOCK // 128

    grid2d = grid3d.reshape(res, res * res).astype(jnp.bfloat16)
    lo = origin.astype(jnp.float32).reshape(1, 3)
    inv_sp = (1.0 / spacing.astype(jnp.float32)).reshape(1, 3)

    out = pl.pallas_call(
        functools.partial(_kernel, res=res),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((QUERY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((res, res * res), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * rows, 128), jnp.float32),
        interpret=interpret,
    )(q, grid2d, lo, inv_sp)
    return out.reshape(-1)[:n]


@_grid_trilinear.defjvp
def _grid_trilinear_jvp(interpret, primals, tangents):
    out = _grid_trilinear(*primals, interpret)
    return out, jnp.zeros_like(out)


def grid_query_auto(grid: dict, points: jnp.ndarray) -> jnp.ndarray:
    """Trilinear SDF lookup (N,3)->(N,): Pallas one-hot kernel on TPU for
    VMEM-sized grids, XLA gather fallback elsewhere. NOT differentiable on
    the TPU path (zero tangent) — callers threshold the result."""
    from .mesh_ops import grid_query

    g = grid["grid"]
    res = g.shape[0]
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon") and res <= 128 and points.shape[0] >= 512:
        return _grid_trilinear(g, points, grid["origin"], grid["spacing"])
    return grid_query(grid, points)
