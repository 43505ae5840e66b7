"""Pallas TPU kernel: nearest-neighbor (K=1) against a small point set.

The jnp KNN (ops/knn.py) materializes the full (queries x refs) distance
matrix in HBM — at the training shapes (655k deformer queries x 6890 SMPL
verts per person per step) that is ~18 GB of HBM traffic per person. This
kernel keeps the whole reference set in VMEM (6890 x 3 floats = 83 KB),
streams query blocks through, and reduces the running min/argmin on the fly —
distance values never leave the chip.

K=1 is the training path (deformer skinning-weight transfer,
reference deformer.py:39 with K=1); K>1 (mesh export) falls back to the jnp
implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_BLOCK = 1024  # 8 sublanes x 128 lanes per output block
REF_TILE = 2048
PAD_COORD = 1e4  # padding verts land far away; d2 ~ 3e8 stays < f32 inf


def _nn_kernel(q_ref, refs_ref, d2_ref, idx_ref):
    """One query block vs all refs: running min over ref tiles.

    q_ref: (B, 3) VMEM; refs_ref: (Vp, 3) VMEM; outputs (B,) d2 / idx.
    """
    q = q_ref[:]  # (B, 3)
    n_tiles = refs_ref.shape[0] // REF_TILE

    def body(t, carry):
        best_d2, best_idx = carry
        v = refs_ref[pl.ds(t * REF_TILE, REF_TILE), :]  # (T, 3)
        # elementwise distance tile on the VPU (no MXU: K=3 matmuls waste it)
        d2 = (
            (q[:, 0:1] - v[:, 0][None, :]) ** 2
            + (q[:, 1:2] - v[:, 1][None, :]) ** 2
            + (q[:, 2:3] - v[:, 2][None, :]) ** 2
        )  # (B, T)
        tile_min = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + t * REF_TILE
        take = tile_min < best_d2
        return jnp.where(take, tile_min, best_d2), jnp.where(take, tile_arg, best_idx)

    init = (
        jnp.full((q.shape[0],), jnp.inf, jnp.float32),
        jnp.zeros((q.shape[0],), jnp.int32),
    )
    best_d2, best_idx = jax.lax.fori_loop(0, n_tiles, body, init)
    d2_ref[:, :] = best_d2.reshape(QUERY_BLOCK // 128, 128)
    idx_ref[:, :] = best_idx.reshape(QUERY_BLOCK // 128, 128)


@partial(jax.jit, static_argnames=("interpret",))
def nn1_pallas(
    query: jnp.ndarray,  # (N, 3)
    refs: jnp.ndarray,  # (V, 3)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest neighbor: returns (d2 (N, 1), idx (N, 1))."""
    n = query.shape[0]
    v = refs.shape[0]
    n_pad = (-n) % QUERY_BLOCK
    v_pad = (-v) % REF_TILE
    q = jnp.pad(query.astype(jnp.float32), ((0, n_pad), (0, 0)))
    r = jnp.pad(
        refs.astype(jnp.float32), ((0, v_pad), (0, 0)), constant_values=PAD_COORD
    )

    n_blocks = (n + n_pad) // QUERY_BLOCK
    rows_per_block = QUERY_BLOCK // 128  # 8 sublanes
    d2, idx = pl.pallas_call(
        _nn_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((QUERY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r.shape[0], 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows_per_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * rows_per_block, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * rows_per_block, 128), jnp.int32),
        ],
        interpret=interpret,
    )(q, r)
    d2 = d2.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    return jnp.maximum(d2[:, None], 0.0), idx[:, None]


def knn_auto(query, refs, k: int = 1, chunk_size: int = 8192):
    """Dispatch: Pallas kernel for K=1 on TPU, jnp fallback otherwise."""
    from .knn import knn as knn_jnp

    if k == 1 and query.shape[0] >= QUERY_BLOCK:
        platform = jax.devices()[0].platform
        if platform in ("tpu", "axon"):
            return nn1_pallas(query, refs)
    return knn_jnp(query, refs, k=k, chunk_size=chunk_size)
