"""Multi-chip execution: rays sharded over a 1-D device mesh, parameters
replicated, gradients reduced by XLA collectives over ICI.

The reference is strictly single-GPU (code/train.py:27, devices=1); the
parallelism here exploits the math's natural data-parallel axis — rays — as
laid out in SURVEY.md §2.4: per-scene models are small (<10M params), so
replicate params, shard the (R, ...) ray batch, and let XLA insert the psum
for gradient reduction inside jit. No parameter sharding, no pipeline axes.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(num_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (RAY_AXIS,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def shard_rays(tree: Any, mesh: Mesh) -> Any:
    """Shard every array's leading axis across the ray axis; scalars and
    sub-1D leaves replicate."""
    ray_sh = NamedSharding(mesh, P(RAY_AXIS))
    rep = NamedSharding(mesh, P())
    n = mesh.shape[RAY_AXIS]

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return jax.device_put(x, ray_sh)
        return jax.device_put(x, rep)

    return jax.tree.map(put, tree)


# Batch fields that carry a per-ray leading axis (engine/train.py Batch);
# everything else (camera pose, intrinsics, frame index, scale) replicates.
PER_RAY_FIELDS = ("uv", "rgb", "sam_mask")


def shard_batch(batch, mesh: Mesh):
    """Shard a training Batch: per-ray arrays split, per-frame fields replicate.

    Per-ray fields are identified BY NAME, not by shape heuristics (a (4, 4)
    camera pose on a 4-device mesh must not get ray-sharded). A per-ray
    leading dim that doesn't divide the mesh size raises instead of silently
    replicating — silent replication "works" but wastes the whole mesh.
    """
    ray_sh = NamedSharding(mesh, P(RAY_AXIS))
    rep = NamedSharding(mesh, P())
    n = mesh.shape[RAY_AXIS]

    out = {}
    for name in batch._fields:
        x = getattr(batch, name)
        if x is None:
            out[name] = None
            continue
        x = jax.numpy.asarray(x)
        if name in PER_RAY_FIELDS and x.ndim >= 1:
            if x.shape[0] % n != 0:
                raise ValueError(
                    f"batch.{name} has {x.shape[0]} rays, not divisible by "
                    f"the {n}-device mesh — pad the ray batch to a multiple "
                    f"of {n} (e.g. {-(-x.shape[0] // n) * n})"
                )
            out[name] = jax.device_put(x, ray_sh)
        else:
            out[name] = jax.device_put(x, rep)
    return type(batch)(**out)


def shard_render_inputs(inputs, mesh: Mesh):
    """Shard a RenderInputs for multi-chip inference: `uv` splits over the
    ray axis, everything else (camera, per-person SMPL params, indices)
    replicates. Same by-name contract and divisibility rule as shard_batch."""
    ray_sh = NamedSharding(mesh, P(RAY_AXIS))
    rep = NamedSharding(mesh, P())
    n = mesh.shape[RAY_AXIS]

    out = {}
    for name in inputs._fields:
        x = jax.numpy.asarray(getattr(inputs, name))
        if name == "uv":
            if x.shape[0] % n != 0:
                raise ValueError(
                    f"inputs.uv has {x.shape[0]} rays, not divisible by the "
                    f"{n}-device mesh — pad the pixel chunk to a multiple "
                    f"of {n} (e.g. {-(-x.shape[0] // n) * n})"
                )
            out[name] = jax.device_put(x, ray_sh)
        else:
            out[name] = jax.device_put(x, rep)
    return type(inputs)(**out)


def sharded_train_step(step_fn, mesh: Mesh):
    """Jit a TrainStep.step for the mesh.

    Params/opt-state replicate; the batch's per-ray arrays arrive sharded via
    `shard_batch`. XLA propagates the ray sharding through sampling/rendering
    (all per-ray) and inserts an all-reduce for the replicated-param grads.
    """
    rep = NamedSharding(mesh, P())

    @jax.jit
    def run(ts, batch, key):
        new_ts, logs = step_fn(ts, batch, key)
        # params stay replicated
        return jax.lax.with_sharding_constraint(new_ts, rep), logs

    return run
