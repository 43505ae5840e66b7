"""Benchmark: full-scale training-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: rays/sec/chip through a full reference-scale optimization step —
2 persons, 8x256 SDF MLPs, VolSDF error-bound sampler (5 rounds x 128 evals),
64+32+2 render samples, NeRF++ background, losses, backward, Adam — i.e. the
same per-step work as the reference's taichi01 config
(reference: confs/model/taichi01_model.yaml, confs/dataset/taichi01.yaml).

Baseline: the reference sustains ~0.5-1 steps/s at 512 rays/step on its
(unspecified) training GPU — ~24h x persons per sequence (README.md:44), 10k
epochs x 75 frames. We take 384 rays/s (0.75 steps/s) as the comparison point.
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 384.0
RAYS = 512
STEPS = 8


def main():
    import jax

    from __graft_entry__ import _build

    scene, renderer, state, builder, ts, batch = _build(rays=RAYS, full_scale=True)
    step = builder.jitted_step()
    key = jax.random.PRNGKey(0)

    # warmup/compile (float() forces a device->host sync — block_until_ready
    # alone can return early through the remote-execution relay)
    ts, logs = step(ts, batch, key)
    _ = float(logs["loss"])

    t0 = time.perf_counter()
    acc = 0.0
    for i in range(STEPS):
        ts, logs = step(ts, batch, jax.random.fold_in(key, i))
    acc += float(logs["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    assert np.isfinite(acc)

    rays_per_sec = RAYS / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s (512-ray full-scale step, 2 persons)",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
