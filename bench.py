"""Benchmark: full-scale training-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

`value` is the STRICT-f32 parity preset (every sampler eval in f32, full
near-far march) so vs_baseline is an honest like-for-like against the
reference; `fast_value` is the documented fast preset (`sampler_bf16: true`
— sampling-location precision only, render-time evals stay f32; PSNR-neutral
in the synthetic A/B, see BASELINE.md).

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


def _measure(scene, sampler_bf16):
    import jax

    from __graft_entry__ import _build

    scene, renderer, state, builder, ts, batch = _build(
        rays=RAYS, full_scale=True, sampler_bf16=sampler_bf16, scene=scene
    )
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
    return RAYS / dt, scene


def main():
    from multiply_tpu.data.synthetic import make_scene

    scene = make_scene(num_frames=4, num_persons=2, height=32, width=40)
    parity, scene = _measure(scene, sampler_bf16=False)
    fast, _ = _measure(scene, sampler_bf16=True)
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(parity, 1),
                "unit": "rays/s (512-ray full-scale step, 2 persons, strict f32)",
                "vs_baseline": round(parity / BASELINE_RAYS_PER_SEC, 2),
                "fast_value": round(fast, 1),
                "fast_vs_baseline": round(fast / BASELINE_RAYS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
