"""Benchmark: full-scale training-step throughput on one chip.

Prints ONE self-contained JSON line per completed measurement (flushed the
moment it's measured, so a later stall can't erase an earlier result):

  line 1: {"metric", "value", "unit", "vs_baseline"}          — fast preset
  line 2: line 1 fields + {"parity_value", "parity_vs_baseline"}

`value` stays on the HISTORICAL series (sampler_bf16 fast preset — the same
preset behind the 1588->5684 rays/s bench history; sampling-location
precision only, render-time evals stay f32, PSNR-neutral in the 80-epoch
synthetic A/B, see BASELINE.md). `parity_value` is the strict-f32 preset
(every sampler eval f32, full near-far march) for an honest like-for-like
against the reference.

If the axon TPU tunnel is unreachable (it can hang jax.devices() for hours),
a probe subprocess times out and we emit {"error": "tpu_unreachable"} instead
of eating the driver's budget.

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
import subprocess
import sys
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 384.0
RAYS = 512
STEPS = 8
PROBE_TIMEOUT_S = 240
UNIT = "rays/s (512-ray full-scale step, 2 persons)"


def _tpu_reachable():
    """Probe the axon tunnel in a subprocess with a hard timeout.

    jax.devices() through the tunnel can hang for hours when the relay is
    down; a killable child is the only safe probe.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=PROBE_TIMEOUT_S,
            capture_output=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


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


def _emit(payload):
    print(json.dumps(payload), flush=True)


def main():
    if not _tpu_reachable():
        _emit(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": None,
                "unit": UNIT,
                "vs_baseline": None,
                "error": "tpu_unreachable",
            }
        )
        return

    from multiply_tpu.data.synthetic import make_scene
    from multiply_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    scene = make_scene(num_frames=4, num_persons=2, height=32, width=40)
    fast, scene = _measure(scene, sampler_bf16=True)
    line = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(fast, 1),
        "unit": UNIT,
        "vs_baseline": round(fast / BASELINE_RAYS_PER_SEC, 2),
    }
    _emit(line)  # flushed now — a stall in the parity arm can't erase this

    try:
        parity, _ = _measure(scene, sampler_bf16=False)
    except Exception as e:  # second arm is best-effort
        _emit({**line, "parity_error": repr(e)})
        return
    _emit(
        {
            **line,
            "parity_value": round(parity, 1),
            "parity_vs_baseline": round(parity / BASELINE_RAYS_PER_SEC, 2),
        }
    )


if __name__ == "__main__":
    main()
