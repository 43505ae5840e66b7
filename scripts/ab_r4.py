"""Round-4 on-chip A/B session (VERDICT r3 items 2 + 4-sweep).

One process, incremental JSONL output (each measurement flushed the moment it
lands, so a stall never erases earlier results):

  1. composite_matmul A/B at the bench config (512 rays, full scale,
     sampler_bf16) — decides the flag's fate on hardware.
  2. ray-batch sweep 512 / 1024 / 2048 with the winning composite —
     is 512 even the throughput-optimal step size on v5e?

Usage: python scripts/ab_r4.py [--out docs/ab_r4.jsonl]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

STEPS = 8


def measure(scene, rays, composite_matmul):
    import jax

    from __graft_entry__ import _build

    scene, renderer, state, builder, ts, batch = _build(
        rays=rays, full_scale=True, sampler_bf16=True, scene=scene,
        composite_matmul=composite_matmul,
    )
    step = builder.jitted_step()
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    ts, logs = step(ts, batch, key)
    loss0 = float(logs["loss"])  # host sync — forces the remote compile+run
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(STEPS):
        ts, logs = step(ts, batch, jax.random.fold_in(key, i))
    loss = float(logs["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    assert all(map(lambda v: v == v, [loss0, loss])), "NaN loss in A/B"
    return dict(
        rays=rays,
        composite_matmul=composite_matmul,
        rays_per_sec=round(rays / dt, 1),
        step_ms=round(dt * 1e3, 2),
        compile_s=round(compile_s, 1),
        loss=round(loss, 5),
    ), scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "docs", "ab_r4.jsonl"))
    args = ap.parse_args()

    from multiply_tpu.data.synthetic import make_scene

    scene = make_scene(num_frames=4, num_persons=2, height=32, width=40)

    def emit(rec):
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    # --- 1. composite A/B at the bench config ---
    base, scene = measure(scene, 512, composite_matmul=False)
    emit(base)
    mm, scene = measure(scene, 512, composite_matmul=True)
    emit(mm)
    winner = mm["rays_per_sec"] > base["rays_per_sec"]
    emit({"composite_matmul_wins": bool(winner),
          "delta_pct": round(100 * (mm["rays_per_sec"] / base["rays_per_sec"] - 1), 1)})

    # --- 2. ray-batch sweep with the winning composite ---
    for rays in (1024, 2048):
        rec, scene = measure(scene, rays, composite_matmul=winner)
        emit(rec)


if __name__ == "__main__":
    main()
