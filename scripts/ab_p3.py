"""Three-person on-chip proof (VERDICT r4 item 5).

The pairwise-attenuation composite default was decided at P=2, but its cost
is O(P^2 * R * S^2) — at P=3 there are 6 ordered pairs. This script re-runs
the composite A/B AND the bench throughput at P=3 on the real chip,
incremental JSONL (each measurement flushed when it lands).

Usage: python scripts/ab_p3.py [--out docs/ab_p3.jsonl]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

STEPS = 8
RAYS = 512


def measure(scene, num_persons, composite_matmul):
    import jax

    from __graft_entry__ import _build

    scene, renderer, state, builder, ts, batch = _build(
        num_persons=num_persons, rays=RAYS, full_scale=True,
        sampler_bf16=True, scene=scene, composite_matmul=composite_matmul,
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
    assert loss0 == loss0 and loss == loss, "NaN loss in P=3 A/B"
    return dict(
        persons=num_persons,
        rays=RAYS,
        composite_matmul=composite_matmul,
        rays_per_sec=round(RAYS / dt, 1),
        step_ms=round(dt * 1e3, 2),
        compile_s=round(compile_s, 1),
        loss=round(loss, 5),
    ), scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "docs", "ab_p3.jsonl"))
    args = ap.parse_args()

    from multiply_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    scene = None
    with open(args.out, "a") as f:
        for matmul in (True, False):
            row, scene = measure(scene, 3, matmul)
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
