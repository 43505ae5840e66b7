"""Sharded-step scaling curve on a virtual CPU mesh.

8 virtual CPU devices can't show real ICI speedups, but this catches the
failure modes sharding can introduce silently: per-device recompiles,
unexpected resharding/collective insertion, and non-divisible ray batches.
We time the identical global-ray-count training step over 1/2/4/8-device
meshes and record steps/s plus the compiled HLO's collective count.

    python examples/scaling_curve.py [--rays 256] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import __graft_entry__ as ge
    from multiply_tpu.parallel import make_mesh, replicate
    from multiply_tpu.parallel.sharding import shard_batch, sharded_train_step

    assert len(jax.devices()) >= 8, "need 8 virtual CPU devices"
    scene, renderer, state, builder, ts, batch = ge._build(
        num_frames=2, rays=args.rays
    )

    print(f"{'devices':>8} {'compile_s':>10} {'step_ms':>9} {'steps/s':>8} "
          f"{'collectives':>12}")
    rows = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        ts_r = replicate(ts, mesh)
        batch_s = shard_batch(batch, mesh)
        step = sharded_train_step(builder.step, mesh)

        t0 = time.time()
        new_ts, logs = step(ts_r, batch_s, jax.random.PRNGKey(0))
        loss = float(logs["loss"])
        compile_s = time.time() - t0
        assert np.isfinite(loss), loss

        # count cross-device collectives in the compiled module
        try:
            lowered = jax.jit(step).lower(ts_r, batch_s, jax.random.PRNGKey(0))
            hlo = lowered.compile().as_text()
        except Exception:
            hlo = ""
        ncoll = sum(hlo.count(op) for op in
                    ("all-reduce", "all-gather", "reduce-scatter", "collective-permute"))

        t0 = time.time()
        cur = ts_r
        for i in range(args.iters):
            cur, logs = step(cur, batch_s, jax.random.PRNGKey(i))
        float(logs["loss"])
        dt = (time.time() - t0) / args.iters
        rows.append((n, compile_s, dt * 1e3, 1.0 / dt, ncoll))
        print(f"{n:>8} {compile_s:>10.1f} {dt*1e3:>9.1f} {1.0/dt:>8.2f} "
              f"{ncoll:>12}")

    # the global batch is fixed: more devices must not *increase* step time
    # (CPU devices share cores, so we only check for pathological blowups
    # from resharding/recompiles)
    t1, t8 = rows[0][2], rows[-1][2]
    print(f"\n1-dev {t1:.1f} ms vs 8-dev {t8:.1f} ms "
          f"({'OK' if t8 < 3.0 * t1 else 'PATHOLOGICAL'})")


if __name__ == "__main__":
    main()
