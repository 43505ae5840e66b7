"""Where do the trainer's per-step milliseconds go on the chip?

The full-scale run measured 130 ms/step THROUGH the trainer loop while
bench.py measures 87.5 ms for the raw jitted step — this script breaks the
gap into phases at the production config: dataset item sampling, batch
construction (host->device), RNG split, step dispatch, device sync.

Usage: python scripts/step_overhead.py [--epochs 3] [--conf confs/synthetic_fullscale.yaml]
Writes docs/step_overhead.json.
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default=os.path.join(ROOT, "confs", "synthetic_fullscale.yaml"))
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(ROOT, "docs", "step_overhead.json"))
    args = ap.parse_args()

    t0 = time.time()
    import jax
    import numpy as np

    from multiply_tpu.config import load_config

    conf = load_config(args.conf)
    train_opt = conf.dataset.train

    from multiply_tpu.data.synthetic import make_scene
    from multiply_tpu.data.synthetic_sequence import SyntheticSequence

    scene = make_scene(
        num_frames=train_opt.get("end_frame", 4),
        num_persons=train_opt.get("num_person", 2),
        height=train_opt.get("height", 48),
        width=train_opt.get("width", 64),
    )
    seq = SyntheticSequence(
        scene,
        num_sample=train_opt.num_sample,
        using_sam=train_opt.get("using_SAM", True),
        run_dir="/tmp/step_overhead",
    )
    print(f"[{time.time()-t0:.0f}s] scene ready", flush=True)

    sys.path.insert(0, ROOT)
    from train import build_servers

    servers = build_servers(conf, seq)

    from multiply_tpu.engine.trainer import Trainer

    trainer = Trainer(
        conf, seq, servers, run_dir="/tmp/step_overhead", segmenter=None
    )
    print(f"[{time.time()-t0:.0f}s] trainer ready", flush=True)

    # warm up: one epoch through the normal path compiles the step
    t = time.time()
    trainer.train_epoch()
    trainer.epoch += 1
    print(f"[{time.time()-t0:.0f}s] warmup epoch (compile) {time.time()-t:.1f}s",
          flush=True)

    import jax.numpy as jnp

    from multiply_tpu.engine.train import MODE_JOINT

    phases = {"get_item": 0.0, "make_batch": 0.0, "rng_split": 0.0,
              "dispatch": 0.0, "sync": 0.0}
    n_steps = 0
    rng = np.random.default_rng(0)
    wall0 = time.time()
    for _ in range(args.epochs):
        trainer.ts = trainer.ts._replace(
            epoch=jnp.asarray(trainer.epoch, jnp.int32)
        )
        order = rng.permutation(trainer.num_frames)
        logs = None
        for i in order:
            t = time.time()
            item = trainer.seq.get_train_item(int(i), rng)
            phases["get_item"] += time.time() - t

            t = time.time()
            batch = trainer.make_batch(item, MODE_JOINT)
            phases["make_batch"] += time.time() - t

            t = time.time()
            trainer.key, k = jax.random.split(trainer.key)
            phases["rng_split"] += time.time() - t

            t = time.time()
            trainer.ts, logs = trainer._run_step(batch, k)
            phases["dispatch"] += time.time() - t
            n_steps += 1
        t = time.time()
        jax.block_until_ready(logs)
        float(logs["loss"])
        phases["sync"] += time.time() - t
        trainer.epoch += 1
    wall = time.time() - wall0

    per_step = {k: round(v / n_steps * 1e3, 2) for k, v in phases.items()}
    result = {
        "steps": n_steps,
        "wall_ms_per_step": round(wall / n_steps * 1e3, 2),
        "phase_ms_per_step": per_step,
        "host_ms_per_step": round(
            sum(v for k, v in per_step.items() if k != "sync"), 2
        ),
    }
    print(json.dumps(result, indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
