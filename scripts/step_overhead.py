"""Where do the trainer's per-step milliseconds go on the chip?

Round 4 measured 130 ms/step THROUGH the trainer loop vs 87.5 ms for the raw
jitted step. This script quantifies the gap and its remedies at the
production config:

  * raw_step_ms        — the jitted step alone (fixed batch, pipelined)
  * trainer_step_ms    — through trainer.train_epoch() (prefetch producer
                         builds batches + H2D transfers concurrently)
  * host phases        — standalone cost of item sampling / batch build /
                         PRNG split (what the producer thread hides)

Usage: python scripts/step_overhead.py [--epochs 5] [--conf confs/synthetic_fullscale.yaml]
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
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(ROOT, "docs", "step_overhead.json"))
    args = ap.parse_args()

    t0 = time.time()
    import jax
    import numpy as np

    from multiply_tpu.config import load_config
    from multiply_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
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

    from multiply_tpu.engine.train import MODE_JOINT

    rng = np.random.default_rng(0)
    n_frames = trainer.num_frames

    # --- host phases, standalone (what the producer thread must hide) -----
    n_probe = 32
    t = time.time()
    items = [trainer.seq.get_train_item(int(i % n_frames), rng) for i in range(n_probe)]
    get_item_ms = (time.time() - t) / n_probe * 1e3

    t = time.time()
    for it in items:
        b = trainer.make_batch(it, MODE_JOINT)
    jax.block_until_ready(b.uv)
    make_batch_ms = (time.time() - t) / n_probe * 1e3

    t = time.time()
    k = trainer.key
    for _ in range(n_probe):
        k, sub = jax.random.split(k)
    jax.block_until_ready(sub)
    rng_split_ms = (time.time() - t) / n_probe * 1e3

    # --- raw jitted step: fixed batch, pipelined dispatch ------------------
    batch = trainer.make_batch(items[0], MODE_JOINT)
    key = jax.random.PRNGKey(1)
    ts = trainer.ts
    n_raw = 32
    ts, logs = trainer._step(ts, batch, key, trainer.person_state, None)
    float(logs["loss"])  # sync after warm call
    t = time.time()
    for _ in range(n_raw):
        ts, logs = trainer._step(ts, batch, key, trainer.person_state, None)
    float(logs["loss"])  # host sync through the relay
    raw_step_ms = (time.time() - t) / n_raw * 1e3
    trainer.ts = ts
    print(f"[{time.time()-t0:.0f}s] raw step {raw_step_ms:.1f} ms", flush=True)

    # --- through the trainer loop ------------------------------------------
    wall0 = time.time()
    n_steps = 0
    for _ in range(args.epochs):
        logs = trainer.train_epoch()
        trainer.epoch += 1
        n_steps += n_frames
    trainer_step_ms = (time.time() - wall0) / n_steps * 1e3

    result = {
        "config": os.path.basename(args.conf),
        "frames_per_epoch": n_frames,
        "epochs_measured": args.epochs,
        "raw_step_ms": round(raw_step_ms, 2),
        "trainer_step_ms": round(trainer_step_ms, 2),
        "overhead_ms": round(trainer_step_ms - raw_step_ms, 2),
        "overhead_pct": round(100 * (trainer_step_ms / raw_step_ms - 1), 1),
        "host_phase_ms": {
            "get_item": round(get_item_ms, 2),
            "make_batch_h2d": round(make_batch_ms, 2),
            "rng_split": round(rng_split_ms, 2),
        },
    }
    print(json.dumps(result, indent=2), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
