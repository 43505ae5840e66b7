"""First-class training-step profiling: trace N steps with jax.profiler and
print a per-HLO-category device-time table.

The reference has no profiling at all (SURVEY §5); this is the tool that
drove the round-1 perf work (gather elimination, multi-operand sorts):
start_trace -> run steps -> parse the newest *.trace.json.gz -> filter device
events -> group by hlo_category.

    python train.py --conf ... --profile 20
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import time


def _load_trace_events(log_dir: str) -> list[dict]:
    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return []
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f).get("traceEvents", [])


def summarize_trace(log_dir: str) -> list[dict]:
    """Per-hlo_category device time from the newest trace in log_dir.

    Returns rows sorted by total time: {category, total_ms, count, pct}.
    """
    events = _load_trace_events(log_dir)
    # process-name metadata maps pid -> '/device:TPU:0 ...' style names
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = str(e.get("args", {}).get("name", ""))
            if "device:" in name.lower() or "tpu" in name.lower() or "/device" in name:
                if "cpu" not in name.lower() or "device:cpu" in name.lower():
                    device_pids.add(e["pid"])
    totals: dict[str, list[float]] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        cat = str(e.get("args", {}).get("hlo_category", "")).strip()
        if not cat:
            continue
        row = totals.setdefault(cat, [0.0, 0])
        row[0] += float(e.get("dur", 0.0)) / 1000.0  # us -> ms
        row[1] += 1
    grand = sum(v[0] for v in totals.values()) or 1.0
    rows = [
        {"category": k, "total_ms": v[0], "count": v[1], "pct": 100.0 * v[0] / grand}
        for k, v in totals.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows


def print_summary(rows: list[dict], wall: float | None = None, steps: int | None = None) -> None:
    if not rows:
        print("profile: no device events captured (trace empty?)")
        return
    if wall is not None and steps:
        print(f"profiled {steps} steps in {wall:.2f}s ({steps / wall:.2f} steps/s)")
    print(f"{'hlo_category':<28} {'total_ms':>10} {'count':>8} {'pct':>6}")
    for r in rows[:15]:
        print(
            f"{r['category']:<28} {r['total_ms']:>10.2f} {r['count']:>8} "
            f"{r['pct']:>5.1f}%"
        )


def profile_training_steps(trainer, n_steps: int, log_dir: str) -> list[dict]:
    """Compile, then trace n_steps full training steps; print and persist the
    per-category table to <log_dir>/summary.json."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(log_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    n_frames = len(trainer.seq)
    items = [
        trainer.seq.get_train_item(i % n_frames, rng) for i in range(n_steps + 2)
    ]
    batches = [trainer.make_batch(it, 0) for it in items]
    trainer.ts = trainer.ts._replace(epoch=jnp.asarray(trainer.epoch, jnp.int32))
    key = jax.random.PRNGKey(0)

    for b in batches[:2]:  # compile + warm caches
        key, k = jax.random.split(key)
        trainer.ts, logs = trainer._step(trainer.ts, b, k, trainer.person_state)
    float(logs["loss"])  # force a host sync (relay-safe, see CLAUDE.md)

    jax.profiler.start_trace(log_dir)
    t0 = time.time()
    for b in batches[2:]:
        key, k = jax.random.split(key)
        trainer.ts, logs = trainer._step(trainer.ts, b, k, trainer.person_state)
    float(logs["loss"])
    wall = time.time() - t0
    jax.profiler.stop_trace()

    rows = summarize_trace(log_dir)
    print_summary(rows, wall=wall, steps=n_steps)
    with open(os.path.join(log_dir, "summary.json"), "w") as f:
        json.dump({"steps": n_steps, "wall_s": wall, "rows": rows}, f, indent=1)
    return rows
