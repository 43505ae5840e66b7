"""Op-level (per-HLO-name) profile of the full-scale bench step on the TPU.

Like train.py --profile, but grouped by individual op name so the contents of
the coarse categories (custom-call, custom fusion, loop fusion) are visible.

    python scripts/profile_ops.py [--rays 512] [--steps 8]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--log_dir", default="/tmp/profile_ops")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _build

    scene, renderer, state, builder, ts, batch = _build(
        rays=args.rays, full_scale=True
    )
    step = builder.jitted_step()
    key = jax.random.PRNGKey(0)
    ts, logs = step(ts, batch, key)
    print("compiled; loss =", float(logs["loss"]))

    os.makedirs(args.log_dir, exist_ok=True)
    jax.profiler.start_trace(args.log_dir)
    t0 = time.time()
    for i in range(args.steps):
        ts, logs = step(ts, batch, jax.random.fold_in(key, i))
    print("loss =", float(logs["loss"]))
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"{args.steps} steps in {wall:.2f}s ({args.rays * args.steps / wall:.0f} rays/s)")

    paths = sorted(
        glob.glob(os.path.join(args.log_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = str(e.get("args", {}).get("name", ""))
            if "device:" in name.lower() or "tpu" in name.lower():
                if "cpu" not in name.lower():
                    device_pids.add(e["pid"])
    totals = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        cat = str(e.get("args", {}).get("hlo_category", "")).strip()
        if not cat:
            continue
        name = e.get("name", "?")
        row = totals.setdefault((cat, name), [0.0, 0])
        row[0] += float(e.get("dur", 0.0)) / 1000.0
        row[1] += 1
    grand = sum(v[0] for v in totals.values()) or 1.0
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
    print(f"\n{'category':<20} {'op name':<58} {'ms':>9} {'n':>6} {'pct':>6}")
    for (cat, name), (ms, n) in rows[:40]:
        print(f"{cat:<20} {name[:58]:<58} {ms:>9.2f} {n:>6} {100*ms/grand:>5.1f}%")


if __name__ == "__main__":
    main()
