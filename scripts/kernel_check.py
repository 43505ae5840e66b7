"""Numeric validation of the Pallas TPU kernels against their XLA forms ON
the chip, across the shape range the configs actually use (round-2 lesson:
Mosaic can miscompile kernels that pass interpret mode — e.g. the demo's
grid_res=24 gives the grid kernel a (24, 576) bf16 VMEM block, far off the
(16,128) tile).

Usage: python scripts/kernel_check.py           # on the TPU
Prints one JSON line per case; exits nonzero if any case exceeds tolerance.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

failures = 0


def check(name, ok, detail):
    global failures
    print(json.dumps({"case": name, "ok": bool(ok), **detail}), flush=True)
    if not ok:
        failures += 1


def grid_cases():
    from multiply_tpu.ops.grid_pallas import _grid_trilinear
    from multiply_tpu.ops.mesh_ops import grid_query

    rng = np.random.default_rng(0)
    for res in (24, 32, 64, 96):
        for n in (1500, 99_000):
            g = rng.standard_normal((res, res, res)).astype(np.float32)
            origin = np.array([-1.2, -1.1, -1.3], np.float32)
            spacing = np.array([2.4 / (res - 1)] * 3, np.float32)
            pts = rng.uniform(-1.3, 1.3, (n, 3)).astype(np.float32)
            grid = {"grid": jnp.asarray(g), "origin": jnp.asarray(origin),
                    "spacing": jnp.asarray(spacing)}
            ref = np.asarray(grid_query(grid, jnp.asarray(pts)))
            out = np.asarray(
                _grid_trilinear(grid["grid"], jnp.asarray(pts),
                                grid["origin"], grid["spacing"])
            )
            err = float(np.abs(out - ref).max())
            # bf16 grid values: tolerance ~ bf16 eps * |grid| * 8 corners
            check(f"grid_res{res}_n{n}", err < 0.06,
                  {"max_err": err, "ref_absmax": float(np.abs(ref).max())})


def knn_cases():
    from multiply_tpu.ops.knn import knn as knn_jnp
    from multiply_tpu.ops.knn_pallas import nn1_pallas

    rng = np.random.default_rng(1)
    for nq in (1024, 2048, 7000, 131_072):
        for nr in (689, 6890):
            q = rng.standard_normal((nq, 3)).astype(np.float32)
            r = rng.standard_normal((nr, 3)).astype(np.float32)
            d2_p, idx_p = nn1_pallas(jnp.asarray(q), jnp.asarray(r))
            d2_j, idx_j = knn_jnp(jnp.asarray(q), jnp.asarray(r), k=1)
            idx_match = float(
                (np.asarray(idx_p).ravel() == np.asarray(idx_j).ravel()).mean()
            )
            d2_err = float(
                np.abs(np.asarray(d2_p).ravel() - np.asarray(d2_j).ravel()).max()
            )
            # ties can legitimately differ in idx; distances must agree
            check(f"nn1_q{nq}_r{nr}", d2_err < 1e-3 and idx_match > 0.999,
                  {"d2_max_err": d2_err, "idx_match": idx_match})


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    grid_cases()
    knn_cases()
    print(json.dumps({"failures": failures}), flush=True)
    sys.exit(1 if failures else 0)
