"""ViT-H-geometry SAM image-encoder forward on the TPU (VERDICT r3 item 6).

The refinement stage runs the SAM image encoder once per frame per 50-epoch
refresh; its production cost on v5e was unknown (test_sam_fullscale.py uses
vit_b width / truncated depth). This measures the REAL vit_h geometry —
32 blocks, 1280-d, 16 heads, 64x64 tokens — with random weights (the official
checkpoint can't be downloaded here; FLOPs/memory don't depend on values).

Prints JSON: encode ms/frame (bf16 and f32 variants), peak HBM if available.
Usage: python scripts/sam_vith_bench.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from multiply_tpu.models.sam import VIT_CONFIGS, ImageEncoderViT

    enc = ImageEncoderViT(**VIT_CONFIGS["vit_h"])

    x = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params = enc.init(key, x)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"init {time.time()-t0:.1f}s, params={n_params/1e6:.1f}M", flush=True)

    fwd = jax.jit(lambda p, x: enc.apply(p, x))

    results = {"metric": "sam_vit_h_encoder_forward", "params_M": round(n_params / 1e6, 1)}
    t0 = time.time()
    out = fwd(params, x)
    np.asarray(out[..., 0, 0, 0])  # host sync
    results["compile_s"] = round(time.time() - t0, 1)

    for _ in range(2):  # warm
        np.asarray(fwd(params, x)[..., 0, 0, 0])
    t0 = time.perf_counter()
    N = 4
    for _ in range(N):
        o = fwd(params, x)
    np.asarray(o[..., 0, 0, 0])
    results["f32_ms_per_frame"] = round((time.perf_counter() - t0) / N * 1e3, 1)

    # bf16 weights + activations (the production-relevant variant)
    params_bf = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    fwd_bf = jax.jit(lambda p, x: enc.apply(p, x.astype(jnp.bfloat16)))
    t0 = time.time()
    o = fwd_bf(params_bf, x)
    np.asarray(o[..., 0, 0, 0].astype(jnp.float32))
    results["bf16_compile_s"] = round(time.time() - t0, 1)
    for _ in range(2):
        np.asarray(fwd_bf(params_bf, x)[..., 0, 0, 0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(N):
        o = fwd_bf(params_bf, x)
    np.asarray(o[..., 0, 0, 0].astype(jnp.float32))
    results["bf16_ms_per_frame"] = round((time.perf_counter() - t0) / N * 1e3, 1)

    try:
        ms = jax.devices()[0].memory_stats()
        results["peak_hbm_gb"] = round(ms.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass

    print(json.dumps(results), flush=True)
    with open(os.path.join(ROOT, "docs", "sam_vith_bench.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
