"""Find which loss term produces NaN grads in the reference process at step 0.

The parity run (RUNLOG_PARITY.md) shows the reference trajectory all-NaN from
step 1: finite loss at step 0, but some backward path emits NaN grads, Adam
steps params to NaN, and every later forward is NaN. This isolates the term.
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "ref_process"))

import jax
jax.config.update("jax_platforms", "cpu")

import driver  # noqa: E402


def main():
    import torch

    workdir = tempfile.mkdtemp(prefix="refnan_")
    scene, model_smpl, smpl_dir, betas_path = driver.build_assets(
        workdir, num_frames=2)
    ref_model, ref_loss, body, optimizer = driver.build_reference(
        workdir, scene, smpl_dir, betas_path, 2)

    rays = driver.pick_rays(scene, 0, 64, seed=1000)
    inputs, targets = driver.ref_inputs(scene, 0, rays, 0, body)
    ref_model.train()
    outputs = ref_model(inputs)
    for k, v in outputs.items():
        if torch.is_tensor(v) and v.dtype.is_floating_point:
            n = int(v.isnan().sum())
            if n:
                print(f"FORWARD NaN: {k} {n}/{v.numel()}")
    loss_out = ref_loss(outputs, targets)
    print({k: float(v) for k, v in loss_out.items()})

    # backward each component separately and report NaN/inf grads
    params = {n: p for n, p in ref_model.named_parameters()}
    for p_i, d in enumerate(body):
        for k, v in d.items():
            params[f"body{p_i}.{k}"] = v
    for term in ["rgb_loss", "eikonal_loss", "bce_loss", "in_shape_loss",
                 "temporal_loss", "sam_mask_loss", "depth_order_loss",
                 "loss"]:
        t = loss_out[term]
        if not torch.is_tensor(t) or not t.requires_grad:
            print(f"{term}: no grad path")
            continue
        for p in params.values():
            p.grad = None
        t.backward(retain_graph=True)
        bad = [n for n, p in params.items()
               if p.grad is not None and not torch.isfinite(p.grad).all()]
        print(f"{term}: {'BAD -> ' + ', '.join(bad) if bad else 'grads finite'}")


if __name__ == "__main__":
    main()
