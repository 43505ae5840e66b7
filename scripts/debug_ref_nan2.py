"""Step the reference process exactly like scripts/e2e_parity.py until the
first non-finite gradient, then re-run that step under
torch.autograd.set_detect_anomaly to name the producing forward op.

Round-4 verdict: the parity run's reference side NaNs between steps 0 and 10
(finite loss, NaN grads). This reproduces the failing step deterministically
(same scene, same seeds: rays seed=100+i, frame=i%2, epoch=i//2).
"""
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests", "ref_process"))

import jax

jax.config.update("jax_platforms", "cpu")

import driver  # noqa: E402


def main():
    import torch

    workdir = "/tmp/refnan2"
    os.makedirs(workdir, exist_ok=True)
    scene, _, smpl_dir, betas_path = driver.build_assets(workdir, num_frames=2)
    ref_model, ref_loss, body, optimizer = driver.build_reference(
        workdir, scene, smpl_dir, betas_path, 2)

    params = {n: p for n, p in ref_model.named_parameters()}
    for p_i, d in enumerate(body):
        for k, v in d.items():
            params[f"body{p_i}.{k}"] = v

    for i in range(40):
        frame = i % 2
        epoch = i // 2
        rays = driver.pick_rays(scene, frame, 64, seed=100 + i)
        inputs, targets = driver.ref_inputs(scene, frame, rays, epoch, body)
        ref_model.train()
        outputs = ref_model(inputs)
        nan_outs = []
        for k, v in outputs.items():
            if torch.is_tensor(v) and v.dtype.is_floating_point:
                n = int(v.isnan().sum())
                if n:
                    nan_outs.append(f"{k}:{n}/{v.numel()}")
        loss_out = ref_loss(outputs, targets)
        loss = loss_out["loss"]
        if torch.isnan(loss):
            loss = torch.zeros((1), requires_grad=True)
        optimizer.zero_grad()
        loss.backward()
        bad = [n for n, p in params.items()
               if p.grad is not None and not torch.isfinite(p.grad).all()]
        print(f"step {i}: loss={float(loss_out['loss']):.4f} "
              f"nan_fwd=[{','.join(nan_outs)}] bad_grads={len(bad)}",
              flush=True)
        if bad:
            print("  bad params:", bad[:12])
            # isolate per-term
            for term in ["rgb_loss", "eikonal_loss", "bce_loss",
                         "in_shape_loss", "sam_mask_loss", "loss"]:
                t = loss_out[term]
                if not torch.is_tensor(t) or not t.requires_grad:
                    continue
                for p in params.values():
                    p.grad = None
                t.backward(retain_graph=True)
                b = [n for n, p in params.items()
                     if p.grad is not None and not torch.isfinite(p.grad).all()]
                print(f"  {term}: {'BAD ' + ','.join(b[:6]) if b else 'finite'}",
                      flush=True)
            # anomaly mode: rerun forward+backward to name the op
            print("  re-running under detect_anomaly...", flush=True)
            with torch.autograd.set_detect_anomaly(True):
                outputs2 = ref_model(inputs)
                loss2 = ref_loss(outputs2, targets)["loss"]
                optimizer.zero_grad()
                try:
                    loss2.backward()
                except RuntimeError as e:
                    print("  ANOMALY:", e)
            return
        optimizer.step()
        with torch.no_grad():
            badp = [n for n, p in params.items()
                    if not torch.isfinite(p).all()]
        if badp:
            print(f"step {i}: params went non-finite AFTER step: {badp[:12]}")
            return
    print("no NaN in 40 steps")


if __name__ == "__main__":
    main()
