"""Reproduce the step-7 forward NaN in the reference process and name the
first module/op that produces it (module forward hooks + manual walk of the
deformer math). Follow-up to debug_ref_nan2.py."""
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

    workdir = "/tmp/refnan3"
    os.makedirs(workdir, exist_ok=True)
    scene, _, smpl_dir, betas_path = driver.build_assets(workdir, num_frames=2)
    ref_model, ref_loss, body, optimizer = driver.build_reference(
        workdir, scene, smpl_dir, betas_path, 2)

    # steps 0..6 exactly as the parity loop
    for i in range(7):
        frame, epoch = i % 2, i // 2
        rays = driver.pick_rays(scene, frame, 64, seed=100 + i)
        driver.ref_train_step(ref_model, ref_loss, body, optimizer, scene,
                              frame, rays, epoch)
        print(f"step {i} done", flush=True)

    # step 7: instrument
    i = 7
    frame, epoch = i % 2, i // 2
    rays = driver.pick_rays(scene, frame, 64, seed=100 + i)
    inputs, targets = driver.ref_inputs(scene, frame, rays, epoch, body)

    events = []

    def hook(name):
        def f(mod, args, out):
            def scan(tag, t):
                if torch.is_tensor(t) and t.dtype.is_floating_point:
                    n = int(t.isnan().sum()) + int(t.isinf().sum())
                    if n:
                        events.append(f"{name} {tag}: {n}/{t.numel()} nonfinite")
            for j, a in enumerate(args):
                scan(f"in{j}", a)
            if torch.is_tensor(out):
                scan("out", out)
            elif isinstance(out, tuple):
                for j, o in enumerate(out):
                    scan(f"out{j}", o)
        return f

    for name, mod in ref_model.named_modules():
        if name:
            mod.register_forward_hook(hook(name))

    # also wrap the deformer's skinning-level calls
    import lib.model.deformer as refdef

    orig_skinning = refdef.skinning

    def skinning_watch(x, w, tfs, inverse=False):
        out = orig_skinning(x, w, tfs, inverse=inverse)
        for tag, t in (("x", x), ("w", w), ("out", out)):
            n = int(t.isnan().sum()) + int(t.isinf().sum())
            if n:
                events.append(
                    f"skinning(inverse={inverse}) {tag}: {n}/{t.numel()}")
        if inverse:
            w_tf = torch.einsum("bpn,bnij->bpij", w, tfs)
            det = torch.det(w_tf)
            bad = (det.abs() < 1e-8).sum()
            if bad:
                events.append(
                    f"skinning inverse: {int(bad)} near-singular w_tf "
                    f"(|det| min {float(det.abs().min()):.2e}); "
                    f"w row sums min {float(w.sum(-1).min()):.3f} "
                    f"max {float(w.sum(-1).max()):.3f}")
        return out

    refdef.skinning = skinning_watch

    ref_model.train()
    outputs = ref_model(inputs)
    for k, v in outputs.items():
        if torch.is_tensor(v) and v.dtype.is_floating_point:
            n = int(v.isnan().sum())
            if n:
                print(f"OUTPUT NaN: {k} {n}/{v.numel()}")
    print(f"--- {len(events)} nonfinite events (first 40) ---")
    for e in events[:40]:
        print(" ", e)


if __name__ == "__main__":
    main()
