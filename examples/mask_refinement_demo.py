"""Mask self-refinement recovery demo: the paper's progressive prompting loop
actually CORRECTING bad inputs.

Setup (the failure mode the machinery exists for):
  * translations of the last half of the frames are perturbed (bad tracking),
  * the initial supervision masks on those frames are corrupted (dilated +
    a band swapped between persons, i.e. bad preprocessing masks),
  * the segmentation stage is IMAGE-DRIVEN (ColorPromptPredictor through the
    full SamSegmenter prompt pipeline): bad geometry -> bad prompts -> bad
    masks; recovering geometry -> recovering masks. Nothing is an identity
    shortcut.

What must happen if the loop works (reference multiply_model.py:489-519,
sam_model.py:57-239, Hi4D.py:186-229):
  * supervision-mask IoU vs GT recovers across stage boundaries,
  * the SMPL<->SAM certainty ranking flags exactly the corrupted frames as
    uncertain, firing MODE_DELAYED_POSE on them (logged per segment),
  * the perturbed translations move back toward GT,
  * val PSNR tracks the recovery.

    python examples/mask_refinement_demo.py [--epochs 200] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def corrupt_sam_logits(scene, frames, rng, dilate_px: int = 4):
    """Corrupt the initial supervision logits on `frames`: dilate person 0
    into the background and swap a horizontal band between persons 0/1."""
    import cv2

    logits = scene.sam_logits.copy()
    H = scene.height
    for f in frames:
        m0 = (logits[f, :, :, 0] > 0).astype(np.uint8)
        k = np.ones((2 * dilate_px + 1, 2 * dilate_px + 1), np.uint8)
        m0d = cv2.dilate(m0, k) > 0
        logits[f, :, :, 0] = np.where(m0d, 8.0, -8.0)
        if logits.shape[-1] > 1:
            band = slice(H // 3, 2 * H // 3)
            a = logits[f, band, :, 0].copy()
            logits[f, band, :, 0] = logits[f, band, :, 1]
            logits[f, band, :, 1] = a
    return logits


def supervision_iou(seq, scene) -> float:
    """IoU of the masks the training loop is currently supervised by
    (stage output if present, else the corrupted initial logits) vs GT."""
    used = seq._sam_masks if seq._sam_masks is not None else scene.sam_logits
    pred = used > 0
    gt = scene.masks
    inter = np.logical_and(pred, gt).sum(axis=(1, 2))
    union = np.logical_or(pred, gt).sum(axis=(1, 2))
    return float(np.mean(inter / np.maximum(union, 1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--segment", type=int, default=20)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--perturb", type=float, default=0.08)
    ap.add_argument("--run_dir", default="outputs/Synthetic/maskdemo")
    ap.add_argument("--out", default="RUNLOG_MASKS.md")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: session platform)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from multiply_tpu.config import load_config
    from multiply_tpu.data.synthetic import make_scene
    from multiply_tpu.data.synthetic_sequence import SyntheticSequence
    from multiply_tpu.engine.sam_stage import ColorPromptPredictor, SamSegmenter
    from multiply_tpu.engine.trainer import Trainer

    conf = load_config(
        os.path.join(os.path.dirname(__file__), "..", "confs", "synthetic_base.yaml"),
        overrides={
            "model": {
                "pose_correction_epoch": 100,
                "pose_start_epoch": 60,
                "pose_end_epoch": 160,
                "pose_opt_interval": 10,
                "pose_opt_epoch": 1,
                "depth_end": False,
                "depth_epoch": [],
                "it_per_loop": 40,
                "cano_grid_res": 24,
                "cano_mesh_res_up": 1,
                "mesh_pad_bucket": 4096,
                "pose_pixel_samples": 1024,
                "interp_samples": 2048,
                "depth_pixel_samples": 2048,
                "depth_render_rays": 128,
                "loss": {"sam_start_epoch": 40},
            },
            "dataset": {"train": {"num_sample": 128, "end_frame": args.frames,
                                  "height": 48, "width": 64}},
        },
    )
    run_dir = args.run_dir
    os.makedirs(run_dir, exist_ok=True)
    rng = np.random.default_rng(7)

    scene = make_scene(num_frames=args.frames, num_persons=2, height=48, width=64)
    bad_frames = list(range(args.frames // 2, args.frames))

    corrupted = corrupt_sam_logits(scene, bad_frames, rng)
    scene = scene._replace(sam_logits=corrupted)

    seq = SyntheticSequence(
        scene, num_sample=128, using_sam=True, run_dir=run_dir,
        ratio_uncertain=0.5,
    )
    # bad tracking on the corrupted frames: perturb their initial translations
    gt_trans = np.asarray(scene.transl).copy()
    trans = gt_trans.copy()
    trans[bad_frames] += rng.uniform(
        -args.perturb, args.perturb, size=trans[bad_frames].shape
    ).astype(np.float32)
    seq.trans = trans

    from train import build_servers

    servers = build_servers(conf, seq)
    segmenter = SamSegmenter(
        ColorPromptPredictor(),
        images=[(scene.images[f] * 255).astype(np.uint8) for f in range(args.frames)],
    )
    tr = Trainer(conf, seq, servers, run_dir=run_dir, segmenter=segmenter)

    iou0 = supervision_iou(seq, scene)
    print(f"initial supervision-mask IoU (corrupted): {iou0:.3f}")
    transl_err0 = float(
        np.sqrt(np.mean((trans[bad_frames] - gt_trans[bad_frames]) ** 2))
    )

    rows = []
    t0 = time.time()
    while tr.epoch < args.epochs:
        upto = min(tr.epoch + args.segment, args.epochs)
        tr.fit(upto, val_every=args.segment, ckpt_every=10**9, render_val=False)
        try:
            psnr = tr.validate(frame_idx=bad_frames[0])
        except Exception as e:
            print(f"validate failed: {e}")
            psnr = float("nan")
        seq._refresh_sam()
        sup_iou = supervision_iou(seq, scene)
        uncertain = [
            f for f in range(args.frames)
            if seq.smpl_sam_iou[f] < seq.uncertain_threshold
        ]
        body_trans = np.asarray(tr.ts.params["body"].transl)  # (P, F, 3)
        cur = np.moveaxis(body_trans, 0, 1)  # (F, P, 3)
        terr = float(np.sqrt(np.mean((cur[bad_frames] - gt_trans[bad_frames]) ** 2)))
        # mode counts over the segment from the metrics log
        n_delayed = n_pose = 0
        metrics_path = os.path.join(run_dir, "metrics.jsonl")
        if os.path.exists(metrics_path):
            with open(metrics_path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    if rec.get("epoch", -1) >= tr.epoch - args.segment:
                        n_delayed += int(rec.get("n_delayed_pose", 0))
                        n_pose += int(rec.get("n_pose_only", 0))
        row = {
            "epoch": tr.epoch,
            "psnr": psnr,
            "sup_iou": sup_iou,
            "uncertain": uncertain,
            "transl_rmse": terr,
            "n_delayed": n_delayed,
            "n_pose_only": n_pose,
            "wall_s": time.time() - t0,
        }
        rows.append(row)
        print(
            f"[segment] epoch {row['epoch']} PSNR {psnr:.2f} supIoU {sup_iou:.3f} "
            f"terr {terr*100:.2f}cm uncertain={uncertain} "
            f"delayed={n_delayed} pose_only={n_pose} ({row['wall_s']:.0f}s)"
        )

    write_runlog(args.out, rows, iou0, transl_err0, bad_frames,
                 time.time() - t0, run_dir, seq, scene)


def write_runlog(path, rows, iou0, terr0, bad_frames, wall, run_dir, seq, scene):
    md = []
    md.append("# RUNLOG — mask self-refinement recovery (corrupted start)\n")
    md.append(
        "Corrupted initial supervision masks (person-0 dilation + person band "
        f"swap) AND perturbed translations on frames {bad_frames}; the "
        "segmentation stage is image-driven (ColorPromptPredictor through the "
        "full SamSegmenter prompt pipeline), so masks follow the image "
        "evidence given geometry-derived prompts — the loop has to *earn* the "
        "recovery. Ref: multiply_model.py:489-519, sam_model.py:57-239, "
        "Hi4D.py:186-229.\n"
    )
    md.append(f"Initial supervision-mask IoU: **{iou0:.3f}**; initial transl "
              f"rmse on corrupted frames: **{terr0*100:.2f} cm**. "
              f"Wall-clock {wall/60:.1f} min.\n")
    md.append("\n## Trajectory\n")
    md.append("| epoch | val PSNR (corrupted frame) | supervision IoU | transl rmse (cm) | uncertain frames | delayed-pose steps | pose-only steps |")
    md.append("|---|---|---|---|---|---|---|")
    for r in rows:
        md.append(
            f"| {r['epoch']} | {r['psnr']:.2f} | {r['sup_iou']:.3f} | "
            f"{r['transl_rmse']*100:.2f} | {r['uncertain']} | "
            f"{r['n_delayed']} | {r['n_pose_only']} |"
        )
    last = rows[-1]
    md.append(
        f"\nSupervision IoU {iou0:.3f} -> {last['sup_iou']:.3f}; transl rmse "
        f"{terr0*100:.2f} -> {last['transl_rmse']*100:.2f} cm; PSNR "
        f"{rows[0]['psnr']:.2f} -> {last['psnr']:.2f} dB.\n"
    )

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs("docs/runlog_masks", exist_ok=True)
        ep = [r["epoch"] for r in rows]
        fig, ax1 = plt.subplots(figsize=(7, 4))
        ax1.plot(ep, [r["sup_iou"] for r in rows], "s-", color="tab:orange",
                 label="supervision mask IoU")
        ax1.axhline(iou0, color="tab:orange", ls=":", lw=0.8)
        ax1.set_xlabel("epoch")
        ax1.set_ylabel("supervision mask IoU vs GT")
        ax2 = ax1.twinx()
        ax2.plot(ep, [r["psnr"] for r in rows], "o-", label="val PSNR")
        ax2.set_ylabel("PSNR (dB)")
        fig.tight_layout()
        fig.savefig("docs/runlog_masks/iou_psnr.png", dpi=120)
        md.append("![trajectory](docs/runlog_masks/iou_psnr.png)\n")

        # first(corrupted) vs final supervision masks on a corrupted frame
        f = bad_frames[0]
        used = seq._sam_masks if seq._sam_masks is not None else scene.sam_logits
        fig2, axes = plt.subplots(1, 3, figsize=(9, 3))
        axes[0].imshow(scene.images[f]); axes[0].set_title("image")
        init = np.argmax(scene.sam_logits[f], -1) + (scene.sam_logits[f].max(-1) > 0)
        axes[1].imshow(init, cmap="tab10", vmin=0, vmax=9)
        axes[1].set_title("initial (corrupted)")
        fin = np.argmax(used[f], -1) + (used[f].max(-1) > 0)
        axes[2].imshow(fin, cmap="tab10", vmin=0, vmax=9)
        axes[2].set_title("final supervision")
        for a in axes:
            a.axis("off")
        fig2.tight_layout()
        fig2.savefig("docs/runlog_masks/masks_first_last.png", dpi=120)
        md.append("![masks](docs/runlog_masks/masks_first_last.png)\n")
    except Exception as e:
        print(f"plot failed: {e}")

    with open(path, "w") as fh:
        fh.write("\n".join(md) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
