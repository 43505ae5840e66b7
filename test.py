"""Inference entry point: full-image renders + mesh exports from a checkpoint.

Reference equivalent: code/test.py (loads latest checkpoint, writes
test_rendering/, test_fg_rendering/, test_normal/, test_mask/,
test_instance_mask/, test_mesh/). Modes: default, novel_view, free_view.

    python test.py --conf confs/synthetic_base.yaml [--mode default]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--run_dir", default=None)
    ap.add_argument("--ckpt", default=None, help="checkpoint path (default: latest)")
    ap.add_argument(
        "--mode", default="default", choices=["default", "free_view", "novel_view"]
    )
    ap.add_argument("--frames", type=int, default=None, help="limit frames")
    ap.add_argument("--export_meshes", action="store_true")
    ap.add_argument("--novel_view", type=int, default=None,
                    help="held-out GT camera id (novel_view mode)")
    ap.add_argument("--current_view", type=int, default=None,
                    help="GT camera id the training camera corresponds to")
    ap.add_argument("--gt_cameras", default=None,
                    help="path to rgb_cameras.npz (ids/intrinsics/extrinsics)")
    args = ap.parse_args()

    from multiply_tpu.config import load_config
    from multiply_tpu.engine.evaluator import Evaluator
    from multiply_tpu.engine.trainer import Trainer
    from multiply_tpu.engine.sam_stage import PriorSegmenter
    from multiply_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    conf = load_config(args.conf)
    exp = conf.get("exp", "exp")
    run = conf.get("run", "run")
    run_dir = args.run_dir or os.path.join("outputs", str(exp), str(run))

    # dataset + servers via the train entry's builders
    from train import build_servers

    train_opt = conf.dataset.train
    if train_opt.dataset == "Synthetic":
        from multiply_tpu.data.synthetic import make_scene
        from multiply_tpu.data.synthetic_sequence import SyntheticSequence

        scene = make_scene(
            num_frames=train_opt.get("end_frame", 4),
            num_persons=train_opt.get("num_person", 2),
            height=train_opt.get("height", 48),
            width=train_opt.get("width", 64),
        )
        seq = SyntheticSequence(scene, num_sample=-1, run_dir=run_dir)
    else:
        from multiply_tpu.data.dataset import Hi4DSequence

        root = args.data_root or os.path.join("data", train_opt.data_dir)
        seq = Hi4DSequence(
            root,
            start_frame=train_opt.start_frame,
            end_frame=train_opt.end_frame,
            num_sample=-1,
            using_sam=train_opt.get("using_SAM", True),
            run_dir=run_dir,
        )

    servers = build_servers(conf, seq)
    trainer = Trainer(conf, seq, servers, run_dir=run_dir, segmenter=PriorSegmenter())

    ckpt = args.ckpt
    if ckpt is None:
        cands = sorted(glob.glob(os.path.join(run_dir, "checkpoints", "epoch_*")))
        cands += sorted(glob.glob(os.path.join(run_dir, "checkpoints", "last")))
        if cands:
            ckpt = cands[-1]
    if ckpt:
        print(f"loading {ckpt}")
        trainer.load_checkpoint(ckpt)
    else:
        print("WARNING: no checkpoint found; rendering from initialization")

    pixel_per_batch = conf.dataset.test.get("pixel_per_batch", 512)
    ev = Evaluator(
        trainer.renderer, trainer.person_state, servers, pixel_per_batch=pixel_per_batch
    )

    novel_cams = None
    if args.mode == "novel_view":
        novel_cams = _resolve_novel_cameras(args, conf, seq)

    n_frames = args.frames or len(seq)
    out_dir = os.path.join(run_dir, "test")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_frames):
        item = seq.get_eval_item(i)
        if args.mode == "free_view":
            item = _orbit_camera(item, angle_deg=i * (360.0 / max(n_frames, 1)))
        elif args.mode == "novel_view":
            cam = novel_cams[i]
            item = dict(item)
            item["P"] = cam["P"]
            item["intrinsics"] = np.asarray(cam["intrinsics"], np.float32)
            item["pose"] = np.asarray(cam["pose"], np.float32)
            item.pop("rgb", None)
        merged = ev.render_image(
            trainer.ts.params["net"], trainer.ts.params["body"], item,
            epoch=trainer.epoch, person_state=trainer.person_state,
        )
        gt = (
            np.asarray(item["rgb"], np.float32).reshape(*item["img_size"], 3)
            if "rgb" in item and args.mode == "default"
            else None
        )
        ev.save_outputs(out_dir, i, merged, gt)
        msg = f"frame {i}: wrote renders"
        if "psnr" in merged:
            msg += f" (PSNR {merged['psnr']:.2f} dB)"
        print(msg)
        if args.export_meshes:
            fns = [trainer.canonical_sdf_fn(p) for p in range(seq.num_person)]
            ev.export_meshes(
                fns, trainer.ts.params["body"], trainer.person_state.deformer,
                i, float(seq.scale), out_dir,
            )


def _resolve_novel_cameras(args, conf, seq) -> list[dict]:
    """Per-frame cameras for the held-out GT view (reference test.py +
    Hi4D.py:387-431). CLI flags override dataset.test config keys
    (novel_view, current_view, GT_DIR/pair/action)."""
    from multiply_tpu.data.dataset import novel_view_cameras

    test_opt = conf.dataset.get("test", {})
    nv = args.novel_view if args.novel_view is not None else test_opt.get("novel_view")
    cv = (
        args.current_view
        if args.current_view is not None
        else test_opt.get("current_view")
    )
    path = args.gt_cameras
    if path is None and all(k in test_opt for k in ("GT_DIR", "pair", "action")):
        path = os.path.join(
            str(test_opt["GT_DIR"]), str(test_opt["pair"]), str(test_opt["action"]),
            "cameras", "rgb_cameras.npz",
        )
    if nv is None or cv is None or path is None:
        raise SystemExit(
            "novel_view mode needs --novel_view, --current_view and --gt_cameras "
            "(or dataset.test.{novel_view,current_view,GT_DIR,pair,action})"
        )
    if not hasattr(seq, "scale_mats"):
        raise SystemExit("novel_view mode needs a dataset with cameras_normalize.npz")
    gt = dict(np.load(path))
    print(f"novel view {nv} (training camera = GT view {cv}) from {path}")
    return novel_view_cameras(seq, gt, current_view=int(cv), novel_view=int(nv))


def _orbit_camera(item: dict, angle_deg: float) -> dict:
    """Free-view synthesis: rotate the camera about the scene's y axis
    (reference Hi4D.py:488-551 / rend_util.get_new_cam_pose_fvr)."""
    from scipy.spatial.transform import Rotation

    pose = np.asarray(item["pose"]).copy()
    rot = Rotation.from_euler("y", angle_deg, degrees=True).as_matrix()
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = rot
    item = dict(item)
    item["pose"] = (T @ pose).astype(np.float32)
    item.pop("rgb", None)
    return item


if __name__ == "__main__":
    main()
