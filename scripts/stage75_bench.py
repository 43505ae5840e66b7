"""Measure the /50 stage boundary (instance masks + SAM refinement) and the
/20 mesh refresh at PRODUCTION frame count — 75 frames, 270x360 — replacing
docs/runlog_fullscale.md's linear extrapolation (VERDICT r4 item 7).

Stage cost is shape-bound, not content-bound, so the 8-frame fullscale scene
is tiled to 75 frames (per-frame transl jitter keeps the deformed meshes
distinct). Writes docs/stage75.json.

Usage: python scripts/stage75_bench.py [--frames 75]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def tile_scene(scene, frames: int):
    import numpy as np

    reps = -(-frames // scene.images.shape[0])

    def t(a):
        return np.concatenate([a] * reps, axis=0)[:frames]

    transl = t(scene.transl).copy()
    transl += 0.01 * np.sin(np.arange(frames))[:, None, None]
    return scene._replace(
        images=t(scene.images),
        masks=t(scene.masks),
        sam_logits=t(scene.sam_logits),
        poses=t(scene.poses),
        transl=transl,
        cam_pose=t(scene.cam_pose),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=75)
    ap.add_argument("--conf", default=os.path.join(ROOT, "confs", "synthetic_fullscale.yaml"))
    ap.add_argument("--out", default=os.path.join(ROOT, "docs", "stage75.json"))
    args = ap.parse_args()

    t0 = time.time()
    from multiply_tpu.config import load_config
    from multiply_tpu.data.synthetic import make_scene
    from multiply_tpu.data.synthetic_sequence import SyntheticSequence
    from multiply_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    conf = load_config(args.conf)
    train_opt = conf.dataset.train

    scene = make_scene(
        num_frames=train_opt.get("end_frame", 8),
        num_persons=train_opt.get("num_person", 2),
        height=train_opt.get("height", 270),
        width=train_opt.get("width", 360),
    )
    scene = tile_scene(scene, args.frames)
    seq = SyntheticSequence(
        scene,
        num_sample=train_opt.num_sample,
        using_sam=True,
        run_dir="/tmp/stage75",
    )
    conf.model["num_training_frames"] = args.frames
    print(f"[{time.time()-t0:.0f}s] {args.frames}-frame scene ready", flush=True)

    from train import build_servers

    servers = build_servers(conf, seq)

    from multiply_tpu.engine.sam_stage import PriorSegmenter
    from multiply_tpu.engine.trainer import Trainer

    trainer = Trainer(
        conf, seq, servers, run_dir="/tmp/stage75", segmenter=PriorSegmenter()
    )
    # a couple of steps so the SDF fields are non-degenerate for meshing
    trainer.train_epoch()
    print(f"[{time.time()-t0:.0f}s] warm epoch done", flush=True)

    result = {"frames": args.frames,
              "resolution": [scene.height, scene.width]}

    t = time.time()
    trainer.refresh_canonical_state()
    result["mesh_refresh_s"] = round(time.time() - t, 1)
    print(f"[{time.time()-t0:.0f}s] mesh refresh {result['mesh_refresh_s']}s",
          flush=True)

    t = time.time()
    trainer.instance_mask_stage()
    result["instance_mask_stage_s"] = round(time.time() - t, 1)
    print(f"[{time.time()-t0:.0f}s] instance masks "
          f"{result['instance_mask_stage_s']}s", flush=True)

    t = time.time()
    trainer.sam_stage()
    result["sam_stage_s"] = round(time.time() - t, 1)
    print(f"[{time.time()-t0:.0f}s] sam stage {result['sam_stage_s']}s",
          flush=True)

    result["boundary_50_s"] = round(
        result["instance_mask_stage_s"] + result["sam_stage_s"], 1
    )
    # device-side ViT-H encode cost if a real SAM backbone is wired
    # (measured separately: docs/sam_vith_bench.json, 144.7 ms/frame bf16)
    result["vith_encode_75f_s_projected"] = round(0.1447 * args.frames, 1)

    print(json.dumps(result, indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
