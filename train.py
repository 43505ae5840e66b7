"""Training entry point.

Reference equivalent: code/train.py (Hydra + Lightning). Here: plain argparse
+ composed YAML (multiply_tpu/config.py) + the Trainer orchestrator.

    python train.py --conf confs/synthetic_base.yaml [--max_epochs N]
    python train.py --conf confs/taichi01_base.yaml --data_root /path/to/data

Per-run artifacts (checkpoints, stage_* refinement files, validation renders)
go to outputs/<exp>/<run>/ like the reference's Hydra run dir.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_servers(conf, seq):
    """Per-person SMPL servers: real SMPL pickles if provided, else synthetic
    test bodies (smpl_model_path key absent or missing files)."""
    import numpy as np

    from multiply_tpu.body import SMPLServer, load_smpl_model, synthetic_body_model

    model_path = conf.get("smpl_model_path", None)
    servers = []
    for p in range(seq.num_person):
        gender = seq.genders[p] if hasattr(seq, "genders") else "neutral"
        if model_path and os.path.exists(model_path):
            body = load_smpl_model(model_path, gender=gender)
        else:
            if model_path:
                print(
                    f"WARNING: smpl_model_path={model_path} does not exist — "
                    "falling back to the SYNTHETIC test body. Real sequences "
                    "will produce garbage geometry (docs/REAL_DATA.md)."
                )
            body = synthetic_body_model()
        servers.append(SMPLServer.create(body, betas=np.asarray(seq.shape[p])))
    return servers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--data_root", default=None, help="override dataset root")
    ap.add_argument("--max_epochs", type=int, default=None)
    ap.add_argument("--run_dir", default=None)
    ap.add_argument("--is_continue", action="store_true")
    ap.add_argument(
        "--devices", type=int, default=0, metavar="N",
        help="shard each step's rays across the first N local devices "
             "(params replicated, grads all-reduced over ICI); 0/1 = single",
    )
    ap.add_argument(
        "--profile", type=int, default=0, metavar="N",
        help="trace N training steps, print the per-HLO-category device-time "
             "table, write <run_dir>/profile/summary.json, and exit",
    )
    ap.add_argument(
        "--set", action="append", default=[], metavar="KEY=VAL", dest="sets",
        help="dotted config override, e.g. --set model.stage_overlap=true "
             "(YAML-parsed value; repeatable)",
    )
    args = ap.parse_args()

    import yaml

    from multiply_tpu.config import load_config
    from multiply_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    overrides: dict = {}
    for kv in args.sets:
        key, _, val = kv.partition("=")
        node = overrides
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    conf = load_config(args.conf, overrides=overrides or None)

    exp = conf.get("exp", "exp")
    run = conf.get("run", "run")
    run_dir = args.run_dir or os.path.join("outputs", str(exp), str(run))
    os.makedirs(run_dir, exist_ok=True)
    ckpt_dir = os.path.join(run_dir, "checkpoints")

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
        seq = SyntheticSequence(
            scene,
            num_sample=train_opt.num_sample,
            using_sam=train_opt.get("using_SAM", True),
            run_dir=run_dir,
        )
    else:
        from multiply_tpu.data.dataset import Hi4DSequence

        root = args.data_root or os.path.join("data", train_opt.data_dir)
        seq = Hi4DSequence(
            root,
            start_frame=train_opt.start_frame,
            end_frame=train_opt.end_frame,
            num_sample=train_opt.num_sample,
            using_sam=train_opt.get("using_SAM", True),
            ratio_uncertain=train_opt.get("ratio_uncertain", 0.5),
            run_dir=run_dir,
        )

    servers = build_servers(conf, seq)

    from multiply_tpu.engine.sam_stage import PriorSegmenter
    from multiply_tpu.engine.trainer import Trainer

    segmenter = PriorSegmenter()
    sam_ckpt = conf.get("sam_checkpoint", None)
    if sam_ckpt and os.path.exists(str(sam_ckpt)):
        from multiply_tpu.engine.sam_stage import SamSegmenter
        from multiply_tpu.models.sam import build_sam_predictor

        images = [
            (lambda i=i: (seq.get_eval_item(i)["rgb"].reshape(*seq.get_eval_item(i)["img_size"], 3) * 255).astype("uint8"))
            for i in range(len(seq))
        ]
        segmenter = SamSegmenter(build_sam_predictor(str(sam_ckpt)), images)

    trainer = Trainer(
        conf, seq, servers, run_dir=run_dir, segmenter=segmenter,
        seed=conf.get("seed", 42),
        devices=args.devices or conf.get("devices", None),
    )

    if args.is_continue or conf.model.get("is_continue", False):
        import glob as _glob

        ckpts = sorted(_glob.glob(os.path.join(ckpt_dir, "epoch_*")))
        if ckpts:
            print(f"resuming from {ckpts[-1]}")
            trainer.load_checkpoint(ckpts[-1])

    if args.profile:
        from multiply_tpu.utils.profiling import profile_training_steps

        profile_training_steps(
            trainer, args.profile, os.path.join(run_dir, "profile")
        )
        return

    max_epochs = args.max_epochs or conf.get("max_epochs", 10_000)
    trainer.fit(max_epochs, ckpt_dir=ckpt_dir)


if __name__ == "__main__":
    main()
