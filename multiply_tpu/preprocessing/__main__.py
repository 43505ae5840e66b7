"""Preprocessing stage driver: TRACE npz + frames -> training-ready directory.

Parity target: preprocessing/run_preprocessing_multiply.sh (the reference's
8-stage bash pipeline across 4 conda envs). The external models (ffmpeg frame
extraction, TRACE tracking, ViTPose inference) stay external, exactly as in
the reference; this driver consumes their outputs and runs the in-tree stages
in order: reformat -> mask (PnP init) -> refine -> final -> normalize.

    python -m multiply_tpu.preprocessing \
        --trace raw_data/<seq>/trace/<seq>.npz \
        --frames raw_data/<seq>/frames \
        --out data/<seq> \
        [--keypoints <dir of per-frame (D,17,3) npys>] \
        [--smpl_model <SMPL .pkl>] [--genders neutral neutral] \
        [--focal F --center CX CY] [--scale_factor 2] [--refine_iters 150]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="python -m multiply_tpu.preprocessing")
    ap.add_argument("--trace", required=True,
                    help="TRACE npz (raw or reformatted); with --video, the "
                         "path TRACE's output is produced at")
    ap.add_argument("--frames", required=True,
                    help="directory of extracted frames (with --video, the "
                         "extraction destination)")
    ap.add_argument("--video", default=None,
                    help="raw video: run ffmpeg frame extraction into "
                         "--frames and trace2 tracking to produce --trace "
                         "first (run_preprocessing_multiply.sh:23-26)")
    ap.add_argument("--time_start", default=None,
                    help="ffmpeg -ss (e.g. 00:00:00), with --video")
    ap.add_argument("--time_duration", default=None,
                    help="ffmpeg -t (e.g. 00:00:15), with --video")
    ap.add_argument("--subject_num", type=int, default=2,
                    help="TRACE --subject_num, with --video")
    ap.add_argument("--time2forget", type=int, default=40,
                    help="TRACE --time2forget, with --video")
    ap.add_argument("--out", required=True, help="output training data directory")
    ap.add_argument("--keypoints", default=None,
                    help="dir of per-frame keypoint npys (D,J,3); falls back "
                         "to TRACE's projected joints")
    ap.add_argument("--vitpose", default=None,
                    help="local ViTPose checkpoint dir: run bbox-prompted "
                         "keypoint inference in-driver instead of --keypoints")
    ap.add_argument("--kp_format", default="coco17",
                    choices=["coco17", "openpose25"],
                    help="keypoint layout: ViTPose/COCO-17 or OpenPose BODY_25")
    ap.add_argument("--smpl_model", default=None,
                    help="SMPL model .pkl (default: synthetic test body)")
    ap.add_argument("--genders", nargs="*", default=None)
    ap.add_argument("--focal", type=float, default=None)
    ap.add_argument("--center", type=float, nargs=2, default=None)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    ap.add_argument("--skip", type=int, default=1)
    ap.add_argument("--scale_factor", type=int, default=2)
    ap.add_argument("--refine_iters", type=int, default=150)
    args = ap.parse_args(argv)

    from ..body import SMPLServer, synthetic_body_model
    from .pipeline import preprocess_sequence
    from .trace import trace_inputs_from_files

    if args.video is not None:
        from .video import extract_frames, run_trace

        frames = extract_frames(
            args.video, args.frames,
            time_start=args.time_start, time_duration=args.time_duration,
        )
        print(f"extracted {len(frames)} frames -> {args.frames}")
        if not os.path.exists(args.trace):
            npz = run_trace(
                args.frames,
                os.path.join(os.path.dirname(args.trace) or ".", "trace_results"),
                subject_num=args.subject_num,
                time2forget=args.time2forget,
            )
            os.makedirs(os.path.dirname(args.trace) or ".", exist_ok=True)
            import shutil

            shutil.copyfile(npz, args.trace)
            print(f"trace results -> {args.trace}")

    K = None
    if args.focal is not None:
        cx, cy = args.center if args.center else (0.0, 0.0)
        K = np.array(
            [[args.focal, 0, cx], [0, args.focal, cy], [0, 0, 1]], np.float32
        )

    inputs = trace_inputs_from_files(
        args.trace,
        args.frames,
        K=K,
        genders=args.genders,
        keypoints_dir=args.keypoints,
        start=args.start,
        end=args.end,
        skip=args.skip,
        kp_format=args.kp_format,
        vitpose_checkpoint=args.vitpose,
    )
    F, P = inputs.poses.shape[:2]
    print(f"{F} frames, {P} persons, image {inputs.images[0].shape[:2]}")

    if args.smpl_model:
        from ..body.smpl import load_smpl_model

        servers = [
            SMPLServer.create(
                load_smpl_model(args.smpl_model), betas=inputs.betas[p]
            )
            for p in range(P)
        ]
    else:
        print("no --smpl_model given: using the synthetic test body")
        model = synthetic_body_model()
        servers = [
            SMPLServer.create(model, betas=inputs.betas[p]) for p in range(P)
        ]

    os.makedirs(args.out, exist_ok=True)
    preprocess_sequence(
        args.out,
        inputs,
        servers,
        refine_iters=args.refine_iters,
        scale_factor=args.scale_factor,
    )
    print(f"wrote training directory: {args.out}")


if __name__ == "__main__":
    main()
