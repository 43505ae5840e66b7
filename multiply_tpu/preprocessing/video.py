"""External-binary stage wrappers: ffmpeg frame extraction and TRACE tracking.

Parity target: preprocessing/run_preprocessing_multiply.sh:23-26 — the
reference's first two pipeline stages invoke `ffmpeg` and `trace2` as
external programs; everything downstream consumes their file outputs. These
wrappers reproduce the same invocations (same flags) via subprocess so
`python -m multiply_tpu.preprocessing --video ...` covers the full story from
a raw video. Both degrade with an actionable error when the binary is absent
(the binaries are not vendored, exactly as in the reference) and are
mockable by placing a stub executable on PATH.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess


class MissingBinaryError(RuntimeError):
    pass


def _require(binary: str, hint: str) -> str:
    path = shutil.which(binary)
    if path is None:
        raise MissingBinaryError(
            f"`{binary}` not found on PATH. {hint}"
        )
    return path


def extract_frames(
    video: str,
    frames_dir: str,
    time_start: str | None = None,
    time_duration: str | None = None,
    ffmpeg_bin: str = "ffmpeg",
) -> list[str]:
    """ffmpeg -i video [-ss start] [-t duration] -vsync 0 frames/%04d.png
    (run_preprocessing_multiply.sh:23). Returns the extracted frame paths."""
    ffmpeg = _require(
        ffmpeg_bin,
        "Install ffmpeg or extract frames yourself into --frames and rerun "
        "without --video.",
    )
    os.makedirs(frames_dir, exist_ok=True)
    cmd = [ffmpeg, "-i", video]
    if time_start:
        cmd += ["-ss", time_start]
    if time_duration:
        cmd += ["-t", time_duration]
    cmd += ["-vsync", "0", os.path.join(frames_dir, "%04d.png")]
    subprocess.run(cmd, check=True)
    frames = sorted(glob.glob(os.path.join(frames_dir, "*.png")))
    if not frames:
        raise RuntimeError(f"ffmpeg produced no frames in {frames_dir}")
    return frames


def run_trace(
    frames_dir: str,
    results_dir: str,
    subject_num: int,
    time2forget: int = 40,
    trace_bin: str = "trace2",
    extra_args: list[str] | None = None,
) -> str:
    """trace2 -i frames --subject_num=N --results_save_dir=... --time2forget=40
    (run_preprocessing_multiply.sh:26). Returns the result npz path."""
    trace = _require(
        trace_bin,
        "Install TRACE (https://github.com/Arthur151/ROMP) in its own env, "
        "or run it yourself and pass its npz via --trace.",
    )
    os.makedirs(results_dir, exist_ok=True)
    cmd = [
        trace,
        "-i", frames_dir,
        f"--subject_num={subject_num}",
        f"--results_save_dir={results_dir}",
        f"--time2forget={time2forget}",
    ]
    if extra_args:
        cmd += list(extra_args)
    subprocess.run(cmd, check=True)
    npzs = sorted(
        glob.glob(os.path.join(results_dir, "**", "*.npz"), recursive=True),
        key=os.path.getmtime,
    )
    if not npzs:
        raise RuntimeError(f"trace produced no npz under {results_dir}")
    return npzs[-1]
