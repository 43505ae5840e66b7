"""Metrics logging + profiling.

The reference logs every step's losses to wandb (multiply_model.py:207-211);
this build is dependency-free: JSONL metrics on disk (one line per log call,
trivially loadable into pandas/wandb later) plus an optional jax.profiler
trace flag — the first-class profiling hook the reference lacks (SURVEY §5).
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager


class MetricsLogger:
    def __init__(self, run_dir: str, filename: str = "metrics.jsonl", stdout_every: int = 0):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, filename)
        self._f = open(self.path, "a", buffering=1)
        self.stdout_every = stdout_every
        self._n = 0
        self._t0 = time.time()

    def log(self, metrics: dict, step: int | None = None, epoch: int | None = None) -> None:
        rec = {"t": round(time.time() - self._t0, 3)}
        if step is not None:
            rec["step"] = int(step)
        if epoch is not None:
            rec["epoch"] = int(epoch)
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")
        self._n += 1
        if self.stdout_every and self._n % self.stdout_every == 0:
            print(" ".join(f"{k}={v}" for k, v in rec.items()))

    def close(self) -> None:
        self._f.close()


@contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
