"""Persistent XLA compilation cache.

The reference pays its CUDA-kernel JIT costs once per process too, but our
XLA compiles are the dominant restart cost (~20-40 min of recurring compiles
per fresh full-scale process on the contended single-core host — see
docs/runlog_fullscale.md). Pointing jax's persistent cache at a stable
directory makes every re-run of the same program shapes a disk hit instead.

Call enable_compile_cache() before the first jit dispatch (train.py, test.py,
bench.py and the measurement scripts all do).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "MULTIPLY_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/multiply_tpu_xla")
)


def enable_compile_cache(path: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache at `path` (best-effort:
    some backends/plugins don't support serialized executables; failures
    only cost us the cache, never the run). Set MULTIPLY_TPU_NO_COMPILE_CACHE=1
    to opt out (e.g. if a remote-compile backend serializes slowly)."""
    import jax

    if os.environ.get("MULTIPLY_TPU_NO_COMPILE_CACHE"):
        return None
    path = path or DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # full-scale graphs take minutes; cache even quick ones (tests reuse
        # tiny configs across processes)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - depends on jax build
        print(f"compile cache unavailable: {e}")
        return None
    return path
