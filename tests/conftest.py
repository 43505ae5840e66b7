"""Test configuration: run on CPU with a virtual 8-device mesh.

Sharding tests need multiple devices; real TPU hardware is single-chip in CI,
so we force the CPU platform with 8 virtual devices before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session presets axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU backend and overrides
# jax_platforms via jax.config — env vars alone don't win. Force CPU here,
# before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
