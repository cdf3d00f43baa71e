"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding logic is validated on a fake CPU mesh
(`--xla_force_host_platform_device_count=8`), per the multi-host test
strategy in SURVEY.md §4.

Note: this environment's sitecustomize registers an `axon` TPU backend and
*overwrites* `jax_platforms` at interpreter start, so setting the
JAX_PLATFORMS env var is not enough — we must update the config after
importing jax (before any backend is touched).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
