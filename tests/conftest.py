"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated the standard JAX way — host CPU
platform with --xla_force_host_platform_device_count (SURVEY.md §4) —
so tests are deterministic and don't need a real TPU slice.
"""

import os

# NOTE: sitecustomize imports jax (axon TPU plugin) before this file runs,
# so env vars alone are too late — use jax.config.update as well. Without
# this, "CPU" tests silently dispatch every eager op over the TPU tunnel
# at ~0.4 s RTT each.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/pct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
