"""Persistent XLA compilation cache setup.

First compile of the fused 1M pipeline costs minutes (tunneled TPU);
the persistent cache makes every later process start warm. Call once,
early. Safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get("PCT_TPU_JAX_CACHE",
                                  "/tmp/pct_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
