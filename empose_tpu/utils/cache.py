"""Persistent XLA compilation cache for CLI entry points.

First-compile of the fused train step via the remote-compile path costs
minutes; caching to disk makes repeat CLI invocations start in seconds.
Enabled by every script; JAX_COMPILATION_CACHE_DIR overrides the location.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str:
    import jax
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "empose_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
