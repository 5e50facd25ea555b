"""Persistent XLA compilation cache for CLI entry points.

First-compile of the fused train step via the remote-compile path costs
minutes; caching to disk makes repeat CLI invocations start in seconds.
Enabled by every script; JAX_COMPILATION_CACHE_DIR overrides the location.
"""

from __future__ import annotations

import os


def _cpu_fingerprint() -> str:
    """Short digest of this host's CPU feature set.

    XLA:CPU cache entries are AOT machine code specialized to the compiling
    host's CPU features; loading an entry compiled on a machine with a
    different feature set warns 'could lead to execution errors such as
    SIGILL' (observed when a home directory travels between hosts). The
    cache key does NOT include the features, so partition the cache dir by
    them instead. TPU entries recompile once per distinct host — cheap next
    to a poisoned-cache crash.
    """
    import hashlib
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform
        flags = platform.machine() + platform.processor()
    return hashlib.sha256(flags.encode()).hexdigest()[:10]


def enable_compilation_cache() -> str:
    import jax
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     f"empose_tpu_xla-{_cpu_fingerprint()}"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


_SYNC_FORCED = False


def force_synchronous_dispatch() -> None:
    """Flip the tunneled-TPU runtime into its synchronous dispatch mode, NOW.

    The remote (axon/IFRT-proxy) runtime in this environment has two dispatch
    modes. Before the process's FIRST device->host transfer, dispatches only
    enqueue: ``jax.block_until_ready`` returns without actually waiting, and
    chained executions materialize pathologically slowly at the eventual
    readback (measured: a chain of 3 small matmuls took 62 s to read back;
    the same chain takes 94 ms after the flip). The first d2h transfer
    permanently flips the process into the synchronous mode, where semantics
    and throughput are correct: dispatches and device_put uploads still
    enqueue cheaply (~0.01 ms) and pipeline, but every SYNC (block_until_
    ready on pending work, jnp.asarray upload, d2h readback) costs one
    tunnel round-trip — measured anywhere from ~1.4 to ~24 ms depending on
    tunnel conditions. Hot loops therefore sync once per chunk at most.

    Every CLI calls this right after backend/platform selection so the flip
    happens deterministically at startup instead of at an arbitrary first
    readback mid-run (and so timing loops never measure the broken deferred
    mode). Initializes the default backend as a side effect — call it AFTER
    any jax.config platform forcing. No-op after the first call; escape
    hatch: EMPOSE_DEFERRED_DISPATCH=1.
    """
    global _SYNC_FORCED
    if _SYNC_FORCED or os.environ.get("EMPOSE_DEFERRED_DISPATCH"):
        return
    import jax
    import jax.numpy as jnp
    import numpy as np
    # A computed (not host-uploaded) scalar: its readback is a real d2h.
    np.asarray(jnp.zeros(()) + 0.0)
    _SYNC_FORCED = True
