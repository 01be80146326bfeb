"""Persistent XLA/Mosaic compilation cache.

The trace kernels compile per (scene-chunk-count, tile) shape; cold
Mosaic compiles run minutes on TPU. Enabling JAX's persistent cache
makes every subsequent process start warm (VERDICT r2 #7: compile time
is a product blocker). Call once, before the first jit execution —
bench.py, apps/render.py and the benchmarks all do.
"""

from __future__ import annotations

import os


def _host_tag() -> str:
    """Short fingerprint of the host CPU's ISA features.

    XLA:CPU caches AOT-compiled executables whose machine features must
    match the executing host; this environment schedules sessions onto
    heterogeneous hosts, and loading another host generation's cache
    entry first warned ("+prefer-no-scatter is not supported ... could
    lead to SIGILL") and then segfaulted inside cache deserialization.
    Partitioning the cache directory by CPU-flag hash keeps every entry
    host-compatible."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        " ".join(sorted(line.split()[2:]))
                        .encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path`.

    Default location: $NEXUS_CACHE_DIR, else
    ~/.cache/nexus_tpu/jax-<cpu-fingerprint> (see _host_tag).
    Returns the directory used. Safe to call repeatedly.
    """
    import jax

    if path is None:
        path = os.environ.get("NEXUS_CACHE_DIR")
    if path is None and os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # Caching was requested via the JAX env var: keep the user's
        # location but partition it by host fingerprint (the raw dir
        # would mix ISA-incompatible XLA:CPU entries across hosts).
        path = os.path.join(os.environ["JAX_COMPILATION_CACHE_DIR"],
                            f"host-{_host_tag()}")
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "nexus_tpu", f"jax-{_host_tag()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Do NOT persist XLA's embedded per-kernel AOT caches: on CPU they
    # are ISA-specific, this environment schedules sessions onto
    # heterogeneous hosts, and deserializing another host generation's
    # kernel cache first warns ("+prefer-no-scatter is not supported
    # ... could lead to SIGILL", cpu_aot_loader.cc) and then segfaults
    # inside the cache read. The jax-level executable cache alone still
    # gives the warm-start win (verified cross-process).
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    return path
