"""Persistent XLA/Mosaic compilation cache.

The trace kernels compile per (scene-chunk-count, tile) shape; cold
Mosaic compiles run minutes on TPU. Enabling JAX's persistent cache
makes every subsequent process start warm (VERDICT r2 #7: compile time
is a product blocker). Call once, before the first jit execution —
bench.py, apps/render.py and the benchmarks all do.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path`.

    Default location: $NEXUS_CACHE_DIR, else ~/.cache/nexus_tpu/jax.
    Returns the directory used. Safe to call repeatedly.
    """
    import jax

    path = path or os.environ.get(
        "NEXUS_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "nexus_tpu", "jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
