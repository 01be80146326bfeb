"""Failure-detection utilities: NaN debug mode + finite assertions.

The reference's failure story is fail-fast CheckCudaErrors (print +
device reset + exit(99), Nexus/src/Utils/Utils.cpp:3-12) — errors
surface at the next API call, never silently. The TPU analog has two
tiers (SURVEY.md §5.3):

  1. `enable_nan_debug()` — the development mode: turns on
     `jax_debug_nans`, so ANY primitive producing a NaN under jit
     re-runs op-by-op and raises at the exact producer with a usable
     traceback (the compute-sanitizer analog; ~2x slower, opt-in).
     Also exposed as the env var NEXUS_DEBUG_NAN=1, honored by the CLI
     renderer and bench.
  2. `assert_finite(tree, what)` — the production guard: a cheap
     host-side check used at subsystem boundaries (render outputs,
     gradients, checkpoint loads) that raises a NonFiniteError naming
     the offending leaf. bench.py / apps/render.py already gate their
     outputs with it.
"""

from __future__ import annotations

import os


class NonFiniteError(RuntimeError):
    """A render/gradient output contained NaN or Inf."""


def enable_nan_debug(enable: bool = True) -> None:
    """Switch jax_debug_nans: NaNs raise at the producing op."""
    import jax

    jax.config.update("jax_debug_nans", bool(enable))


def maybe_enable_from_env() -> bool:
    """Honor NEXUS_DEBUG_NAN=1 (called by the CLI apps and bench)."""
    if os.environ.get("NEXUS_DEBUG_NAN"):
        enable_nan_debug(True)
        return True
    return False


def assert_finite(tree, what: str = "output") -> None:
    """Raise NonFiniteError naming the first non-finite float leaf."""
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and \
                not np.isfinite(arr).all():
            name = jax.tree_util.keystr(path) or "<leaf>"
            bad = int((~np.isfinite(arr)).sum())
            raise NonFiniteError(
                f"{what}: {bad} non-finite values in leaf {name} "
                f"(shape {arr.shape}); re-run with NEXUS_DEBUG_NAN=1 "
                f"to localize the producing op")
