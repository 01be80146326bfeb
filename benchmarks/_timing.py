"""Shared device-timing discipline for all benchmarks.

Hard-won environment facts (measured; docs/perf.md):

1. `block_until_ready` DOES NOT RELIABLY BLOCK on the axon tunnel: in
   some process regimes it returns while kernels are still executing
   (measured: a 10-kernel chain "blocked" in 91 ms, then the readback
   of its result took another 114 ms). Round 3's committed scaling
   numbers (65k rays in 0.07 ms) and its "first readback permanently
   poisons dispatch" lore were BOTH this artifact — the readback never
   slowed anything (timed A/B: per-call time identical before and
   after readbacks); it merely forced honest synchronization where
   block-only timing was crediting queued-but-unexecuted work.
   => every timed region here ends with `_sync`: a one-element
   device readback, the only completion barrier that works.

2. PROCESS-LEVEL SPEED REGIMES: identical configs vary up to ~3x
   between processes (tunnel/host contention), so A/B comparisons are
   only valid INTERLEAVED in one process and absolutes need medians
   with dispersion. `interleave` does the round-robin; both helpers
   report min/median/max.

The per-sync round trip (~10-25 ms) is amortized over `reps` calls per
round and reported separately as `sync_ms` so its share is visible.
"""

from __future__ import annotations

import time


def _sync(out):
    """TRUE completion barrier: block, then read one element of one
    leaf back to host (device execution is in-order, so this waits for
    everything previously dispatched)."""
    import jax
    import numpy as np

    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def measure_sync_overhead(rounds: int = 5) -> float:
    """Median ms of a dispatch+readback round trip on a tiny op — the
    fixed cost `_sync` adds to each timed round."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((8, 128))
    _sync(f(x))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _sync(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2] * 1e3, 2)


def timed(fn, reps: int = 10, rounds: int = 5, warmup: bool = True):
    """Time fn() on-device: `rounds` loops of `reps` calls, each round
    closed by `_sync` on the last result. Returns ms-per-call stats:
    {min, median, max, reps, rounds, sync_ms}."""
    if warmup:
        _sync(fn())
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        _sync(out)
        per.append((time.perf_counter() - t0) / reps)
    per.sort()
    return {"min": round(per[0] * 1e3, 4),
            "median": round(per[len(per) // 2] * 1e3, 4),
            "max": round(per[-1] * 1e3, 4),
            "reps": reps, "rounds": rounds,
            "sync_ms": measure_sync_overhead()}


def interleave(cases: dict, reps=10, rounds=5):
    """Time a dict name -> thunk with round-robin interleaving (the only
    valid A/B on this environment). Returns name -> stats as in
    `timed`."""
    for fn in cases.values():          # warm everything first
        _sync(fn())
    acc = {k: [] for k in cases}
    for _ in range(rounds):
        for k, fn in cases.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn()
            _sync(out)
            acc[k].append((time.perf_counter() - t0) / reps)
    sync_ms = measure_sync_overhead()
    out = {}
    for k, per in acc.items():
        per.sort()
        out[k] = {"min": round(per[0] * 1e3, 4),
                  "median": round(per[len(per) // 2] * 1e3, 4),
                  "max": round(per[-1] * 1e3, 4),
                  "reps": reps, "rounds": rounds, "sync_ms": sync_ms}
    return out
