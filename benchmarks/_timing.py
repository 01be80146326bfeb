"""Shared device-timing discipline for all benchmarks.

Two environment facts shape this module (measured; docs/perf.md):

1. READBACK POISON: the first device-to-host readback in a process
   permanently switches the axon tunnel client into a slow dispatch
   mode (~16 ms/call). Benchmarks must do ALL timed loops before ANY
   readback; callers of `timed` must defer readbacks to the end.

2. PROCESS-LEVEL SPEED REGIMES: identical configs measured in
   different processes vary by up to 3x (tunnel/host contention) —
   cross-process absolute numbers are only comparable as medians over
   several processes, and A/B comparisons are only valid when the
   variants are INTERLEAVED in one process. `interleave` does that:
   round-robin over the variants several times, reporting per-variant
   min/median/max across rounds.
"""

from __future__ import annotations

import time


def timed(fn, reps: int = 10, rounds: int = 5, warmup: bool = True):
    """Time fn() on-device: `rounds` loops of `reps` calls, blocking on
    the last result of each loop (device executes in order, so the
    block covers the whole loop). Returns stats in ms per call:
    {min, median, max, reps, rounds}. min is the least-contended
    estimate; median-max spread is the contention band."""
    import jax

    if warmup:
        jax.block_until_ready(fn())
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        per.append((time.perf_counter() - t0) / reps)
    per.sort()
    return {"min": round(per[0] * 1e3, 4),
            "median": round(per[len(per) // 2] * 1e3, 4),
            "max": round(per[-1] * 1e3, 4),
            "reps": reps, "rounds": rounds}


def interleave(cases: dict, reps=10, rounds=5):
    """Time a dict name -> thunk with round-robin interleaving (the only
    valid A/B on this environment). Returns name -> stats as in
    `timed`."""
    import jax

    for fn in cases.values():          # warm everything first
        jax.block_until_ready(fn())
    acc = {k: [] for k in cases}
    for _ in range(rounds):
        for k, fn in cases.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn()
            jax.block_until_ready(out)
            acc[k].append((time.perf_counter() - t0) / reps)
    out = {}
    for k, per in acc.items():
        per.sort()
        out[k] = {"min": round(per[0] * 1e3, 4),
                  "median": round(per[len(per) // 2] * 1e3, 4),
                  "max": round(per[-1] * 1e3, 4),
                  "reps": reps, "rounds": rounds}
    return out
