"""Render configuration.

TPU-native analog of the reference's three config tiers (SURVEY.md §5.6):
compile-time constants and RenderSettings (Nexus/src/Renderer/RenderSettings.h:4-11)
collapse into one frozen dataclass whose fields are *static* under jit
(shapes / loop bounds) plus a small pytree of differentiable knobs.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static render settings — hashable, passed as a jit static argument.

    Mirrors D_RenderSettings (Nexus/src/Cuda/Scene/Scene.cuh:10-17):
    use_mis, path_length, background color/intensity; plus our own knobs.
    """
    width: int = 256
    height: int = 256
    path_length: int = 10          # max bounces (reference default 10)
    use_mis: bool = True
    background_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    background_intensity: float = 1.0
    # Ours: RR clamp (reference leaves probability unclamped —
    # PathTracer.cu:167 — which biases when throughput > 1; we clamp to 1
    # which is identical whenever max(throughput) <= 1).
    rr_start_bounce: int = 1
    # Fresnel parity: reproduce the reference's R_perp typo
    # (Nexus/src/Cuda/BSDF/Fresnel.cuh:28) when True.
    strict_fresnel_parity: bool = False
    # Sort lanes by (dead, octant) every bounce (the queue-compaction
    # analog of the reference's wavefront queues). Off by default: the
    # per-ray-culling trace kernel tolerates incoherent tiles (~25%
    # slower on fully random order) while one argsort + pytree permute
    # costs ~6.5 ms per 65k-lane bounce on v5e — it only pays off for
    # very large scenes with deep bounce trees.
    sort_lanes: bool = False
    # Dead-lane parking (wavefront integrator): per-bounce stable
    # partition of the FULL path-state pytree sinking dead lanes to the
    # tail. SUPERSEDED by compact_queues, which moves only the
    # kernel-facing ray columns: the round-5 10-bounce A/B
    # (benchmarks/ab_deep.py, docs/perf.md) measured a cornell deep
    # sample at 70.7 ms with compaction vs 222.5 ms with parking (the
    # r4 "pays at 8+ bounces" prediction was wrong — the pytree permute
    # dwarfs the parked-tail savings at every depth). Kept only for
    # A/B reproduction; leave 0.
    park_dead_min_tris: int = 0
    # Trace-queue compaction (render/compact.py): stable-partition pack
    # the live rays of each trace/shadow queue into dense 128-lane tiles
    # before the Pallas kernels, moving ONLY the kernel-facing columns
    # (o, d, t_max — not the path-state pytree). The TPU form of the
    # reference's wavefront queues (PathTracer.cu:302-306). Default on:
    # round-4 stage timings showed the interior shadow queue at 17%
    # occupancy paying 5.4 µs per LIVE ray; see docs/perf.md for the
    # round-5 A/B.
    compact_queues: bool = True
    # Rematerialized backward (jax.checkpoint on the bounce body with
    # save_only_these_names('trace')): the reverse pass recomputes the
    # cheap fusible shade math from the SAVED trace-kernel results
    # instead of stacking ~100 intermediates per bounce into scan
    # residuals — the top backward sink in the round-5 glass profile
    # (dynamic_update_slice/slice pairs, docs/perf.md). The trace
    # kernels themselves are never re-run (their outputs are the named
    # saves). Default set by measurement (benchmarks/ab_bwd.py).
    remat_bounce: bool = True

    def __post_init__(self):
        assert self.path_length >= 1
