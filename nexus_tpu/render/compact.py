"""Trace-queue compaction: dense ray tiles for the Pallas kernels.

The reference's wavefront routes rays through GLOBAL compacted queues so
every kernel launch covers exactly the live work items
(Nexus/src/Cuda/PathTracer/PathTracer.cu:302-306 — shadow rays are
appended to a queue via atomic slots and traced densely). The round-4
stage timings showed what skipping that costs on TPU: the interior
bounce-1 shadow pass spent 60 ms tracing 11,160 live rays spread over
512 fixed 128-lane tiles (17% occupancy) — ~83%-dead tiles still ran
their slab passes and block pops at 5.4 µs/ray vs 2.2 µs/ray for the
dense closest queue (benchmarks/results/stage_timings_r04_interior_b1).

This module is the TPU re-expression of that queue: a STABLE partition
that packs live rays into the head of the lane array so the Pallas
kernel's fixed 128-lane tiles are dense, while all-dead tail tiles
early-exit after one parent slab pass (kernels/trace_hbm.py `_traverse`
finds nothing alive). Three properties make it affordable where the
round-3/4 full-pytree permutes (`sort_lanes`, `park_dead_min_tris`)
were not:

  1. Only the KERNEL-FACING columns move (origin, direction, t_max —
     7 floats), not the 20+-array path-state pytree; results are
     scattered back through the same index map.
  2. The index map is a cumsum + one scatter (`_compact_src`), not an
     argsort — no O(log^2 R) bitonic passes.
  3. The partition is stable, so live lanes keep their relative Z-order
     (core/zorder.py) and tile spatial coherence survives compaction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nexus_tpu.kernels.trace_hbm import TILE_R

_PARK_ORIGIN = 1.0e30  # matches trace_hbm._pack_rays invalid threshold

# Occupancy gate for the adaptive wrappers: compacting costs a fixed
# ~3-6 ms of index maps + payload moves per 65k-lane queue, and only
# pays when enough whole tiles go dead. Measured (docs/perf.md r5): at
# 96% occupancy compaction is pure loss (-4%); at 17% it is 1.6x. The
# per-bounce occupancy trace shows every queue except closest-hit
# bounce 0-1 sits below ~0.6 by bounce 1, so a 0.85 threshold routes
# exactly the dense early bounces to the direct path.
ALIVE_THRESH = 0.85


def compact_src(live: jnp.ndarray):
    """Stable-partition index maps for a (R,) bool live mask.

    Returns (src, pos):
      src: (R,) int32 — src[j] = source lane of dense slot j for
           j < n_live (live lanes in original order), -1 beyond;
      pos: (R,) int32 — pos[i] = dense slot of lane i (valid where
           live[i]; arbitrary elsewhere).
    """
    r = live.shape[0]
    pos = jnp.cumsum(live.astype(jnp.int32)) - 1
    dest = jnp.where(live, pos, r)  # dead lanes scatter out of bounds
    # No unique_indices promise: every dead lane shares the duplicate
    # out-of-bounds index r, and the contract leaves duplicate-promised
    # scatters undefined — mode="drop" alone is what discards them.
    src = jnp.full((r,), -1, jnp.int32).at[dest].set(
        jnp.arange(r, dtype=jnp.int32), mode="drop")
    return src, pos


def compacted_any_hit(any_hit_fn, ray_o, ray_d, t_max, live):
    """Occlusion-test only the live lanes, densely packed — the
    always-compact entry point. Thin alias over `adaptive_any_hit`
    with the occupancy gate pinned past 1 (ONE implementation of the
    pack/trace/scatter-back logic; the adaptive branches are what
    production ships through scene/view.py). Returns the full-width
    occlusion mask (False where dead)."""
    return adaptive_any_hit(any_hit_fn, ray_o, ray_d, t_max, live,
                            thresh=1.001)


def compacted_closest_hit(closest_fn, ray_o, ray_d, live):
    """Closest-hit only the live lanes, densely packed (alias over
    `adaptive_closest_hit`, gate pinned past 1 — see
    compacted_any_hit). Returns full-width (t, tri, inst) with
    t = +1e30, tri = -1, inst = 0 on dead lanes."""
    return adaptive_closest_hit(closest_fn, ray_o, ray_d, live,
                                thresh=1.001)


# Sliced-launch bucket: when the compacted queue fits in R/_BUCKET_DIV
# lanes, only that prefix is fed to the kernel (static slice per
# lax.switch branch) — the all-dead tail tiles' pass-through floor
# (~11 us/tile: grid step + ray DMA + parent slab + early exit;
# docs/perf.md round 5) disappears instead of being merely cheap.
# One extra kernel grid size per queue; requires R % (TILE_R *
# _BUCKET_DIV) == 0 (65k-lane production chunks qualify).
_BUCKET_DIV = 4
_BUCKET_ALIGN = TILE_R * _BUCKET_DIV


def _route(live, thresh):
    """0 = direct (dense), 1 = compacted full-width, 2 = compacted
    sliced to R // _BUCKET_DIV."""
    r = live.shape[0]
    nl = jnp.sum(live.astype(jnp.int32))
    # Float compare: int32(thresh * r) truncates, so a thresh pinned
    # past 1 (the always-compact entry points) would still route a
    # fully-live queue direct whenever int(thresh*r) == r.
    idx = jnp.where(nl.astype(jnp.float32) >= thresh * r, 0, 1)
    if r % _BUCKET_ALIGN == 0:
        idx = jnp.where((idx == 1) & (nl <= r // _BUCKET_DIV), 2, idx)
    return idx


def adaptive_any_hit(any_hit_fn, ray_o, ray_d, t_max, live,
                     thresh=ALIVE_THRESH):
    """Occlusion test that compacts only when the queue is sparse
    enough to pay for the index maps (`ALIVE_THRESH`), and shrinks the
    kernel launch to R/_BUCKET_DIV lanes when the live set fits (see
    _route); dense queues run direct with dead lanes' t_max zeroed.
    Every branch returns final lane-ordered results, so the dense path
    pays nothing for the maps. The predicate is the live count, so the
    choice adapts per bounce inside the fused sample."""
    r = live.shape[0]

    def compacted(width):
        def f():
            src, pos = compact_src(live)
            # Slice the index map BEFORE gathering: the per-index
            # gather cost is serial (core/gather.py), so the sliced
            # branch must gather width indices, not all r.
            src_w = src[:width]
            srcc = jnp.maximum(src_w, 0)
            hit_c = any_hit_fn(
                ray_o[srcc], ray_d[srcc],
                jnp.where(src_w >= 0, t_max[srcc], 0.0))
            hit = jnp.pad(hit_c, (0, r - width))
            return live & hit[jnp.where(live, pos, 0)]
        return f

    branches = [
        lambda: live & any_hit_fn(ray_o, ray_d,
                                  jnp.where(live, t_max, 0.0)),
        compacted(r),
    ]
    if r % _BUCKET_ALIGN == 0:
        branches.append(compacted(r // _BUCKET_DIV))
    return jax.lax.switch(_route(live, thresh), branches)


def adaptive_closest_hit(closest_fn, ray_o, ray_d, live,
                         thresh=ALIVE_THRESH):
    """Closest hit with occupancy-gated compaction + sliced launches
    (see adaptive_any_hit); the dense path parks dead lanes at +1e30
    so the kernel marks them invalid."""
    r = live.shape[0]

    def compacted(width):
        def f():
            src, pos = compact_src(live)
            src_w = src[:width]          # slice map BEFORE gathering
            srcc = jnp.maximum(src_w, 0)
            ok = (src_w >= 0)[:, None]
            o_c = jnp.where(ok, ray_o[srcc], _PARK_ORIGIN)
            d_c = jnp.where(ok, ray_d[srcc], 1.0)
            t_c, tri_c, inst_c = closest_fn(o_c, d_c)
            t_c = jnp.pad(t_c, (0, r - width),
                          constant_values=_PARK_ORIGIN)
            tri_c = jnp.pad(tri_c, (0, r - width), constant_values=-1)
            inst_c = jnp.pad(inst_c, (0, r - width))
            back = jnp.where(live, pos, 0)
            return (jnp.where(live, t_c[back], _PARK_ORIGIN),
                    jnp.where(live, tri_c[back], -1),
                    jnp.where(live, inst_c[back], 0))
        return f

    def direct():
        t, tri, inst = closest_fn(
            jnp.where(live[:, None], ray_o, _PARK_ORIGIN),
            jnp.where(live[:, None], ray_d, 1.0))
        return (jnp.where(live, t, _PARK_ORIGIN),
                jnp.where(live, tri, -1),
                jnp.where(live, inst, 0))

    branches = [direct, compacted(r)]
    if r % _BUCKET_ALIGN == 0:
        branches.append(compacted(r // _BUCKET_DIV))
    return jax.lax.switch(_route(live, thresh), branches)
