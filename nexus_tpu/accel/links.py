"""Per-octant skip links (threaded BVH) — the TPU-native traversal layout.

The reference traverses with a per-thread stack and warp-wide dynamic
scheduling (Nexus/src/Cuda/BVH/BVH8Traversal.cuh) — mechanisms a TPU has
no analog for: per-lane dynamic stack indexing lowers to one-hot
selects over the whole stack (O(R·depth) HBM traffic per pop, measured
~30x slower than the node math itself). Instead we THREAD the tree:

  hit_link[o, n]  : next node when n's box is hit (internal: near child
                    in ray-octant order o; leaf: == miss_link)
  miss_link[o, n] : next node when n's box is missed / n is done
                    (far sibling, or the skip target of the nearest
                    ancestor that was a near child; -1 = traversal done)

Per-lane traversal state is then ONE int. Eight link tables (one per
ray-direction octant) keep near-child-first ordering — the same
front-to-back property the reference gets from its ordered stack pushes
(BVH2Traversal.cuh:29-44) — so t_best pruning stays effective.

Links are a pure function of the tree topology + per-node child order;
child order for octant o compares child box centers along the split
axis (taken as the axis of largest center separation) against the sign
bit of o on that axis.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SkipLinks:
    """(8, M) int32 link tables; row o = ray-direction octant
    (bit k of o set ⇔ direction[k] < 0)."""
    hit: np.ndarray
    miss: np.ndarray


def octant_of(direction: np.ndarray) -> np.ndarray:
    """3-bit octant code of (..., 3) directions (BVH8Traversal.cuh:24)."""
    neg = direction < 0
    return (neg[..., 0].astype(np.int32)
            | (neg[..., 1].astype(np.int32) << 1)
            | (neg[..., 2].astype(np.int32) << 2))


def build_links(bmin: np.ndarray, bmax: np.ndarray,
                left_first: np.ndarray, count: np.ndarray) -> SkipLinks:
    """Build per-octant hit/miss links for a BVH2 node array.

    Node encoding as accel/bvh2.BVH2 (children = left, left+1; children
    always have larger indices than their parent, so one increasing-index
    pass resolves the miss-link dependency chain).
    """
    m = left_first.shape[0]

    # Native path (native/nexus_native.cpp — identical output,
    # tests/test_native.py); the NumPy code below is the fallback spec.
    from nexus_tpu import native

    res = native.build_links(bmin, bmax, left_first, count)
    if res is not None:
        return SkipLinks(hit=res[0], miss=res[1])

    center = 0.5 * (bmin + bmax)
    is_int = count == 0
    hit = np.empty((8, m), np.int32)
    miss = np.empty((8, m), np.int32)

    internal = np.nonzero(is_int)[0]
    left = left_first[internal]
    # Split axis ≈ axis of largest child-center separation.
    sep = np.abs(center[left + 1] - center[left])  # (K, 3)
    axis = np.argmax(sep, axis=-1)
    left_is_lo = center[left, axis] <= center[left + 1, axis]

    for o in range(8):
        dir_pos = ((o >> axis) & 1) == 0  # octant sign on the split axis
        near_is_left = left_is_lo == dir_pos
        near = np.where(near_is_left, left, left + 1).astype(np.int32)
        far = np.where(near_is_left, left + 1, left).astype(np.int32)

        h = np.full(m, -1, np.int32)
        ms = np.full(m, -1, np.int32)
        h[internal] = near
        # miss[near] = far (no dependency); miss[far] = miss[parent]
        # (parents first = increasing index order).
        ms[near] = far
        ms[0] = -1
        for idx in range(internal.shape[0]):
            n = internal[idx]
            ms[far[idx]] = ms[n]
        # Leaves: "hit" just means the box test passed and the triangles
        # get tested this step; next is always the miss link.
        leaf = ~is_int
        h[leaf] = ms[leaf]
        hit[o] = h
        miss[o] = ms
    return SkipLinks(hit=hit, miss=miss)
