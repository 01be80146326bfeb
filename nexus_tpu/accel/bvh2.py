"""BVH2 builder: binned SAH over triangle centroids.

Host-side builder replacing Nexus/src/Geometry/BVH/BVH.{h,cpp} (binned SAH
with BINS=8, BVH.h:15). Differences by design:
  - vectorized NumPy per node (no per-triangle C++ loops),
  - array-encoded output (SoA node arrays, not linked structs) so the
    tree uploads to the device as four jnp arrays,
  - configurable leaf size. The reference forces leaf=1 purely to feed
    the BVH8 collapser (BVH.h:12-13); our standalone BVH2 uses a SAH
    leaf cutoff (SURVEY.md §8.13), and the CWBVH path requests leaf=1.

Node encoding (M nodes, root = node 0):
  bmin/bmax : (M, 3) float32 child bounds
  left_first: (M,)  int32 — internal: left child index (right = left+1);
                             leaf: first index into `tri_order`
  count     : (M,)  int32 — 0 for internal, >0 = leaf triangle count
  tri_order : (N,)  int32 — permutation mapping leaf slots → triangle ids
"""

from __future__ import annotations

import dataclasses

import numpy as np

BINS = 8  # SAH bin count (BVH.h:15)


@dataclasses.dataclass
class BVH2:
    bmin: np.ndarray
    bmax: np.ndarray
    left_first: np.ndarray
    count: np.ndarray
    tri_order: np.ndarray

    @property
    def node_count(self) -> int:
        return self.bmin.shape[0]

    @property
    def depth(self) -> int:
        """Maximum depth (root = 1), computed iteratively."""
        depth = np.zeros(self.node_count, np.int32)
        depth[0] = 1
        best = 1
        # Children always have larger indices, so one forward pass suffices.
        for i in range(self.node_count):
            if self.count[i] == 0:
                l = self.left_first[i]
                depth[l] = depth[l + 1] = depth[i] + 1
                best = max(best, int(depth[i]) + 1)
        return best


def _sah_half_area(bmin: np.ndarray, bmax: np.ndarray) -> np.ndarray:
    e = np.maximum(bmax - bmin, 0.0)
    return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
          leaf_size: int = 4, force_leaf_one: bool = False) -> BVH2:
    """Build a binned-SAH BVH2 over triangles (v0, v1, v2) of shape (N, 3).

    force_leaf_one replicates the reference's collapse-feeding mode
    (leaf = 1 triangle, SAH cutoff disabled — BVH.cpp:74-76, 86-88).
    """
    tri_min = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    tri_max = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    cent = ((v0 + v1 + v2) / 3.0).astype(np.float32)
    return build_from_aabbs(tri_min, tri_max, cent, leaf_size=leaf_size,
                            force_leaf_one=force_leaf_one)


def build_from_aabbs(tri_min: np.ndarray, tri_max: np.ndarray,
                     cent: np.ndarray, leaf_size: int = 4,
                     force_leaf_one: bool = False) -> BVH2:
    """Binned-SAH BVH2 over arbitrary primitive AABBs.

    Primitive-agnostic core of :func:`build`: the TLAS builder feeds it
    world-space *instance* bounds (the reference builds its TLAS over
    instance AABBs too, Nexus/src/Geometry/BVH/TLAS.cpp:13-91 — it uses
    agglomerative pairing there; we reuse the same binned SAH as the
    triangle BVH, which produces equal-or-better SAH trees and shares
    this tested code path).
    """
    n = tri_min.shape[0]
    assert n > 0, "empty primitive set"
    tri_min = np.asarray(tri_min, np.float32)
    tri_max = np.asarray(tri_max, np.float32)
    cent = np.asarray(cent, np.float32)

    # Native builder (native/nexus_native.cpp — identical algorithm,
    # required-identical output, tests/test_native.py); NumPy below is
    # the fallback and the executable spec.
    from nexus_tpu import native

    res = native.bvh2_build(tri_min, tri_max, cent, leaf_size,
                            force_leaf_one)
    if res is not None:
        bmin, bmax, left_first, count, order = res
        return BVH2(bmin=bmin, bmax=bmax, left_first=left_first,
                    count=count, tri_order=order)

    if force_leaf_one:
        leaf_size = 1

    # Worst case 2N-1 nodes (leaf=1); grow arrays up front.
    cap = max(2 * n, 16)
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    left_first = np.zeros(cap, np.int32)
    count = np.zeros(cap, np.int32)
    tri_order = np.arange(n, dtype=np.int32)

    # Root covers [0, n).
    bmin[0] = tri_min.min(axis=0)
    bmax[0] = tri_max.max(axis=0)
    left_first[0] = 0
    count[0] = n
    node_count = 1

    stack = [0]
    while stack:
        node = stack.pop()
        first, num = int(left_first[node]), int(count[node])
        if num <= leaf_size:
            continue
        ids = tri_order[first:first + num]
        c = cent[ids]
        nb_min, nb_max = bmin[node], bmax[node]

        axis, split_bin, cost = _find_best_split(c, tri_min[ids], tri_max[ids])
        if axis < 0:
            # All centroids identical: split in half
            # (BVH.cpp:40-63 SplitNodeInHalf fallback).
            mid = first + num // 2
        else:
            if not force_leaf_one:
                # SAH cutoff: don't split if a leaf is cheaper. The
                # reference disables this on purpose (BVH.cpp:86-88);
                # standalone BVH2 keeps it.
                leaf_cost = _sah_half_area(nb_min, nb_max) * num
                if cost >= leaf_cost and num <= 16:
                    continue
            cmin = c[:, axis].min()
            cmax = c[:, axis].max()
            scale = BINS / max(cmax - cmin, 1e-20)
            bin_ids = np.minimum(((c[:, axis] - cmin) * scale).astype(np.int32),
                                 BINS - 1)
            go_left = bin_ids < split_bin
            n_left = int(go_left.sum())
            if n_left == 0 or n_left == num:
                mid = first + num // 2
            else:
                order = np.argsort(~go_left, kind="stable")
                tri_order[first:first + num] = ids[order]
                mid = first + n_left

        left = node_count
        node_count += 2
        lids = tri_order[first:mid]
        rids = tri_order[mid:first + num]
        bmin[left] = tri_min[lids].min(axis=0)
        bmax[left] = tri_max[lids].max(axis=0)
        left_first[left] = first
        count[left] = mid - first
        bmin[left + 1] = tri_min[rids].min(axis=0)
        bmax[left + 1] = tri_max[rids].max(axis=0)
        left_first[left + 1] = mid
        count[left + 1] = first + num - mid
        left_first[node] = left
        count[node] = 0
        stack.append(left)
        stack.append(left + 1)

    return BVH2(bmin=bmin[:node_count].copy(), bmax=bmax[:node_count].copy(),
                left_first=left_first[:node_count].copy(),
                count=count[:node_count].copy(), tri_order=tri_order)


def _find_best_split(cent: np.ndarray, tmin: np.ndarray, tmax: np.ndarray):
    """Binned SAH over all 3 axes × BINS bins (BVH.cpp FindBestSplitPlane).

    Returns (axis, split_bin, cost) or (-1, -1, inf) when no axis has
    centroid extent.
    """
    best = (-1, -1, np.inf)
    for axis in range(3):
        cmin = cent[:, axis].min()
        cmax = cent[:, axis].max()
        if cmax - cmin < 1e-12:
            continue
        scale = BINS / (cmax - cmin)
        bin_ids = np.minimum(((cent[:, axis] - cmin) * scale).astype(np.int32),
                             BINS - 1)
        # Per-bin counts and bounds via scatter-min/max.
        bin_count = np.bincount(bin_ids, minlength=BINS)
        bin_min = np.full((BINS, 3), np.inf, np.float32)
        bin_max = np.full((BINS, 3), -np.inf, np.float32)
        np.minimum.at(bin_min, bin_ids, tmin)
        np.maximum.at(bin_max, bin_ids, tmax)
        # Sweep: prefix from the left, suffix from the right.
        lmin = np.minimum.accumulate(bin_min, axis=0)
        lmax = np.maximum.accumulate(bin_max, axis=0)
        rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
        rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
        lcount = np.cumsum(bin_count)
        rcount = num_total = bin_count.sum()
        rcount = num_total - lcount
        # Split after bin b → left bins [0..b], right bins [b+1..].
        la = _sah_half_area(lmin, lmax)
        ra = _sah_half_area(rmin, rmax)
        for b in range(BINS - 1):
            if lcount[b] == 0 or rcount[b] == 0:
                continue
            cost = la[b] * lcount[b] + ra[b + 1] * rcount[b]
            if cost < best[2]:
                best = (axis, b + 1, cost)
    return best
