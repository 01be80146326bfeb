"""CWBVH (compressed 8-wide BVH) builder — Ylitie et al. 2017 collapse.

Replaces Nexus/src/Geometry/BVH/BVH8Builder.{h,cpp} + BVH8.{h,cpp}. The
algorithm is the same SAH-optimal collapse of a leaf-size-1 BVH2
(decisions LEAF / INTERNAL / DISTRIBUTE over (node, rootCount) with cost
constants C_PRIM=0.3, C_NODE=1, P_MAX=3, N_Q=8 — BVH8.h:18-21), but the
implementation is array-first, not a port:

  - the DP runs BOTTOM-UP over depth levels, vectorized with numpy over
    all nodes of a level (the reference recurses with memoization,
    BVH8Builder.cpp:63-117 — infeasible in Python for 1M-tri scenes);
  - the output is an SoA arena designed for 8-wide vector traversal on
    the TPU VPU: quantized child boxes stay uint8 (HBM-light), but the
    reference's packed meta/imask bit tricks (BVH8.cuh:47-63, consumed
    with `prmt` byte ops) are unpacked into explicit child_offset /
    child_tri_count / child_is_internal lanes — no byte decoding in the
    hot loop, same information.

Child slots are octant-ordered by the same greedy min-cost assignment
(BVH8Builder.cpp:170-250 OrderChildren).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from nexus_tpu.accel import bvh2 as bvh2_mod

C_PRIM = 0.3    # per-triangle intersection cost (BVH8.h:18)
C_NODE = 1.0    # per-node traversal cost (BVH8.h:19)
P_MAX = 3       # max triangles per BVH8 leaf (BVH8.h:20)
N_Q = 8         # quantization bits (BVH8.h:21)

_LEAF, _INTERNAL, _DISTRIBUTE = 0, 1, 2
_INF = np.float32(1.0e30)


@dataclasses.dataclass
class BVH8:
    """SoA CWBVH arena. M nodes, N triangles, root = node 0."""
    p: np.ndarray                  # (M, 3) f32 quantization origin
    scale: np.ndarray              # (M, 3) f32 dequant factor 2^e
    child_base: np.ndarray         # (M,) i32 first internal-child node id
    tri_base: np.ndarray           # (M,) i32 base into tri_idx
    child_is_internal: np.ndarray  # (M, 8) bool
    child_offset: np.ndarray       # (M, 8) i32 node offset / tri offset; -1 empty
    child_tri_count: np.ndarray    # (M, 8) i32 (0 unless leaf child)
    qlo: np.ndarray                # (M, 8, 3) uint8
    qhi: np.ndarray                # (M, 8, 3) uint8
    tri_idx: np.ndarray            # (N,) i32 triangle permutation

    @property
    def node_count(self) -> int:
        return self.p.shape[0]

    @property
    def depth(self) -> int:
        """Max internal-node depth (root = 1), one forward pass (children
        always have larger arena indices)."""
        d = np.zeros(self.node_count, np.int32)
        d[0] = 1
        best = 1
        for n in range(self.node_count):
            for s in range(8):
                if self.child_is_internal[n, s]:
                    c = self.child_base[n] + self.child_offset[n, s]
                    d[c] = d[n] + 1
                    best = max(best, int(d[c]))
        return best


def build_from_bvh2(bvh: bvh2_mod.BVH2) -> BVH8:
    """Collapse a leaf-size-1 BVH2 into a CWBVH."""
    m = bvh.node_count
    left = bvh.left_first      # internal: left child; leaf: first tri slot
    count = bvh.count
    is_leaf = count > 0
    area = _half_area(bvh.bmin, bvh.bmax)

    # Subtree triangle counts (children have larger ids → reverse pass).
    tri_count = np.where(is_leaf, count, 0).astype(np.int64)
    for n in range(m - 1, -1, -1):
        if not is_leaf[n]:
            tri_count[n] = tri_count[left[n]] + tri_count[left[n] + 1]

    # ---- Cost DP, bottom-up by depth level ---------------------------
    depth = np.zeros(m, np.int32)
    for n in range(m):
        if not is_leaf[n]:
            depth[left[n]] = depth[left[n] + 1] = depth[n] + 1

    cost = np.full((m, 7), _INF, np.float32)
    decision = np.full((m, 7), _LEAF, np.int8)
    lcnt = np.zeros((m, 7), np.int8)    # left rootCount index on DISTRIBUTE
    rcnt = np.zeros((m, 7), np.int8)

    leaf_ids = np.nonzero(is_leaf)[0]
    # BVH2 leaves hold 1 triangle (force_leaf_one) → always collapsible.
    cost[leaf_ids, :] = (area[leaf_ids] * count[leaf_ids]
                         * C_PRIM)[:, None]

    order = np.argsort(-depth, kind="stable")
    order = order[~is_leaf[order]]
    # Process per level so numpy ops batch over many nodes.
    lvl_of = depth[order]
    for lvl in np.unique(lvl_of)[::-1]:
        ns = order[lvl_of == lvl]
        l = left[ns]
        cl = cost[l]               # (K, 7)
        cr = cost[l + 1]           # (K, 7)
        # dist[j] = min_k cl[k] + cr[j-1-k], j = 1..7  (k = 0..j-1)
        K = ns.shape[0]
        dist = np.full((K, 8), _INF, np.float32)
        dist_k = np.zeros((K, 8), np.int8)
        for j in range(1, 8):
            cand = np.stack([cl[:, k] + cr[:, j - 1 - k]
                             for k in range(j)], axis=1)   # (K, j)
            kbest = np.argmin(cand, axis=1)
            dist[:, j] = cand[np.arange(K), kbest]
            dist_k[:, j] = kbest
        a = area[ns]
        c_leaf = np.where(tri_count[ns] <= P_MAX,
                          a * tri_count[ns] * C_PRIM, _INF)
        c_int = dist[:, 7] + a * C_NODE
        # i = 0: LEAF vs INTERNAL (with 7-way distribute inside).
        pick_leaf = c_leaf < c_int
        cost[ns, 0] = np.where(pick_leaf, c_leaf, c_int)
        decision[ns, 0] = np.where(pick_leaf, _LEAF, _INTERNAL)
        lcnt[ns, 0] = np.where(pick_leaf, 0, dist_k[:, 7])
        rcnt[ns, 0] = np.where(pick_leaf, 0, 6 - dist_k[:, 7])
        # i = 1..6: DISTRIBUTE(i) vs carry cost[i-1].
        for i in range(1, 7):
            c_dist = dist[:, i]
            fewer = cost[ns, i - 1]
            pick_d = c_dist < fewer
            cost[ns, i] = np.where(pick_d, c_dist, fewer)
            decision[ns, i] = np.where(pick_d, _DISTRIBUTE,
                                       decision[ns, i - 1])
            lcnt[ns, i] = np.where(pick_d, dist_k[:, i], lcnt[ns, i - 1])
            rcnt[ns, i] = np.where(pick_d, i - 1 - dist_k[:, i],
                                   rcnt[ns, i - 1])

    # ---- Collapse (explicit work stack; reference recursion at
    #      BVH8Builder.cpp:273-393) -----------------------------------
    n_tris = bvh.tri_order.shape[0]
    est = max(m, 1)
    out = _Arena(est, n_tris)

    def children_of(n2: int, i: int, acc: list):
        """Flatten DISTRIBUTE decisions into ≤8 children
        (GetChildrenIndices, BVH8Builder.cpp:137-168)."""
        if decision[n2][i] == _LEAF:
            acc.append(n2)
            return
        lc, rc = lcnt[n2][i], rcnt[n2][i]
        l = left[n2]
        if decision[l][lc] == _DISTRIBUTE:
            children_of(l, lc, acc)
        else:
            acc.append(l)
        if decision[l + 1][rc] == _DISTRIBUTE:
            children_of(l + 1, rc, acc)
        else:
            acc.append(l + 1)

    def emit_tris(n2: int) -> int:
        """Append the subtree's triangles to tri_idx (CountTriangles,
        BVH8Builder.cpp:256-271); returns count."""
        total = 0
        stack = [n2]
        while stack:
            n = stack.pop()
            if is_leaf[n]:
                f, c = left[n], count[n]
                out.tri_idx[out.used_tris:out.used_tris + c] = \
                    bvh.tri_order[f:f + c]
                out.used_tris += c
                total += c
            else:
                stack.append(left[n] + 1)
                stack.append(left[n])
        return total

    out.used_nodes = 1
    work = [(0, 0)]   # (bvh2 node, bvh8 slot)
    while work:
        n2, slot = work.pop()
        node_bmin = bvh.bmin[n2]
        node_bmax = bvh.bmax[n2]

        acc: list = []
        children_of(n2, 0, acc)
        assert 1 <= len(acc) <= 8
        slots = _order_children(bvh, n2, acc)

        denom = 1.0 / ((1 << N_Q) - 1)
        ext = np.maximum(node_bmax - node_bmin, 1e-20)
        e = np.ceil(np.log2(ext * denom))
        scale = np.exp2(e).astype(np.float32)

        out.p[slot] = node_bmin
        out.scale[slot] = scale
        out.child_base[slot] = out.used_nodes
        out.tri_base[slot] = out.used_tris

        # First pass: count internal children (child_base contiguity).
        internal_children = [c for c in slots if c is not None
                             and decision[c][0] == _INTERNAL]
        n_internal = len(internal_children)
        out.used_nodes += n_internal
        out.ensure(out.used_nodes)

        child_node_offset = 0
        tri_offset = 0
        for s8 in range(8):
            c = slots[s8]
            if c is None:
                out.child_offset[slot, s8] = -1
                continue
            qlo = np.floor((bvh.bmin[c] - node_bmin) / scale)
            qhi = np.ceil((bvh.bmax[c] - node_bmin) / scale)
            out.qlo[slot, s8] = np.clip(qlo, 0, 255).astype(np.uint8)
            out.qhi[slot, s8] = np.clip(qhi, 0, 255).astype(np.uint8)
            if decision[c][0] == _INTERNAL:
                out.child_is_internal[slot, s8] = True
                out.child_offset[slot, s8] = child_node_offset
                work.append((c, out.child_base[slot] + child_node_offset))
                child_node_offset += 1
            else:
                nt = emit_tris(c)
                assert nt <= P_MAX
                out.child_offset[slot, s8] = tri_offset
                out.child_tri_count[slot, s8] = nt
                tri_offset += nt

    return out.freeze()


def _half_area(bmin, bmax):
    e = np.maximum(bmax - bmin, 0.0)
    return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] \
        + e[..., 2] * e[..., 0]


def _order_children(bvh, parent: int, acc: list) -> list:
    """Greedy octant assignment (OrderChildren, BVH8Builder.cpp:170-250).

    Returns an 8-slot list (None = empty) where child c sits in the slot
    s minimizing dot(centroid_c - centroid_parent, octant_dir_s).
    """
    pc = (bvh.bmin[parent] + bvh.bmax[parent]) * 0.5
    dirs = np.array([[1 if not (s & 4) else -1,
                      1 if not (s & 2) else -1,
                      1 if not (s & 1) else -1] for s in range(8)],
                    np.float32)
    cent = (bvh.bmin[acc] + bvh.bmax[acc]) * 0.5 - pc   # (C, 3)
    cost = cent @ dirs.T                                 # (C, 8)

    slots: list = [None] * 8
    assigned = np.zeros(len(acc), bool)
    used = np.zeros(8, bool)
    for _ in range(len(acc)):
        masked = np.where(assigned[:, None] | used[None, :], np.inf, cost)
        c, s = np.unravel_index(np.argmin(masked), masked.shape)
        slots[s] = acc[c]
        assigned[c] = True
        used[s] = True
    return slots


class _Arena:
    def __init__(self, cap: int, n_tris: int):
        self.cap = cap
        self.p = np.zeros((cap, 3), np.float32)
        self.scale = np.ones((cap, 3), np.float32)
        self.child_base = np.zeros(cap, np.int32)
        self.tri_base = np.zeros(cap, np.int32)
        self.child_is_internal = np.zeros((cap, 8), bool)
        self.child_offset = np.full((cap, 8), -1, np.int32)
        self.child_tri_count = np.zeros((cap, 8), np.int32)
        self.qlo = np.zeros((cap, 8, 3), np.uint8)
        self.qhi = np.zeros((cap, 8, 3), np.uint8)
        self.tri_idx = np.zeros(n_tris, np.int32)
        self.used_nodes = 0
        self.used_tris = 0

    def ensure(self, n):
        while n > self.cap:
            self.cap *= 2
            for name in ("p", "scale", "child_base", "tri_base",
                         "child_is_internal", "child_offset",
                         "child_tri_count", "qlo", "qhi"):
                old = getattr(self, name)
                new = np.zeros((self.cap,) + old.shape[1:], old.dtype)
                if name == "child_offset":
                    new[...] = -1
                elif name == "scale":
                    new[...] = 1.0
                new[:old.shape[0]] = old
                setattr(self, name, new)

    def freeze(self) -> BVH8:
        n = self.used_nodes
        assert self.used_tris == self.tri_idx.shape[0], \
            (self.used_tris, self.tri_idx.shape)
        return BVH8(
            p=self.p[:n].copy(), scale=self.scale[:n].copy(),
            child_base=self.child_base[:n].copy(),
            tri_base=self.tri_base[:n].copy(),
            child_is_internal=self.child_is_internal[:n].copy(),
            child_offset=self.child_offset[:n].copy(),
            child_tri_count=self.child_tri_count[:n].copy(),
            qlo=self.qlo[:n].copy(), qhi=self.qhi[:n].copy(),
            tri_idx=self.tri_idx)


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> BVH8:
    """Full pipeline: leaf-1 binned-SAH BVH2 → CWBVH collapse."""
    bvh = bvh2_mod.build(v0, v1, v2, force_leaf_one=True)
    return build_from_bvh2(bvh)


def validate(bvh8: BVH8, v0, v1, v2) -> None:
    """Structural invariants: every triangle exactly once; dequantized
    child boxes contain the true child geometry."""
    seen = np.sort(bvh8.tri_idx)
    assert (seen == np.arange(v0.shape[0])).all(), "tri permutation broken"

    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    for n in range(bvh8.node_count):
        for s in range(8):
            off = bvh8.child_offset[n, s]
            if off < 0 or bvh8.child_is_internal[n, s]:
                continue
            lo = bvh8.p[n] + bvh8.qlo[n, s].astype(np.float32) * bvh8.scale[n]
            hi = bvh8.p[n] + bvh8.qhi[n, s].astype(np.float32) * bvh8.scale[n]
            base = bvh8.tri_base[n] + off
            for t in range(bvh8.child_tri_count[n, s]):
                tri = bvh8.tri_idx[base + t]
                assert (tmin[tri] >= lo - 1e-3).all() and \
                       (tmax[tri] <= hi + 1e-3).all(), (n, s, tri)
