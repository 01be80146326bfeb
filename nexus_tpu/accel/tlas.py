"""Two-level TLAS/BLAS acceleration structure (host build + device arrays).

TPU-native replacement for the reference's instancing stack:
  - BLAS = one BVH2 per mesh asset over OBJECT-space triangles
    (Nexus/src/Assets/AssetManager.cpp:23-37 builds one BVH per mesh),
  - per-instance transform / inverse / material binding
    (Nexus/src/Geometry/BVH/BVHInstance.{h,cpp}),
  - TLAS over world-space instance AABBs
    (Nexus/src/Geometry/BVH/TLAS.cpp:13-100). The reference clusters
    agglomeratively then CWBVH-collapses; we reuse the binned-SAH BVH2
    builder over instance AABBs (equal-or-better SAH trees, shared code).

Device layout: ONE merged node array so the lockstep traversal loop
(accel/traverse_tlas.py) indexes a single uniform node space —
  nodes [0, n_tlas_nodes)       : TLAS nodes; leaves hold instance ids
                                  (leaf_size forced to 1 — one instance
                                  per leaf, so "enter instance" is a
                                  single lockstep event per pop),
  nodes [n_tlas_nodes, M)       : all BLAS nodes, child/leaf indices
                                  pre-offset into the merged space.
This mirrors how the reference publishes `tlas`, `blas`, `bvhs` device
globals side by side (Nexus/src/Cuda/BVH/BVH8Traversal.cuh:20-22) but
collapses the three indirections into one index arithmetic.

World AABB of an instance = transformed 8 corners of its BLAS root box
(BVHInstance.cpp:4-29 does the same with the quantized root box).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax.numpy as jnp
import numpy as np

from nexus_tpu.accel import bvh2 as bvh2_mod


@dataclasses.dataclass
class Blas:
    """One mesh asset: object-space triangle soup + its BVH2."""
    bvh: bvh2_mod.BVH2
    v0: np.ndarray  # (T, 3) object space
    v1: np.ndarray
    v2: np.ndarray

    @property
    def tri_count(self) -> int:
        return self.v0.shape[0]


def build_blas(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               leaf_size: int = 4) -> Blas:
    """Build a BLAS over object-space triangles (AssetManager::CreateBVH
    analog, AssetManager.cpp:23-37)."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    return Blas(bvh=bvh2_mod.build(v0, v1, v2, leaf_size=leaf_size),
                v0=v0, v1=v1, v2=v2)


@flax.struct.dataclass
class TLASArrays:
    """Device two-level BVH: merged TLAS+BLAS nodes + instance table.

    D_BVHInstance + tlas/blas/bvhs globals analog
    (Nexus/src/Cuda/BVH/BVHInstance.cuh:7-14, BVH8Traversal.cuh:20-22).
    """
    # Merged node arrays (TLAS first, then every BLAS, child indices
    # already offset into this merged space):
    bmin: jnp.ndarray        # (M, 3)
    bmax: jnp.ndarray        # (M, 3)
    left_first: jnp.ndarray  # (M,) internal: merged left-child index;
    #                          TLAS leaf: slot into inst_order;
    #                          BLAS leaf: slot into merged tri_order
    count: jnp.ndarray       # (M,) 0 internal, >0 leaf primitive count
    inst_order: jnp.ndarray  # (I,) TLAS leaf slots -> instance ids
    # Instance table:
    inst_blas: jnp.ndarray   # (I,) int32 BLAS id
    inst_m: jnp.ndarray      # (I, 3, 4) object -> world
    inst_inv: jnp.ndarray    # (I, 3, 4) world -> object
    inst_nrm: jnp.ndarray    # (I, 3, 3) inv[:, :3].T — normal transform
    inst_mat: jnp.ndarray    # (I,) int32 material id (per-instance
    #                          binding, BVHInstance::AssignMaterial)
    inst_root: jnp.ndarray   # (I,) int32 merged node id of the BLAS root
    inst_ntris: jnp.ndarray  # (I,) int32 triangle count of the BLAS
    inst_tri_off: jnp.ndarray  # (I,) int32 global-tri offset of the BLAS
    # Object-space triangles, concatenated over BLASes ("global" ids):
    tri_order: jnp.ndarray   # (N,) merged leaf slots -> global tri ids
    v0: jnp.ndarray          # (N, 3)
    v1: jnp.ndarray
    v2: jnp.ndarray
    # Static metadata:
    n_tlas_nodes: int = flax.struct.field(pytree_node=False, default=0)
    max_leaf: int = flax.struct.field(pytree_node=False, default=4)

    @property
    def n_instances(self) -> int:
        return self.inst_blas.shape[0]


def _mat34(m: np.ndarray) -> np.ndarray:
    """Accept (4,4) or (3,4); return (3,4) float32 affine."""
    m = np.asarray(m, np.float32)
    if m.shape == (4, 4):
        return m[:3, :]
    assert m.shape == (3, 4), m.shape
    return m


def instance_world_aabb(blas: Blas, m34: np.ndarray):
    """World bounds = transformed 8 corners of the BLAS root box
    (BVHInstance.cpp:4-29)."""
    lo, hi = blas.bvh.bmin[0], blas.bvh.bmax[0]
    corners = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                        [lo[0], hi[1], lo[2]], [hi[0], hi[1], lo[2]],
                        [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                        [lo[0], hi[1], hi[2]], [hi[0], hi[1], hi[2]]],
                       np.float32)
    w = corners @ m34[:, :3].T + m34[:, 3]
    return w.min(axis=0), w.max(axis=0)


def build_tlas(blases: list[Blas], inst_blas: list[int],
               transforms: list[np.ndarray],
               material_ids: list[int]) -> TLASArrays:
    """Assemble the merged two-level structure (TLAS::Build analog,
    TLAS.cpp:13-100 — binned SAH instead of agglomerative pairing)."""
    n_inst = len(inst_blas)
    assert n_inst == len(transforms) == len(material_ids) and n_inst > 0
    assert blases, "no BLAS assets"

    mats = [_mat34(t) for t in transforms]
    invs = []
    for m in mats:
        full = np.eye(4, dtype=np.float32)
        full[:3, :] = m
        invs.append(np.linalg.inv(full)[:3, :].astype(np.float32))

    wmin = np.empty((n_inst, 3), np.float32)
    wmax = np.empty((n_inst, 3), np.float32)
    for i, (b, m) in enumerate(zip(inst_blas, mats)):
        wmin[i], wmax[i] = instance_world_aabb(blases[b], m)

    # TLAS: SAH tree over instance AABBs, one instance per leaf.
    tlas = bvh2_mod.build_from_aabbs(wmin, wmax, 0.5 * (wmin + wmax),
                                     force_leaf_one=True)
    n_tlas = tlas.node_count

    # Merge node arrays; offset BLAS child/leaf indices.
    node_off = np.zeros(len(blases), np.int64)
    tri_off = np.zeros(len(blases), np.int64)
    off_n, off_t = n_tlas, 0
    bmin = [tlas.bmin]
    bmax = [tlas.bmax]
    left_first = [tlas.left_first]
    count = [tlas.count]
    tri_order, v0s, v1s, v2s = [], [], [], []
    max_leaf = 1
    for b, blas in enumerate(blases):
        node_off[b], tri_off[b] = off_n, off_t
        nb = blas.bvh
        is_leaf = nb.count > 0
        lf = nb.left_first + np.where(is_leaf, off_t, off_n).astype(np.int32)
        bmin.append(nb.bmin)
        bmax.append(nb.bmax)
        left_first.append(lf.astype(np.int32))
        count.append(nb.count)
        tri_order.append(nb.tri_order.astype(np.int64) + off_t)
        v0s.append(blas.v0)
        v1s.append(blas.v1)
        v2s.append(blas.v2)
        max_leaf = max(max_leaf, int(nb.count.max(initial=0)))
        off_n += nb.node_count
        off_t += blas.tri_count

    inst_blas_np = np.asarray(inst_blas, np.int64)
    return TLASArrays(
        bmin=jnp.asarray(np.concatenate(bmin)),
        bmax=jnp.asarray(np.concatenate(bmax)),
        left_first=jnp.asarray(np.concatenate(left_first), jnp.int32),
        count=jnp.asarray(np.concatenate(count), jnp.int32),
        inst_order=jnp.asarray(tlas.tri_order, jnp.int32),
        inst_blas=jnp.asarray(inst_blas_np, jnp.int32),
        inst_m=jnp.asarray(np.stack(mats)),
        inst_inv=jnp.asarray(np.stack(invs)),
        inst_nrm=jnp.asarray(
            np.stack([inv[:, :3].T.copy() for inv in invs])),
        inst_mat=jnp.asarray(material_ids, jnp.int32),
        inst_root=jnp.asarray(node_off[inst_blas_np], jnp.int32),
        inst_ntris=jnp.asarray(
            [blases[b].tri_count for b in inst_blas], jnp.int32),
        inst_tri_off=jnp.asarray(tri_off[inst_blas_np], jnp.int32),
        tri_order=jnp.asarray(np.concatenate(tri_order), jnp.int32),
        v0=jnp.asarray(np.concatenate(v0s), jnp.float32),
        v1=jnp.asarray(np.concatenate(v1s), jnp.float32),
        v2=jnp.asarray(np.concatenate(v2s), jnp.float32),
        n_tlas_nodes=n_tlas,
        max_leaf=max_leaf)
