"""HBM-resident, instance-aware Pallas trace kernels (v2: per-ray
hierarchical culling).

This kernel is the TPU re-design of the reference's hierarchical
traversal (Nexus/src/Cuda/BVH/BVH8Traversal.cuh:148-322, incl. the
TLAS->BLAS instance transition at l.234-267). v1 culled triangle blocks
with a per-TILE conservative frustum (interval arithmetic + bounding
cone) and pruned with the tile's WORST best-t; that degenerates on
dense scenes — occluded interior blocks and tiles containing any
background ray (best-t = inf) defeated the pruning, and every surviving
block cost a serial pop->DMA->intersect step (measured 16x triangles ->
~1300x slower). v2 replaces the frustum with EXACT per-ray slab tests
at two hierarchy levels, each a single vectorized VPU pass:

  GPU reference                      TPU kernel (this file)
  ---------------------------------  ---------------------------------
  per-thread CWBVH stack walk        two-level per-ray interval tree:
  (8 children tested per step,       one (TILE_R, 128) slab pass ranks
  ordered by hit distance)           128 CHUNKS (=16k entries) per op;
                                     a second pass ranks the 128
                                     entries of the popped chunk
  per-ray ordered stack + t-pruning  global near-to-far ordering with
                                     PER-RAY best-t masks: an entry is
                                     alive iff ANY ray's slab entry
                                     distance beats THAT ray's best
                                     hit; masks are recomputed from
                                     live best-t every pop, so occluded
                                     geometry dies as hits accumulate
  node fetch via __ldg               triangle blocks DMA'd HBM->VMEM on
                                     demand, double-buffered; VMEM
                                     holds O(tile), never O(scene)
  TLAS leaf: transform ray into      per-ENTRY instance id: the tile's
  object space (cuh:246-249)         rays are transformed by the
                                     instance inverse before the 128-
                                     wide intersection; t is space-
                                     invariant because the direction is
                                     NOT renormalized (same convention
                                     as accel/traverse_tlas.py)

Memory layout (host-built by `build_blocked_flat` / `build_blocked_tlas`):

  tri    (NBG, 10, 128) f32 HBM   one 128-triangle block per row,
                                  median-cut BSP clusters per BLAS
                                  (_bsp_order; 3.5x tighter than the
                                  round-4 Morton slicing); rows are
                                  ax,ay,az,bx,by,bz,cx,cy,cz plus the
                                  GLOBAL triangle id as an exact f32
                                  (ids < 2^24) — the winning lane's id
                                  is extracted in-kernel, so hits need
                                  no host-side to_global gather (that
                                  gather was the single largest
                                  backward-pass op). Blocks are SHARED
                                  between instances of one BLAS — the
                                  instancing memory win survives.
  aabb   (NEC, 8, 128) f32  VMEM  WORLD-space AABBs of the (block,
                                  instance) entries, 128 per chunk, rows
                                  bmin.xyz / bmax.xyz / pad. ~32 B per
                                  128 triangles: 1M tris = 250 KB.
  parent (NPC, 8, 128) f32  VMEM  chunk-level AABBs (union of each
                                  chunk's live entries): one row of 128
                                  parents covers 16k entries = 2M tris.
  ent_block/ent_inst (NE,)  SMEM  entry -> global block / instance id.
  inst_inv (NI, 12)  f32    SMEM  world->object affine per instance.

A "tile" is TILE_R consecutive rays. Tile coherence comes from the
Z-ORDER pixel enumeration (core/zorder.py): a 256-lane camera tile is a
~16x16 pixel block, and secondary/shadow rays inherit that spatial
grouping, which concentrates each tile's alive-entry set. (Per-bounce
(dead, octant) lane sorting is a further opt-in via
RenderSettings.sort_lanes; off by default — the argsort + pytree
permute costs more than the residual incoherence.) Per tile:

  1. one slab pass per parent row -> Epar[r, c] = ray r's conservative
     entry distance into chunk c (inf when provably missed);
  2. outer loop: pop the GC(<=4) nearest alive chunks TOGETHER (masked
     minimum over rays still beating their best-t); one slab pass per
     chunk ranks their entries into a (R, GC*128) window — the wide
     window keeps pops globally near-ordered across chunk boundaries
     (see _traverse);
  3. inner loop: pop the nearest alive window entry, DMA its block
     (next pop's DMA overlaps the current intersection),
     Moller-Trumbore all tile rays against it (capped by the live
     per-ray best-t), update best-t/slot/instance.

Cost model: every pass is O(128 boxes / op); pops touch only entries
some ray still needs, so kernel time scales with the VISIBLE geometric
complexity per tile (front surfaces + silhouette grazes), not scene
size. Scaling is measured in benchmarks/scaling_tris.py.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nexus_tpu.geom.types import MISS_DISTANCE

CHUNK = 128        # triangles per block == entries per AABB chunk (lanes)
TILE_R = 128       # rays per grid step. Swept on v5e with the
#                    windowed traversal (benchmarks/scaling_tris.py
#                    --tiles; docs/perf.md): 128 beats 256 on secondary
#                    (incoherent) rays by ~15-20% — every (R, 128) op is
#                    R/8 issue slots, so smaller tiles waste fewer
#                    lanes per pop once per-tile pop counts stop
#                    shrinking with R — and matches 256 on camera rays.
# Inner-loop pipelining: flights of k entries (k = _flight_for(scene),
# 1 or 2), two flights in DMA flight, and the next flight selected with
# the LIVE per-ray best-t right after the current one's intersections
# (_pipelined_pops). Round 3 used BATCH=4 two-deep batching; measured
# pop statistics (z-order camera tiles on cornell: 2.6 entries/tile
# actually needed) showed its 8-entry selection lookahead ran on STALE
# thresholds and intersected ~3x more blocks than required. Selection
# CONSUMES entries from e_ref immediately (columns go to inf), so
# in-flight entries are never re-selected and every started DMA is
# waited exactly once.
_INF = 3.0e38
_BIG = 1.0e37


@flax.struct.dataclass
class BlockedScene:
    """Blocked triangle layout + (block, instance) entry table."""
    tri: jnp.ndarray        # (NBG, 10, 128) f32, HBM-resident (9 vert
    #                         rows + exact-f32 global tri id row)
    aabb: jnp.ndarray       # (NEC, 8, 128) f32 world entry AABBs
    parent: jnp.ndarray     # (NPC, 8, 128) f32 chunk-level AABBs
    ent_block: jnp.ndarray  # (NEC*128,) int32 entry -> block id
    ent_inst: jnp.ndarray   # (NEC*128,) int32 entry -> instance id
    inst_inv: jnp.ndarray   # (NI, 12) f32 world->object affines
    to_global: jnp.ndarray  # (NBG*128,) int32 block slot -> global tri id
    obj_aabb: jnp.ndarray   # (NBG, 6) f32 OBJECT-space block AABBs
    #                         (lo.xyz, hi.xyz) — kept for incremental
    #                         transform edits (scene/edit.py re-derives
    #                         entry world AABBs without a host rebuild)
    n_entries: int = flax.struct.field(pytree_node=False, default=0)
    instanced: bool = flax.struct.field(pytree_node=False, default=False)
    # Blocks DMA'd + intersected per entry pop (static). Round-5 tile
    # sweep fit per-pop cost = 0.79 us FIXED (DMA wait + loop overhead)
    # + 0.21 us of (R,128) VPU work at R=128 — fixed-cost-per-pop
    # bound, which motivated popping PAIRS of consecutive Morton blocks
    # per DMA. Measured NEGATIVE as a default (see _PAIR_MIN_BLOCKS):
    # pair unions were too loose, pops only dropped 15%. Explicit
    # blocks_per_entry=2 remains available and kernel-supported.
    blocks_per_entry: int = flax.struct.field(pytree_node=False,
                                              default=1)

    @property
    def n_blocks(self) -> int:
        return self.tri.shape[0]


def _split_big(v0, v1, v2, ids, rel=1 / 24.0, max_rounds=6):
    """Subdivide triangles whose AABB extent exceeds `rel` x the scene
    extent (longest-edge midpoint split, 1 -> 2 per round).

    Huge triangles (Cornell walls, ground planes) otherwise give their
    128-triangle block a scene-sized AABB that every ray tile keeps
    alive — the per-ray cull degenerates to brute force on them.

    SBVH-style (the same dodge spatial-split BVHs use for references
    that straddle splits): each piece keeps the ORIGINAL triangle's
    vertices for intersection and contributes only its clipped bounds
    to the block/entry AABB. Intersecting split geometry in f32 can
    miss both pieces of a hit near the shared interior edge (seam
    pinholes); intersecting the full original triangle per piece cannot
    — duplicate hits across pieces return the identical t and are
    harmless for closest/any-hit. `ids` maps pieces back to original
    triangle ids, so shading/refine (scene/view.py) are unaffected.

    Returns (ov0, ov1, ov2, lo, hi, ids): original verts per piece,
    piece AABBs, original ids."""
    v0 = np.asarray(v0, np.float32).copy()
    v1 = np.asarray(v1, np.float32).copy()
    v2 = np.asarray(v2, np.float32).copy()
    ids = np.asarray(ids, np.int32).copy()
    ov0, ov1, ov2 = v0, v1, v2       # originals travel with each piece
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    scene_ext = float((hi.max(axis=0) - lo.min(axis=0)).max())
    if scene_ext <= 0.0:
        return ov0, ov1, ov2, lo, hi, ids
    # Split only OUTLIER triangles: much larger than both the scene
    # fraction `rel` and 8x the median extent. Uniformly tessellated
    # meshes are left untouched (their block AABBs are already tight).
    med = float(np.median((hi - lo).max(axis=1)))
    thresh = max(scene_ext * rel, 8.0 * med)
    for _ in range(max_rounds):
        ext = (np.maximum(np.maximum(v0, v1), v2)
               - np.minimum(np.minimum(v0, v1), v2)).max(axis=1)
        big = ext > thresh
        if not big.any():
            break
        b0, b1, b2 = v0[big], v1[big], v2[big]
        e = np.stack([np.linalg.norm(b1 - b0, axis=1),
                      np.linalg.norm(b2 - b1, axis=1),
                      np.linalg.norm(b0 - b2, axis=1)], axis=1)
        longest = e.argmax(axis=1)
        m01 = 0.5 * (b0 + b1)
        m12 = 0.5 * (b1 + b2)
        m20 = 0.5 * (b2 + b0)
        mid = np.where((longest == 0)[:, None], m01,
                       np.where((longest == 1)[:, None], m12, m20))
        # Split across the longest edge: two children share `mid`.
        c0a = np.where((longest == 0)[:, None], b0,
                       np.where((longest == 1)[:, None], b1, b2))
        c0b = np.where((longest == 0)[:, None], b1,
                       np.where((longest == 1)[:, None], b2, b0))
        apex = np.where((longest == 0)[:, None], b2,
                        np.where((longest == 1)[:, None], b0, b1))
        keep = ~big
        v0 = np.concatenate([v0[keep], c0a, mid])
        v1 = np.concatenate([v1[keep], mid, c0b])
        v2 = np.concatenate([v2[keep], apex, apex])
        ids = np.concatenate([ids[keep], ids[big], ids[big]])
        ov0 = np.concatenate([ov0[keep], ov0[big], ov0[big]])
        ov1 = np.concatenate([ov1[keep], ov1[big], ov1[big]])
        ov2 = np.concatenate([ov2[keep], ov2[big], ov2[big]])
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return ov0, ov1, ov2, lo, hi, ids


def _woop_rows(b0, b1, b2):
    """Per-triangle Woop (inverse-affine) transforms of vertex blocks
    (nb, CHUNK, 3) -> (nb, 12, CHUNK) coefficient rows.

    W maps world/object space onto the UNIT triangle (v0 -> origin,
    v1 -> (1,0,0), v2 -> (0,1,0), normal -> +z): with A = [e1 e2 n] as
    columns, W = A^-1 and the translation is -W v0. Closed form rows:
    w1 = (e2 x n)/det, w2 = (n x e1)/det, w3 = n/det with
    det = n.n (n = e1 x e2). Intersection then needs only
    o' = W o + t, d' = W d — which a 128-wide block turns into three
    (2R,4)x(4,128) MXU matmuls (`_woop_block`), moving the
    triangle-test arithmetic off the instruction-issue-bound VPU
    (the TPU analog of ChildTrace's use of the GPU special units,
    BVH8Traversal.cuh:55-146). MEASURED NEGATIVE on v5e
    (benchmarks/ab_woop.py, docs/perf.md round 5): 20-30% slower than
    the VPU Moller-Trumbore at every scene size — K=4 uses 3% of the
    MXU systolic depth and f32 exactness (required by the 1e-4 hit-t
    gates) forces 6 bf16 passes per dot. Kept as the documented
    negative result + layout option; default builds stay woop=False.

    Rows (matmul-ready, component-major): [w1.xyz t1, w2.xyz t2,
    w3.xyz t3]. Degenerate (padding) triangles get W = 0 and t3 = 1,
    so d'z = 0 and o'z = 1 -> t = -inf -> rejected by t > 0.
    Coefficients are computed in float64 and stored f32."""
    b0 = b0.astype(np.float64)
    e1 = b1.astype(np.float64) - b0
    e2 = b2.astype(np.float64) - b0
    n = np.cross(e1, e2)
    det = (n * n).sum(-1)
    ok = det > 1.0e-30
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)[..., None]
    w1 = np.cross(e2, n) * inv
    w2 = np.cross(n, e1) * inv
    w3 = n * inv
    t1 = -(w1 * b0).sum(-1)
    t2 = -(w2 * b0).sum(-1)
    t3 = np.where(ok, -(w3 * b0).sum(-1), 1.0)
    rows = np.stack([w1[..., 0], w1[..., 1], w1[..., 2], t1,
                     w2[..., 0], w2[..., 1], w2[..., 2], t2,
                     w3[..., 0], w3[..., 1], w3[..., 2], t3],
                    axis=1)
    return rows.astype(np.float32)


def _block_tris(v0, v1, v2, plo, phi, gids, woop=False):
    """Pre-ordered (N,3)x3 verts + (N,3)x2 piece bounds + (N,) GLOBAL
    tri ids -> ((NB,R,128) blocks, (NB,6) object AABBs, (NB*128,)
    to_global). The block AABB is the union of PIECE bounds (tight for
    split outliers, _split_big), while the packed verts are the full
    originals. Padding repeats the last triangle's v0 as a degenerate
    point-triangle (Moller-Trumbore rejects det=0). (An id row DMA'd
    with the block was tried and reverted: the per-intersection id
    select cost more kernel time than the to_global gather it removed —
    XLA overlaps that gather with kernel execution.)

    woop=True swaps the 9 vertex rows for 12 Woop coefficient rows
    (`_woop_rows`; 13 rows total with the id row) — the MXU-matmul
    intersection layout."""
    gids = np.asarray(gids, np.int32)
    n = gids.shape[0]
    nb = max((n + CHUNK - 1) // CHUNK, 1)
    pad = nb * CHUNK - n
    vo = [np.asarray(v, np.float32) for v in (v0, v1, v2)]
    fill = np.repeat(vo[0][-1:], pad, axis=0)
    b0 = np.concatenate([vo[0], fill]).reshape(nb, CHUNK, 3)
    b1 = np.concatenate([vo[1], fill]).reshape(nb, CHUNK, 3)
    b2 = np.concatenate([vo[2], fill]).reshape(nb, CHUNK, 3)
    to_global = np.concatenate([gids, np.full(pad, gids[-1], np.int32)])
    assert int(gids.max(initial=0)) < (1 << 24), \
        "global tri ids must be exactly representable in f32"
    idrow = to_global.astype(np.float32).reshape(nb, 1, CHUNK)
    if woop:
        tri = np.concatenate([_woop_rows(b0, b1, b2), idrow], axis=1)
    else:
        tri = np.concatenate(
            [np.stack([b0[..., 0], b0[..., 1], b0[..., 2],
                       b1[..., 0], b1[..., 1], b1[..., 2],
                       b2[..., 0], b2[..., 1], b2[..., 2]], axis=1),
             idrow], axis=1)
    # Padding pieces are points — they never widen the union.
    pfill = np.repeat(np.asarray(plo, np.float32)[-1:], pad, axis=0)
    lo = np.concatenate([np.asarray(plo, np.float32),
                         pfill]).reshape(nb, CHUNK, 3).min(axis=1)
    hi = np.concatenate([np.asarray(phi, np.float32),
                         pfill]).reshape(nb, CHUNK, 3).max(axis=1)
    return (np.ascontiguousarray(tri),
            np.concatenate([lo, hi], axis=1), to_global)


def _bsp_order(centers, leaf=None):
    """Balanced BSP (median-cut) ordering of (N, 3) points: recursively
    split along the longest axis at a CHUNK-aligned median, so every
    consecutive 128-run is a spatially tight cluster and consecutive
    256-runs (sibling pairs) are tight unions by construction.

    Replaces the Morton-curve slicing used through round 4: Morton
    128-runs straddle curve discontinuities, which is why pair pops
    only cut pops 15% (docs/perf.md round 5) — a median-cut split
    never produces a cluster wider than its parent's split axis
    extent. Returns an (N,) permutation."""
    leaf = leaf or CHUNK
    centers = np.asarray(centers, np.float64)
    out = np.empty(centers.shape[0], np.int64)
    pos = 0
    stack = [np.arange(centers.shape[0], dtype=np.int64)]
    while stack:
        idx = stack.pop()
        n = idx.shape[0]
        if n <= leaf:
            out[pos:pos + n] = idx
            pos += n
            continue
        c = centers[idx]
        ax = int((c.max(axis=0) - c.min(axis=0)).argmax())
        # CHUNK-aligned split nearest the median keeps every block
        # within one side; clamp so both sides are non-empty.
        k = int(round(n / 2 / leaf)) * leaf
        k = min(max(k, leaf), (n - 1) // leaf * leaf)
        if k <= 0 or k >= n:
            k = n // 2
        part = np.argpartition(c[:, ax], k)
        stack.append(idx[part[k:]])
        stack.append(idx[part[:k]])
    return out


def _pack_entries(world_lo, world_hi, ent_block, ent_inst):
    """BSP-cluster entries by AABB center, pad to a CHUNK multiple with
    +BIG sentinel boxes (rejected by the slab pass's validity mask),
    transpose into (NEC, 8, 128) chunks, and compute the chunk-level
    parent AABBs (NPC, 8, 128)."""
    ne = ent_block.shape[0]
    center = 0.5 * (world_lo + world_hi)
    perm = _bsp_order(center)   # tight 128-entry chunks (see _bsp_order)
    world_lo, world_hi = world_lo[perm], world_hi[perm]
    ent_block, ent_inst = ent_block[perm], ent_inst[perm]

    nec = max((ne + CHUNK - 1) // CHUNK, 1)
    pad = nec * CHUNK - ne
    lo = np.concatenate([world_lo, np.full((pad, 3), _BIG, np.float32)])
    hi = np.concatenate([world_hi, np.full((pad, 3), -_BIG, np.float32)])
    aabb = np.zeros((nec, 8, CHUNK), np.float32)
    for a in range(3):
        aabb[:, a, :] = lo[:, a].reshape(nec, CHUNK)
        aabb[:, 3 + a, :] = hi[:, a].reshape(nec, CHUNK)

    # Chunk-level parents: union of the chunk's live entries. A chunk
    # made entirely of padding keeps lo=+BIG -> rejected by the same
    # validity mask as padding entries.
    npc = max((nec + CHUNK - 1) // CHUNK, 1)
    cpad = npc * CHUNK - nec
    plo = lo.reshape(nec, CHUNK, 3).min(axis=1)
    phi = hi.reshape(nec, CHUNK, 3).max(axis=1)
    plo = np.concatenate([plo, np.full((cpad, 3), _BIG, np.float32)])
    phi = np.concatenate([phi, np.full((cpad, 3), -_BIG, np.float32)])
    parent = np.zeros((npc, 8, CHUNK), np.float32)
    for a in range(3):
        parent[:, a, :] = plo[:, a].reshape(npc, CHUNK)
        parent[:, 3 + a, :] = phi[:, a].reshape(npc, CHUNK)

    zpad = np.zeros(pad, np.int32)
    return (aabb, parent,
            np.concatenate([ent_block.astype(np.int32), zpad]),
            np.concatenate([ent_inst.astype(np.int32), zpad]), ne)


# Pair pops (blocks_per_entry=2) measured NEGATIVE as a default on the
# 983k interior (docs/perf.md round 5): pops only dropped 15% (unions
# of Morton-adjacent block pairs are loose — pairs straddle Morton
# discontinuities) while each pop pays 2x the variable MT cost:
# 142.6 -> 154.8 ms on bounce-1 closest. The cost model held (per-pop
# fixed 0.79 us verified at bpe=2 as 0.84); the PAIRING quality is
# what failed. Kept as an explicit option; auto-pairing disabled.
_PAIR_MIN_BLOCKS = 1 << 30


def _pad_blocks(tri, oaabb, to_global, bpe):
    """Pad the block count to a multiple of `bpe` by REPEATING the last
    block: duplicated triangles return the identical t and gid, so
    closest/any-hit semantics are unchanged, and no special padding
    case exists in the kernel."""
    nb = tri.shape[0]
    pad = (-nb) % bpe
    if pad:
        tri = np.concatenate([tri, np.repeat(tri[-1:], pad, axis=0)])
        oaabb = np.concatenate([oaabb,
                                np.repeat(oaabb[-1:], pad, axis=0)])
        to_global = np.concatenate(
            [to_global, np.tile(to_global[-CHUNK:], pad)])
    return tri, oaabb, to_global


def _group_entries(oaabb, bpe):
    """(NB, 6) block AABBs -> per-entry (first block id, union lo/hi)."""
    nb = oaabb.shape[0]
    ids = np.arange(0, nb, bpe, dtype=np.int32)
    lo = oaabb[:, :3].reshape(-1, bpe, 3).min(axis=1).astype(np.float32)
    hi = oaabb[:, 3:].reshape(-1, bpe, 3).max(axis=1).astype(np.float32)
    return ids, lo, hi


def build_blocked_flat(v0, v1, v2, order, woop=False,
                       blocks_per_entry=None) -> BlockedScene:
    """Flat world-space scene: one entry per block, identity instance.

    Oversized triangles are subdivided for traversal (see _split_big)
    and the pieces re-clustered by centroid with a median-cut BSP
    (_bsp_order) so every 128-block is spatially tight; `order` (the
    BVH2 DFS order) seeds the id map. woop selects the MXU-matmul
    intersection layout (_woop_rows)."""
    order = np.asarray(order, np.int32)
    v0 = np.asarray(v0, np.float32)[order]
    v1 = np.asarray(v1, np.float32)[order]
    v2 = np.asarray(v2, np.float32)[order]
    v0, v1, v2, plo, phi, ids = _split_big(v0, v1, v2, order)
    perm = _bsp_order(0.5 * (plo + phi))
    v0, v1, v2, ids = v0[perm], v1[perm], v2[perm], ids[perm]
    plo, phi = plo[perm], phi[perm]
    tri, oaabb, to_global = _block_tris(v0, v1, v2, plo, phi, ids,
                                        woop=woop)
    bpe = blocks_per_entry or (
        2 if tri.shape[0] >= _PAIR_MIN_BLOCKS else 1)
    tri, oaabb, to_global = _pad_blocks(tri, oaabb, to_global, bpe)
    ids, ent_lo, ent_hi = _group_entries(oaabb, bpe)
    aabb, parent, ent_block, ent_inst, ne = _pack_entries(
        ent_lo, ent_hi, ids, np.zeros(ids.shape[0], np.int32))
    eye = np.concatenate([np.eye(3, dtype=np.float32),
                          np.zeros((3, 1), np.float32)], axis=1)
    return BlockedScene(
        tri=jnp.asarray(tri), aabb=jnp.asarray(aabb),
        parent=jnp.asarray(parent),
        ent_block=jnp.asarray(ent_block), ent_inst=jnp.asarray(ent_inst),
        inst_inv=jnp.asarray(eye.reshape(1, 12)),
        to_global=jnp.asarray(to_global),
        obj_aabb=jnp.asarray(oaabb.astype(np.float32)),
        n_entries=ne, instanced=False, blocks_per_entry=bpe)


def build_blocked_tlas(tl, woop=False, blocks_per_entry=None) -> BlockedScene:
    """Instanced scene from accel.tlas.TLASArrays: blocks are built once
    per BLAS (object space, shared); entries are (block, instance) pairs
    with world AABBs = the transformed object block AABB corners
    (BVHInstance.cpp:4-29 semantics at block granularity)."""
    inst_blas = np.asarray(tl.inst_blas)
    inst_off = np.asarray(tl.inst_tri_off)
    inst_ntris = np.asarray(tl.inst_ntris)
    inst_m = np.asarray(tl.inst_m)
    tri_order = np.asarray(tl.tri_order)
    v0 = np.asarray(tl.v0)
    v1 = np.asarray(tl.v1)
    v2 = np.asarray(tl.v2)

    # Per-BLAS block arrays (object space), shared across instances.
    # Each BLAS is padded to a blocks_per_entry multiple so entry
    # groups never straddle BLAS boundaries.
    blas_ids = sorted(set(int(b) for b in inst_blas))
    total_blocks = 0
    prepared = {}
    for b in blas_ids:
        i = int(np.nonzero(inst_blas == b)[0][0])
        off, nt = int(inst_off[i]), int(inst_ntris[i])
        order = tri_order[off:off + nt]  # global tri ids, BLAS DFS order
        s0, s1, s2, plo, phi, ids = _split_big(
            v0[order], v1[order], v2[order], order)
        perm = _bsp_order(0.5 * (plo + phi))
        s0, s1, s2, ids = s0[perm], s1[perm], s2[perm], ids[perm]
        plo, phi = plo[perm], phi[perm]
        prepared[b] = _block_tris(s0, s1, s2, plo, phi, ids, woop=woop)
        total_blocks += prepared[b][0].shape[0]
    bpe = blocks_per_entry or (
        2 if total_blocks >= _PAIR_MIN_BLOCKS else 1)

    block_base, tris, oaabbs, to_globals = {}, [], [], []
    nbg = 0
    for b in blas_ids:
        tri, oaabb, tg = _pad_blocks(*prepared[b], bpe)
        block_base[b] = nbg
        nbg += tri.shape[0]
        tris.append(tri)
        oaabbs.append(oaabb)
        to_globals.append(tg)

    # Entries: every (instance, block-group-of-its-BLAS) pair.
    ent_block, ent_inst, wlo, whi = [], [], [], []
    for i in range(inst_blas.shape[0]):
        b = int(inst_blas[i])
        oa = oaabbs[blas_ids.index(b)]
        gids, glo, ghi = _group_entries(oa, bpe)
        # 8 corners of each group box through the instance transform.
        m = inst_m[i]
        corners = np.stack([np.where(
            np.array([(k >> a) & 1 for a in range(3)], bool), ghi, glo)
            for k in range(8)], axis=1)             # (ng, 8, 3)
        w = corners @ m[:, :3].T + m[:, 3]
        ent_block.append(gids + block_base[b])
        ent_inst.append(np.full(gids.shape[0], i, np.int32))
        wlo.append(w.min(axis=1).astype(np.float32))
        whi.append(w.max(axis=1).astype(np.float32))

    aabb, parent, eb, ei, ne = _pack_entries(
        np.concatenate(wlo), np.concatenate(whi),
        np.concatenate(ent_block), np.concatenate(ent_inst))
    return BlockedScene(
        tri=jnp.asarray(np.concatenate(tris)), aabb=jnp.asarray(aabb),
        parent=jnp.asarray(parent),
        ent_block=jnp.asarray(eb), ent_inst=jnp.asarray(ei),
        inst_inv=jnp.asarray(np.asarray(tl.inst_inv).reshape(-1, 12)),
        to_global=jnp.asarray(np.concatenate(to_globals)),
        obj_aabb=jnp.asarray(
            np.concatenate(oaabbs).astype(np.float32)),
        n_entries=ne, instanced=True, blocks_per_entry=bpe)


# --------------------------------------------------------------------------
# Kernel internals
# --------------------------------------------------------------------------

def _safe_inv(d):
    tiny = 1.0e-12
    d = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / d


def _slab_row(lo, hi, o, inv, valid_col):
    """Per-ray EXACT slab entry distances vs one row of 128 boxes.

    lo/hi: 3 box rows each, shape (1, 128); o/inv: (R, 1) ray columns;
    valid_col: (R, 1) bool. Returns (R, 128) conservative entry
    distance (>= 0), _INF where the ray provably misses the box, where
    the box is a +BIG padding sentinel, or where the ray is invalid.
    This is the tile-granular ChildTrace analog
    (BVH8Traversal.cuh:55-146) — one VPU pass ranks 128 boxes for every
    ray at once, exactly (no interval-arithmetic over-approximation)."""
    tmin = jnp.zeros((o[0].shape[0], CHUNK), jnp.float32)
    tmax = jnp.full((o[0].shape[0], CHUNK), _INF, jnp.float32)
    for a in range(3):
        n = (lo[a] - o[a]) * inv[a]
        f = (hi[a] - o[a]) * inv[a]
        tmin = jnp.maximum(tmin, jnp.minimum(n, f))
        tmax = jnp.minimum(tmax, jnp.maximum(n, f))
    box_valid = lo[0] < _BIG * 0.5          # (1, 128) broadcast
    ok = (tmax >= tmin) & (tmax > 0.0) & box_valid & valid_col
    return jnp.where(ok, tmin, _INF)


def _mt_block(buf, s, j, ox, oy, oz, dx, dy, dz, t_cap):
    """Masked Moller-Trumbore: (TILE_R, 1) ray columns vs the 128-lane
    triangle block in buf[s, j] -> (TILE_R, CHUNK) t (miss =
    MISS_DISTANCE). (D_Triangle::Trace semantics,
    Nexus/src/Cuda/Geometry/Triangle.cuh:53-87; degenerate padding
    triangles yield det=0 -> rejected.)"""
    ax = buf[s, j, 0:1, :]
    ay = buf[s, j, 1:2, :]
    az = buf[s, j, 2:3, :]
    e0x = buf[s, j, 3:4, :] - ax
    e0y = buf[s, j, 4:5, :] - ay
    e0z = buf[s, j, 5:6, :] - az
    e1x = buf[s, j, 6:7, :] - ax
    e1y = buf[s, j, 7:8, :] - ay
    e1z = buf[s, j, 8:9, :] - az
    px = dy * e1z - dz * e1y
    py = dz * e1x - dx * e1z
    pz = dx * e1y - dy * e1x
    det = e0x * px + e0y * py + e0z * pz
    inv = 1.0 / det
    sx = ox - ax
    sy = oy - ay
    sz = oz - az
    u = inv * (sx * px + sy * py + sz * pz)
    qx = sy * e0z - sz * e0y
    qy = sz * e0x - sx * e0z
    qz = sx * e0y - sy * e0x
    v = inv * (dx * qx + dy * qy + dz * qz)
    t = inv * (e1x * qx + e1y * qy + e1z * qz)
    ok = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t > 0.0) & (t < t_cap)
    return jnp.where(ok, t, MISS_DISTANCE)


def _woop_block(buf, s, j, ox, oy, oz, dx, dy, dz, t_cap):
    """MXU-matmul triangle test against the 128-lane Woop block in
    buf[s] (rows from `_woop_rows`): stacking the tile's origins
    (homogeneous) and directions into one (2R, 4) matrix, the whole
    per-triangle affine transform becomes three (2R,4)x(4,128)
    dot_generals — o'/d' per component — leaving only
    t = -o'z/d'z, u/v madds and compares on the VPU (~28 ops vs ~55
    for Moller-Trumbore). precision=HIGHEST: hit selection feeds
    best-t, and the round-4 bf16 MXU-default bug showed f32 exactness
    must be explicit on TPU."""
    r = ox.shape[0]
    one = jnp.ones_like(ox)
    zero = jnp.zeros_like(ox)
    a = jnp.concatenate(
        [jnp.concatenate([ox, oy, oz, one], axis=1),
         jnp.concatenate([dx, dy, dz, zero], axis=1)], axis=0)
    # Precision note: Mosaic lowers only DEFAULT and HIGHEST dot
    # precisions; DEFAULT (one bf16 pass) cannot meet the 1e-4 hit-t
    # gates, so HIGHEST (6 passes) is the only valid choice — and at
    # K=4 each pass uses 3% of the MXU's systolic depth, which is why
    # this layout measured SLOWER than the VPU Moller-Trumbore
    # (docs/perf.md round-5 negative results).
    dot = lambda w: jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    px = dot(buf[s, j, 0:4, :])     # (2R, 128): o'x rows then d'x rows
    py = dot(buf[s, j, 4:8, :])
    pz = dot(buf[s, j, 8:12, :])
    t = -pz[:r] / pz[r:]
    u = px[:r] + t * px[r:]
    v = py[:r] + t * py[r:]
    # Degenerate/padding blocks have W = 0, t3 = 1 -> t = -inf (or NaN
    # when o'z = 0 too); both fail the comparisons below.
    ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t > 0.0) & (t < t_cap)
    return jnp.where(ok, t, MISS_DISTANCE)


def _entry_rays(instanced, inv_ref, ent_inst_ref, e,
                ox, oy, oz, dx, dy, dz):
    """Transform the tile's rays into entry e's instance object space
    (unnormalized direction -> t is space-invariant; cuh:246-249)."""
    if not instanced:
        return ox, oy, oz, dx, dy, dz, jnp.int32(0)
    inst = ent_inst_ref[e]
    m = [inv_ref[inst, k] for k in range(12)]
    tox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
    toy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
    toz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
    tdx = m[0] * dx + m[1] * dy + m[2] * dz
    tdy = m[4] * dx + m[5] * dy + m[6] * dz
    tdz = m[8] * dx + m[9] * dy + m[10] * dz
    return tox, toy, toz, tdx, tdy, tdz, inst


def _select(e_ref, thresh, lane, k):
    """Pick the `k` nearest entries of e_ref still beating some ray's
    CURRENT threshold, CONSUMING them (their columns go to inf so they
    are never re-selected — in-flight entries must not be re-picked
    while the next selection runs). Returns k int32 lane ids (a scalar
    for k=1), -1-padded once exhausted. Selection sees the LIVE
    best-t, so pruning tightens after every intersection — the ordered
    stack + t-prune of BVH8Traversal.cuh:197-222. k trades selection
    overhead (one masked (R, CHUNK) reduction per call) against
    threshold staleness: k=1 for shallow scenes where wasted blocks
    dominate, k=2 for pop-deep scenes where selection cost does."""
    em = jnp.where(e_ref[:] < thresh, e_ref[:], _INF)
    col = jnp.min(em, axis=0, keepdims=True)     # (1, window width)
    width = lane.shape[1]   # argmin sentinel MUST be >= every lane id:
    #                         a narrower constant (CHUNK was hardcoded
    #                         once) clobbers minima in later window
    #                         segments and the never-consumed entry
    #                         spins the pop loop forever
    sels = []
    for _ in range(k):
        mn = jnp.min(col)
        sel = jnp.min(jnp.where(col == mn, lane, width))
        sels.append(jnp.where(mn < _BIG, sel, -1).astype(jnp.int32))
        if k > 1:
            col = jnp.where(lane == sels[-1], _INF, col)
    mask = lane == sels[0]
    for s in sels[1:]:
        mask = mask | (lane == s)
    e_ref[:] = jnp.where(mask, _INF, e_ref[:])
    return sels


def _pipelined_pops(k, depth, select_fn, dma_fn, hit_fn):
    """Depth-D pipelined pop loop over flights of k entries.

    D flights are in DMA flight at any time; entries of flight i+D are
    selected immediately after flight i's intersections, so the
    selection threshold is at most D-1 flights stale while the later
    flights' DMAs hide behind flight i's compute. (The TPU
    re-expression of the persistent-thread dynamic ray fetch +
    postponement economics of BVH8Traversal.cuh:171-180 — overlap
    memory with compute while keeping the working set honest.) The
    round-5 tile-sweep fit put the per-pop FIXED cost at ~0.79 us —
    largely un-hidden DMA wait — which is what extra depth attacks;
    staleness costs extra pops, so depth is 1 on VMEM-resident scenes
    (no DMA to hide) and 2 on the HBM path — set inline at each kernel
    entry point; the sweep evidence is in docs/perf.md.

    select_fn() -> list of k consumed entry ids (-1-padded);
    dma_fn(eid, slot) -> async copy handle; hit_fn(eid, slot) waits and
    intersects. Slots are flight-major: flight slot f in {0..D-1},
    entry j -> buffer slot f*k+j.
    """
    def start_flight(sels, f):
        for j in range(k):
            @pl.when(sels[j] >= 0)
            def _(j=j):
                dma_fn(sels[j], f * k + j).start()

    flights = []
    for f in range(depth):
        sels = select_fn()
        start_flight(sels, f)
        flights.extend(sels)

    def body(state):
        sl = state[-1]
        cur = state[0:k]
        rest = state[k:depth * k]
        for j in range(k):
            @pl.when(cur[j] >= 0)
            def _(j=j):
                hit_fn(cur[j], sl * k + j)
        fn = select_fn()
        start_flight(fn, sl)
        nsl = sl + 1
        return (*rest, *fn, jnp.where(nsl >= depth, 0, nsl))

    jax.lax.while_loop(lambda s: s[0] >= 0, body,
                       (*flights, jnp.int32(0)))


def _win_entry(wc_ref, sel):
    """Window lane id -> global entry id: the window is the GC popped
    chunks whose ids the outer loop wrote to the SMEM scratch `wc_ref`
    (-1-padded); lane sel = j*CHUNK + e lies in chunk wc_ref[j].

    TOTAL function by construction: callers guard their DMA/intersect
    with @pl.when(sel >= 0), but the address feeding a predicated
    region may still be computed, so sel and the chunk id are clamped
    to stay in bounds under speculation."""
    s = jnp.maximum(sel, 0)
    return jnp.maximum(wc_ref[s // CHUNK], 0) * CHUNK + s % CHUNK


def _traverse(instanced, nec, npc, gc, intersect_window,
              ent_inst_ref, inv_ref, ray_ref, aabb_ref, parent_ref,
              epar_ref, e_ref, wc_ref, alive_t, pops_ref=None):
    """Shared two-level ordered traversal with a GC-chunk drain window.

    alive_t() -> (R, 1) per-ray pruning threshold (closest: live
    best-t; anyhit: open shadow distance, 0 once occluded). A box is
    alive iff ANY ray's slab entry beats that ray's threshold; the
    masked minima are recomputed from the LIVE threshold every
    iteration, so pruning tightens as hits land. The outer loop pops
    the GC nearest alive chunks TOGETHER and slab-ranks all their
    entries into one (R, GC*CHUNK) window; the inner loop then drains
    the window in global near-order. A 1-chunk window over-drains: all
    of chunk A's alive entries were intersected before any of chunk
    B's, even when B held nearer geometry, so best-t tightened late
    (measured on the 1M-tri interior, bounce-1 rays: 359 pops/tile
    single-chunk vs 205 ideal; the 4-chunk window recovers most of the
    gap). This is the ordered-stack t-pruning of
    BVH8Traversal.cuh:197-222 at tile granularity.

    intersect_window(cs) drains the current window; per-ray entry
    distances are in e_ref."""
    o = (ray_ref[:, 0:1], ray_ref[:, 1:2], ray_ref[:, 2:3])
    inv = tuple(_safe_inv(ray_ref[:, 3 + a:4 + a]) for a in range(3))
    valid = ray_ref[:, 6:7] > 0.0
    l1 = npc * CHUNK
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, l1), 1)

    for p in range(npc):  # static unroll: one slab pass per parent row
        lo = [parent_ref[p, a:a + 1, :] for a in range(3)]
        hi = [parent_ref[p, 3 + a:4 + a, :] for a in range(3)]
        epar_ref[:, p * CHUNK:(p + 1) * CHUNK] = _slab_row(
            lo, hi, o, inv, valid)

    def outer_body(go):
        thresh = alive_t()
        pm = jnp.where(epar_ref[:] < thresh, epar_ref[:], _INF)
        col = jnp.min(pm, axis=0, keepdims=True)     # (1, l1)
        cs = []
        for _ in range(gc):
            m = jnp.min(col)
            c = jnp.min(jnp.where(col == m, lane1, l1))
            cs.append(jnp.where(m < _BIG, c, -1).astype(jnp.int32))
            col = jnp.where(lane1 == cs[-1], _INF, col)
        found = cs[0] >= 0

        @pl.when(found)
        def _():
            if pops_ref is not None:        # perf diagnostics only
                got = jnp.int32(0)
                for c in cs:
                    got += jnp.where(c >= 0, 1, 0)
                pops_ref[0, 0] += got
            mask = lane1 == cs[0]
            for c in cs[1:]:
                mask = mask | (lane1 == c)
            epar_ref[:] = jnp.where(mask, _INF, epar_ref[:])
            for k, c in enumerate(cs):
                wc_ref[k] = c
                seg = slice(k * CHUNK, (k + 1) * CHUNK)
                # Unconditional slab (padded window slots re-slab chunk
                # 0) + validity mask: a short window's tail segments
                # become inert without branchy partial writes.
                cc = jnp.maximum(c, 0)
                lo = [aabb_ref[pl.ds(cc, 1), a, :] for a in range(3)]
                hi = [aabb_ref[pl.ds(cc, 1), 3 + a, :] for a in range(3)]
                e_ref[:, seg] = jnp.where(
                    c >= 0, _slab_row(lo, hi, o, inv, valid), _INF)

            intersect_window()

        return found

    jax.lax.while_loop(lambda go: go, outer_body, True)


def _closest_kernel(instanced, nec, npc, flight, depth, gc, woop, bpe,
                    stats, vmem,
                    ent_blk_ref, ent_inst_ref, inv_ref,       # SMEM
                    ray_ref, aabb_ref, parent_ref, tri_hbm,   # VMEM/ANY
                    *rest):
    if stats:
        t_ref, slot_ref, inst_ref, pops_all = rest[:4]
        rest = rest[4:]

        _tile_i = pl.program_id(0)    # read once (while-body can't)

        class _Pops:   # whole-array SMEM output; row = this grid step
            def __setitem__(self, idx, v):
                pops_all[_tile_i, idx[1]] = v

            def __getitem__(self, idx):
                return pops_all[_tile_i, idx[1]]
        pops_ref = _Pops()
        pops_ref[0, 0] = 0
        pops_ref[0, 1] = 0
    else:
        t_ref, slot_ref, inst_ref = rest[:3]
        rest = rest[3:]
        pops_ref = None
    if vmem:
        epar_ref, e_ref, wc_ref = rest
        buf = sem = None
    else:
        epar_ref, e_ref, wc_ref, buf, sem = rest
    t_ref[:] = jnp.full(t_ref.shape, MISS_DISTANCE, jnp.float32)
    slot_ref[:] = jnp.full(slot_ref.shape, -1, jnp.int32)
    inst_ref[:] = jnp.zeros(inst_ref.shape, jnp.int32)
    valid = ray_ref[:, 6:7] > 0.0

    @pl.when(jnp.any(valid))
    def _():
        ox, oy, oz = ray_ref[:, 0:1], ray_ref[:, 1:2], ray_ref[:, 2:3]
        dx, dy, dz = ray_ref[:, 3:4], ray_ref[:, 4:5], ray_ref[:, 5:6]
        laneW = jax.lax.broadcasted_iota(jnp.int32, (1, gc * CHUNK), 1)

        def dma(e, sl):
            if vmem:
                return _NoDma()      # resident blocks: nothing to move
            b = ent_blk_ref[e]
            return pltpu.make_async_copy(tri_hbm.at[pl.ds(b, bpe)],
                                         buf.at[sl], sem.at[sl])

        idr = 12 if woop else 9      # id row follows the geometry rows
        isect_fn = _woop_block if woop else _mt_block

        def intersect(eid, sl):
            dma(eid, sl).wait()
            if pops_ref is not None:
                pops_ref[0, 1] += 1
            src = _TriView(tri_hbm, ent_blk_ref[eid]) if vmem else buf
            tox, toy, toz, tdx, tdy, tdz, inst = _entry_rays(
                instanced, inv_ref, ent_inst_ref, eid,
                ox, oy, oz, dx, dy, dz)
            for j in range(bpe):   # static unroll over member blocks;
                #                    best-t tightens between halves
                t_best = t_ref[:]
                t = isect_fn(src, sl, j, tox, toy, toz,
                             tdx, tdy, tdz, t_best)
                t_min = jnp.min(t, axis=1, keepdims=True)
                better = t_min < t_best
                # Winning lane's GLOBAL triangle id from the block's id
                # row (exact-f32): a masked one-lane reduce replaces the
                # host-side to_global gather (which dominated the
                # backward program: 1.9 ms/bounce as a serial gather).
                win = t == t_min
                gid = jnp.max(
                    jnp.where(win, src[sl, j, idr:idr + 1, :], -1.0),
                    axis=1, keepdims=True)
                t_ref[:] = jnp.where(better, t_min, t_best)
                slot_ref[:] = jnp.where(better, gid.astype(jnp.int32),
                                        slot_ref[:])
                if instanced:
                    inst_ref[:] = jnp.where(better, inst, inst_ref[:])

        def intersect_window():
            _pipelined_pops(
                flight, depth,
                lambda: _select(e_ref, t_ref[:], laneW, flight),
                lambda e, sl: dma(_win_entry(wc_ref, e), sl),
                lambda e, sl: intersect(_win_entry(wc_ref, e), sl))

        _traverse(instanced, nec, npc, gc, intersect_window,
                  ent_inst_ref, inv_ref, ray_ref, aabb_ref, parent_ref,
                  epar_ref, e_ref, wc_ref, lambda: t_ref[:], pops_ref)


def _anyhit_kernel(instanced, nec, npc, flight, depth, gc, woop, bpe,
                   vmem,
                   ent_blk_ref, ent_inst_ref, inv_ref,
                   ray_ref, aabb_ref, parent_ref, tri_hbm,
                   hit_ref,
                   epar_ref, e_ref, wc_ref, buf=None, sem=None):
    hit_ref[:] = jnp.zeros(hit_ref.shape, bool)
    valid = ray_ref[:, 6:7] > 0.0
    tmax = ray_ref[:, 7:8]

    @pl.when(jnp.any(valid & (tmax > 0.0)))
    def _():
        ox, oy, oz = ray_ref[:, 0:1], ray_ref[:, 1:2], ray_ref[:, 2:3]
        dx, dy, dz = ray_ref[:, 3:4], ray_ref[:, 4:5], ray_ref[:, 5:6]
        laneW = jax.lax.broadcasted_iota(jnp.int32, (1, gc * CHUNK), 1)

        def cap():
            # Open shadow distance; 0 once a ray is occluded, so a
            # fully occluded tile keeps nothing alive -> early exit.
            return jnp.where(hit_ref[:], 0.0, tmax)

        def dma(e, sl):
            if vmem:
                return _NoDma()
            b = ent_blk_ref[e]
            return pltpu.make_async_copy(tri_hbm.at[pl.ds(b, bpe)],
                                         buf.at[sl], sem.at[sl])

        isect_fn = _woop_block if woop else _mt_block

        def intersect(eid, sl):
            dma(eid, sl).wait()
            src = _TriView(tri_hbm, ent_blk_ref[eid]) if vmem else buf
            tox, toy, toz, tdx, tdy, tdz, _u = _entry_rays(
                instanced, inv_ref, ent_inst_ref, eid,
                ox, oy, oz, dx, dy, dz)
            for j in range(bpe):
                cp = cap()
                t = isect_fn(src, sl, j, tox, toy, toz,
                             tdx, tdy, tdz, cp)
                hit_ref[:] = hit_ref[:] | jnp.any(
                    t < cp, axis=1, keepdims=True)

        def intersect_window():
            _pipelined_pops(
                flight, depth,
                lambda: _select(e_ref, cap(), laneW, flight),
                lambda e, sl: dma(_win_entry(wc_ref, e), sl),
                lambda e, sl: intersect(_win_entry(wc_ref, e), sl))

        _traverse(instanced, nec, npc, gc, intersect_window,
                  ent_inst_ref, inv_ref, ray_ref, aabb_ref, parent_ref,
                  epar_ref, e_ref, wc_ref, cap)


# --------------------------------------------------------------------------
# Host wrappers
# --------------------------------------------------------------------------

def _pack_rays(ray_o, ray_d, t_max, rp):
    """(R,3)x2 + (R,) -> (rp, 8) [o.xyz d.xyz valid tmax], zero-padded
    invalid rows. Rays PARKED at huge origins (the wavefront pipeline
    parks dead lanes at +1e30, render/wavefront.py) are marked invalid;
    the slab pass forces their entry distances to inf, so they keep
    nothing alive — an all-parked tile skips every block."""
    r = ray_o.shape[0]
    parked = jnp.any(jnp.abs(ray_o) >= 1.0e29, axis=1, keepdims=True)
    valid = jnp.where(parked, 0.0, 1.0)
    packed = jnp.concatenate(
        [ray_o, ray_d, valid, t_max[:, None].astype(jnp.float32)], axis=1)
    return jnp.pad(packed, ((0, rp - r), (0, 0)))


def _flight_for(n_entries: int) -> int:
    """Entries selected per pipeline flight. k=1 re-checks every pop
    against the LIVE best-t (zero staleness). Round 4 measured k=2
    better on the 82k blob, but the round-5 re-sweep on real bounce
    rays (benchmarks/ab_tiles.py --flights) shows k=1 winning
    everywhere with the windowed traversal — interior 1M: 138.1 vs
    142.4 ms, bunny 82k: 12.6 vs 13.5 ms (docs/perf.md). The selection
    reduction got cheaper relative to wasted stale pops."""
    return 1


GC_MAX = 4         # chunks per drain window (see _traverse)


def _common_specs(nec, npc, tile_r, flight, gc, rows=10, bpe=1,
                  depth=2, vmem_tris=False):
    smem = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(3)]
    in_specs = smem + [
        pl.BlockSpec((tile_r, 8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        # VMEM-resident tri blocks for small scenes (zero per-pop DMA);
        # HBM + on-demand DMA beyond the budget (_vmem_tris_auto).
        pl.BlockSpec(memory_space=pltpu.VMEM if vmem_tris else pl.ANY),
    ]
    scratch = [pltpu.VMEM((tile_r, npc * CHUNK), jnp.float32),
               pltpu.VMEM((tile_r, gc * CHUNK), jnp.float32),
               pltpu.SMEM((gc,), jnp.int32)]
    if not vmem_tris:
        scratch += [pltpu.VMEM((depth * flight, bpe, rows, CHUNK),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA((depth * flight,))]
    return in_specs, scratch


# VMEM triangle-residency budget: the whole blocked tri array moves
# into VMEM when it fits comfortably beside the traversal scratch
# (~1 MB) inside the ~16 MB/core VMEM. Measured motivation: the
# round-5 tile sweep put the HBM kernel's per-pop cost at ~0.79 us
# FIXED — largely the serial select->DMA->wait dependency — vs 0.21 us
# of (R,128) VPU work; resident blocks delete the DMA leg entirely and
# let selection run with ZERO staleness (depth=1).
VMEM_TRI_BUDGET_BYTES = 6 * 1024 * 1024


def _vmem_tris_auto(bs: "BlockedScene") -> bool:
    return bs.tri.size * 4 <= VMEM_TRI_BUDGET_BYTES


class _TriView:
    """Adapter giving the VMEM-resident tri ref the same 4-axis
    [slot, member, rows, lanes] indexing `_mt_block`/`_woop_block` use
    on the DMA scratch buffer: slot is ignored (there are no buffer
    slots), member j offsets consecutive blocks (blocks_per_entry)."""

    def __init__(self, ref, block):
        self.ref = ref
        self.block = block

    def __getitem__(self, idx):
        _s, j, r, c = idx
        return self.ref[self.block + j, r, c]


class _NoDma:
    def start(self):
        pass

    def wait(self):
        pass


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_r", "flight",
                                    "depth", "vmem_tris"))
def closest_hit_scene(bs: BlockedScene, ray_o, ray_d, interpret=False,
                      tile_r=TILE_R, flight=None, depth=None,
                      vmem_tris=None):
    """Closest hit. Returns (t, tri, inst): tri = GLOBAL triangle id
    (-1 on miss; extracted in-kernel from the block id row), inst =
    instance id (0 for flat scenes).

    vmem_tris (None = auto by `_vmem_tris_auto`): hold the whole
    blocked tri array resident in VMEM — no per-pop DMA, selection at
    zero staleness (flight=1/depth=1)."""
    r = ray_o.shape[0]
    rp = max((r + tile_r - 1) // tile_r, 1) * tile_r
    rays = _pack_rays(ray_o, ray_d,
                      jnp.full((r,), MISS_DISTANCE, jnp.float32), rp)
    nec, npc = bs.aabb.shape[0], bs.parent.shape[0]
    if vmem_tris is None:
        vmem_tris = _vmem_tris_auto(bs)
    # Explicit flight/depth are honored even under VMEM residency (the
    # benchmark sweeps depend on it); only the DEFAULTS collapse to 1/1
    # there — with no DMA to hide, extra flights/depth are pure
    # selection staleness.
    if flight is None:
        flight = 1 if vmem_tris else _flight_for(bs.n_entries)
    if depth is None:
        depth = 1 if vmem_tris else 2
    gc = min(GC_MAX, nec)
    rows = bs.tri.shape[1]
    bpe = bs.blocks_per_entry
    in_specs, scratch = _common_specs(nec, npc, tile_r, flight, gc,
                                      rows, bpe, depth, vmem_tris)
    col = pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    t, slot, inst = pl.pallas_call(
        functools.partial(_closest_kernel, bs.instanced, nec, npc,
                          flight, depth, gc, rows == 13, bpe, False,
                          vmem_tris),
        grid=(rp // tile_r,),
        in_specs=in_specs,
        out_specs=(col, col, col),
        out_shape=(jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((rp, 1), jnp.int32)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(bs.ent_block, bs.ent_inst, bs.inst_inv, rays, bs.aabb, bs.parent,
      bs.tri)
    return t.reshape(rp)[:r], slot.reshape(rp)[:r], inst.reshape(rp)[:r]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_r", "flight",
                                    "depth", "vmem_tris"))
def closest_hit_stats(bs: BlockedScene, ray_o, ray_d, interpret=False,
                      tile_r=TILE_R, flight=None, depth=None,
                      vmem_tris=None):
    """closest_hit_scene + per-tile pop counters (perf diagnostics):
    returns (t, slot, inst, pops) with pops (n_tiles, 2) int32 =
    [chunk pops, entry intersections] per ray tile. Used by
    benchmarks/ to validate the kernel cost model on real workloads."""
    r = ray_o.shape[0]
    rp = max((r + tile_r - 1) // tile_r, 1) * tile_r
    rays = _pack_rays(ray_o, ray_d,
                      jnp.full((r,), MISS_DISTANCE, jnp.float32), rp)
    nec, npc = bs.aabb.shape[0], bs.parent.shape[0]
    if vmem_tris is None:
        vmem_tris = _vmem_tris_auto(bs)
    # Explicit flight/depth are honored even under VMEM residency (the
    # benchmark sweeps depend on it); only the DEFAULTS collapse to 1/1
    # there — with no DMA to hide, extra flights/depth are pure
    # selection staleness.
    if flight is None:
        flight = 1 if vmem_tris else _flight_for(bs.n_entries)
    if depth is None:
        depth = 1 if vmem_tris else 2
    gc = min(GC_MAX, nec)
    rows = bs.tri.shape[1]
    bpe = bs.blocks_per_entry
    in_specs, scratch = _common_specs(nec, npc, tile_r, flight, gc,
                                      rows, bpe, depth, vmem_tris)
    col = pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    t, slot, inst, pops = pl.pallas_call(
        functools.partial(_closest_kernel, bs.instanced, nec, npc,
                          flight, depth, gc, rows == 13, bpe, True,
                          vmem_tris),
        grid=(rp // tile_r,),
        in_specs=in_specs,
        out_specs=(col, col, col,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((rp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((rp // tile_r, 2), jnp.int32)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(bs.ent_block, bs.ent_inst, bs.inst_inv, rays, bs.aabb, bs.parent,
      bs.tri)
    return (t.reshape(rp)[:r], slot.reshape(rp)[:r],
            inst.reshape(rp)[:r], pops)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_r", "flight",
                                    "depth", "vmem_tris"))
def any_hit_scene(bs: BlockedScene, ray_o, ray_d, t_max, interpret=False,
                  tile_r=TILE_R, flight=None, depth=None, vmem_tris=None):
    """Occlusion test (True = some hit with t < t_max)."""
    r = ray_o.shape[0]
    rp = max((r + tile_r - 1) // tile_r, 1) * tile_r
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    rays = _pack_rays(ray_o, ray_d, tm, rp)
    nec, npc = bs.aabb.shape[0], bs.parent.shape[0]
    if vmem_tris is None:
        vmem_tris = _vmem_tris_auto(bs)
    # Explicit flight/depth are honored even under VMEM residency (the
    # benchmark sweeps depend on it); only the DEFAULTS collapse to 1/1
    # there — with no DMA to hide, extra flights/depth are pure
    # selection staleness.
    if flight is None:
        flight = 1 if vmem_tris else _flight_for(bs.n_entries)
    if depth is None:
        depth = 1 if vmem_tris else 2
    gc = min(GC_MAX, nec)
    rows = bs.tri.shape[1]
    bpe = bs.blocks_per_entry
    in_specs, scratch = _common_specs(nec, npc, tile_r, flight, gc,
                                      rows, bpe, depth, vmem_tris)
    hit = pl.pallas_call(
        functools.partial(_anyhit_kernel, bs.instanced, nec, npc,
                          flight, depth, gc, rows == 13, bpe,
                          vmem_tris),
        grid=(rp // tile_r,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 1), bool),
        scratch_shapes=scratch,
        interpret=interpret,
    )(bs.ent_block, bs.ent_inst, bs.inst_inv, rays, bs.aabb, bs.parent,
      bs.tri)
    return hit.reshape(rp)[:r]
