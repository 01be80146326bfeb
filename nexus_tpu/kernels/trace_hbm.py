"""HBM-resident, instance-aware Pallas trace kernels.

The scalable successor to kernels/trace.py (which keeps every triangle
block as a whole-array VMEM operand and culls per-RAY — O(rays x blocks)
work and O(scene) VMEM; fine to ~10k tris, impossible at 1M). This
kernel is the TPU re-design of the reference's hierarchical traversal
(Nexus/src/Cuda/BVH/BVH8Traversal.cuh:148-322, incl. the TLAS->BLAS
instance transition at l.234-267):

  GPU reference                      TPU kernel (this file)
  ---------------------------------  ---------------------------------
  per-thread CWBVH stack walk        per-TILE conservative interval
                                     cull of block AABBs (one vector op
                                     over ALL blocks, no per-ray work)
  node fetch via __ldg               triangle blocks DMA'd HBM->VMEM on
                                     demand, double-buffered; VMEM holds
                                     O(tile), never O(scene)
  ordered stack + t-pruning          nearest-entry-first extraction per
                                     chunk + per-ray best-t pruning
                                     (pop() skips every block whose
                                     conservative entry >= the tile's
                                     worst best-hit)
  TLAS leaf: transform ray into      per-ENTRY instance id: the tile's
  object space (cuh:246-249)         rays are transformed by the
                                     instance inverse before the 128-wide
                                     intersection; t is space-invariant
                                     because the direction is NOT
                                     renormalized (same convention as
                                     accel/traverse_tlas.py)

Memory layout (host-built by `build_blocked_flat` / `build_blocked_tlas`):

  tri   (NBG, 9, 128) f32   HBM   one 128-triangle block per row, SAH
                                  (DFS) order per BLAS; rows are
                                  ax,ay,az,bx,by,bz,cx,cy,cz. Blocks are
                                  SHARED between instances of one BLAS —
                                  the instancing memory win survives.
  aabb  (NEC, 8, 128) f32   VMEM  WORLD-space AABBs of the (block,
                                  instance) entries, 128 per chunk, rows
                                  bmin.xyz / bmax.xyz / pad. ~32 B per
                                  128 triangles: 1M tris = 250 KB.
  ent_block/ent_inst (NE,)  SMEM  entry -> global block / instance id.
  inst_inv (NI, 12)  f32    SMEM  world->object affine per instance.

A "tile" is TILE_R consecutive rays (the wavefront sorts lanes by
(dead, octant) so tiles are directionally coherent). The cull is
CONSERVATIVE interval arithmetic over the tile's realized ray bounds
(min/max of origin and 1/d component-wise): every block any tile ray
could hit tests positive; false positives only cost extra intersection
work, never correctness. Dead tiles (no valid ray) skip everything.

Cost model: cull is one (NEC, 128)-shaped vector pass per tile —
rays x tris / (TILE_R*128) slab tests, ~40,000x less than brute force —
and intersection touches only blocks whose entry beats the tile's
current worst hit, so kernel time grows with LOCAL geometric complexity,
not scene size (measured in benchmarks/scaling_tris.py).
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
TILE_R = 256       # rays per grid step (sweep on v5e: 256 beats 128/512
#                    at both 100k and 1M tris; benchmarks/scaling_tris.py)
BATCH = 4          # triangle blocks popped/DMA'd/intersected per loop
#                    iteration: the serial pop->DMA->wait->MT loop is
#                    latency-bound (~5us/block on v5e), so K blocks per
#                    iteration amortize the scalar machinery and keep K
#                    DMAs in flight per buffer half
_INF = 3.0e38
_BIG = 1.0e37


@flax.struct.dataclass
class BlockedScene:
    """Blocked triangle layout + (block, instance) entry table."""
    tri: jnp.ndarray        # (NBG, 9, 128) f32, HBM-resident
    aabb: jnp.ndarray       # (NEC, 8, 128) f32 world entry AABBs
    ent_block: jnp.ndarray  # (NEC*128,) int32 entry -> block id
    ent_inst: jnp.ndarray   # (NEC*128,) int32 entry -> instance id
    inst_inv: jnp.ndarray   # (NI, 12) f32 world->object affines
    to_global: jnp.ndarray  # (NBG*128,) int32 block slot -> global tri id
    n_entries: int = flax.struct.field(pytree_node=False, default=0)
    instanced: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def n_blocks(self) -> int:
        return self.tri.shape[0]


def _block_tris(v0, v1, v2, order):
    """(N,3)x3 + DFS order -> ((NB,9,128) blocks, (NB,6) object AABBs,
    (NB*128,) to_global). Padding repeats the last triangle's v0 as a
    degenerate point-triangle (Moller-Trumbore rejects det=0)."""
    n = order.shape[0]
    nb = max((n + CHUNK - 1) // CHUNK, 1)
    pad = nb * CHUNK - n
    vo = [np.asarray(v, np.float32)[order] for v in (v0, v1, v2)]
    fill = np.repeat(vo[0][-1:], pad, axis=0)
    b0 = np.concatenate([vo[0], fill]).reshape(nb, CHUNK, 3)
    b1 = np.concatenate([vo[1], fill]).reshape(nb, CHUNK, 3)
    b2 = np.concatenate([vo[2], fill]).reshape(nb, CHUNK, 3)
    tri = np.stack([b0[..., 0], b0[..., 1], b0[..., 2],
                    b1[..., 0], b1[..., 1], b1[..., 2],
                    b2[..., 0], b2[..., 1], b2[..., 2]], axis=1)
    lo = np.minimum(np.minimum(b0, b1), b2).min(axis=1)
    hi = np.maximum(np.maximum(b0, b1), b2).max(axis=1)
    to_global = np.concatenate(
        [order.astype(np.int32),
         np.full(pad, order[-1], np.int32)])
    return (np.ascontiguousarray(tri),
            np.concatenate([lo, hi], axis=1), to_global)


def _pack_entries(world_lo, world_hi, ent_block, ent_inst):
    """Morton-sort entries by AABB center, pad to a CHUNK multiple with
    never-hit inverted boxes, and transpose into (NEC, 8, 128) chunks."""
    ne = ent_block.shape[0]
    center = 0.5 * (world_lo + world_hi)
    span = center.max(axis=0) - center.min(axis=0)
    q = ((center - center.min(axis=0)) /
         np.maximum(span, 1e-20) * 1023.0).astype(np.uint64)

    def spread(x):  # interleave bits (10 -> 30)
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    perm = np.argsort(morton, kind="stable")
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
    zpad = np.zeros(pad, np.int32)
    return (aabb,
            np.concatenate([ent_block.astype(np.int32), zpad]),
            np.concatenate([ent_inst.astype(np.int32), zpad]), ne)


def build_blocked_flat(v0, v1, v2, order) -> BlockedScene:
    """Flat world-space scene: one entry per block, identity instance."""
    order = np.asarray(order, np.int32)
    tri, oaabb, to_global = _block_tris(v0, v1, v2, order)
    nb = tri.shape[0]
    ids = np.arange(nb, dtype=np.int32)
    aabb, ent_block, ent_inst, ne = _pack_entries(
        oaabb[:, :3].astype(np.float32), oaabb[:, 3:].astype(np.float32),
        ids, np.zeros(nb, np.int32))
    eye = np.concatenate([np.eye(3, dtype=np.float32),
                          np.zeros((3, 1), np.float32)], axis=1)
    return BlockedScene(
        tri=jnp.asarray(tri), aabb=jnp.asarray(aabb),
        ent_block=jnp.asarray(ent_block), ent_inst=jnp.asarray(ent_inst),
        inst_inv=jnp.asarray(eye.reshape(1, 12)),
        to_global=jnp.asarray(to_global),
        n_entries=ne, instanced=False)


def build_blocked_tlas(tl) -> BlockedScene:
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
    blas_ids = sorted(set(int(b) for b in inst_blas))
    block_base, tris, oaabbs, to_globals = {}, [], [], []
    nbg = 0
    for b in blas_ids:
        i = int(np.nonzero(inst_blas == b)[0][0])
        off, nt = int(inst_off[i]), int(inst_ntris[i])
        order = tri_order[off:off + nt]  # global tri ids, BLAS DFS order
        tri, oaabb, tg = _block_tris(v0[order], v1[order], v2[order],
                                     np.arange(nt, dtype=np.int32))
        block_base[b] = nbg
        nbg += tri.shape[0]
        tris.append(tri)
        oaabbs.append(oaabb)
        to_globals.append(order[tg].astype(np.int32))

    # Entries: every (instance, block-of-its-BLAS) pair.
    ent_block, ent_inst, wlo, whi = [], [], [], []
    for i in range(inst_blas.shape[0]):
        b = int(inst_blas[i])
        oa = oaabbs[blas_ids.index(b)]
        lo, hi = oa[:, :3], oa[:, 3:]
        # 8 corners of each block box through the instance transform.
        m = inst_m[i]
        corners = np.stack([np.where(
            np.array([(k >> a) & 1 for a in range(3)], bool), hi, lo)
            for k in range(8)], axis=1)             # (nb, 8, 3)
        w = corners @ m[:, :3].T + m[:, 3]
        nb = oa.shape[0]
        ent_block.append(np.arange(nb, dtype=np.int32) + block_base[b])
        ent_inst.append(np.full(nb, i, np.int32))
        wlo.append(w.min(axis=1).astype(np.float32))
        whi.append(w.max(axis=1).astype(np.float32))

    aabb, eb, ei, ne = _pack_entries(
        np.concatenate(wlo), np.concatenate(whi),
        np.concatenate(ent_block), np.concatenate(ent_inst))
    return BlockedScene(
        tri=jnp.asarray(np.concatenate(tris)), aabb=jnp.asarray(aabb),
        ent_block=jnp.asarray(eb), ent_inst=jnp.asarray(ei),
        inst_inv=jnp.asarray(np.asarray(tl.inst_inv).reshape(-1, 12)),
        to_global=jnp.asarray(np.concatenate(to_globals)),
        n_entries=ne, instanced=True)


# --------------------------------------------------------------------------
# Kernel internals
# --------------------------------------------------------------------------

def _safe_inv(d):
    tiny = 1.0e-12
    d = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / d


def _tile_bounds(ray_ref, valid):
    """Conservative per-tile ray-bundle bounds (a few scalars):

      - realized min/max of origin and 1/direction per component (feeds
        the interval slab test);
      - a bounding CONE of the directions (mean axis + min cosine) and
        a bounding sphere of the origins (feeds the packet frustum-cull
        analog — slab intervals degenerate when a direction component
        straddles zero, the cone does not).
    """
    lo, hi = [], []
    for c in range(3):
        o = ray_ref[:, c:c + 1]
        lo.append(jnp.min(jnp.where(valid, o, _BIG)))
        hi.append(jnp.max(jnp.where(valid, o, -_BIG)))
    ilo, ihi = [], []
    for c in range(3):
        iv = _safe_inv(ray_ref[:, 3 + c:4 + c])
        ilo.append(jnp.min(jnp.where(valid, iv, _BIG)))
        ihi.append(jnp.max(jnp.where(valid, iv, -_BIG)))
    # Direction cone: axis = normalized mean of unit directions,
    # cos = min over rays of d.axis (<= 0 disables the cone cull).
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    mean_d = [jnp.sum(jnp.where(valid, ray_ref[:, 3 + c:4 + c], 0.0))
              / n_valid for c in range(3)]
    norm = jnp.sqrt(mean_d[0] ** 2 + mean_d[1] ** 2 + mean_d[2] ** 2)
    safe = jnp.maximum(norm, 1e-6)
    axis = [m / safe for m in mean_d]
    dots = (axis[0] * ray_ref[:, 3:4] + axis[1] * ray_ref[:, 4:5]
            + axis[2] * ray_ref[:, 5:6])
    cos_cone = jnp.min(jnp.where(valid, dots, _BIG))
    cos_cone = jnp.where(norm < 1e-6, -1.0, jnp.clip(cos_cone, -1.0, 1.0))
    # Origin bounding sphere.
    oc = [0.5 * (lo[c] + hi[c]) for c in range(3)]
    r_o = 0.5 * jnp.sqrt((hi[0] - lo[0]) ** 2 + (hi[1] - lo[1]) ** 2
                         + (hi[2] - lo[2]) ** 2)
    return (lo, hi, ilo, ihi), (oc, r_o, axis, cos_cone)


def _cull_entries(aabb_ref, bounds):
    """Tile-bundle cull of every entry AABB in ONE batched vector pass
    over (NEC, 128) rows — the tile-granular ChildTrace analog
    (BVH8Traversal.cuh:55-146). Two conservative tests are ANDed:

      1. interval-arithmetic slab test over realized origin/inv-dir
         bounds (exact-ish for axis-aligned separation);
      2. direction-cone vs block-bounding-sphere test (packet frustum
         culling; catches radial separation the slabs cannot express
         when a direction component straddles zero).

    Returns conservative entry distances: max(slab entry, radial
    distance |center-origin| - radii) where possibly hit, +inf where
    provably missed. The radial term is what makes per-ray best-t
    pruning effective (it is a true lower bound on any hit t since
    directions are unit length)."""
    (ol, oh, il, ih), (oc, r_o, axis, cos_cone) = bounds

    def slab(p, a):  # interval of (p - o) * inv for axis a
        a1 = p - ol[a]
        a2 = p - oh[a]
        q1, q2 = a1 * il[a], a1 * ih[a]
        q3, q4 = a2 * il[a], a2 * ih[a]
        return (jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4)),
                jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4)))

    tmin_lo = jnp.full(aabb_ref.shape[:1] + (CHUNK,), -_BIG, jnp.float32)
    tmax_hi = jnp.full(aabb_ref.shape[:1] + (CHUNK,), _BIG, jnp.float32)
    for a in range(3):
        n_lo, n_hi = slab(aabb_ref[:, a, :], a)
        f_lo, f_hi = slab(aabb_ref[:, 3 + a, :], a)
        tmin_lo = jnp.maximum(tmin_lo, jnp.minimum(n_lo, f_lo))
        tmax_hi = jnp.minimum(tmax_hi, jnp.maximum(n_hi, f_hi))
    hit = (tmax_hi >= tmin_lo) & (tmax_hi > 0.0)

    # Cone-vs-bounding-sphere test. p = block center relative to the
    # origin-sphere center; a block survives unless its bounding sphere
    # (radius r_b + origin radius r_o) lies strictly outside the
    # direction cone or strictly behind the origins.
    p, e2, r2 = [], 0.0, 0.0
    for a in range(3):
        c = 0.5 * (aabb_ref[:, a, :] + aabb_ref[:, 3 + a, :])
        half = 0.5 * (aabb_ref[:, 3 + a, :] - aabb_ref[:, a, :])
        p.append(c - oc[a])
        e2 = e2 + half * half
        r2 = r2 + p[a] * p[a]
    r_tot = jnp.sqrt(jnp.maximum(e2, 0.0)) + r_o
    dist = jnp.sqrt(jnp.maximum(r2, 0.0))
    proj = p[0] * axis[0] + p[1] * axis[1] + p[2] * axis[2]
    perp = jnp.sqrt(jnp.maximum(r2 - proj * proj, 0.0))
    sin_cone = jnp.sqrt(jnp.maximum(1.0 - cos_cone * cos_cone, 0.0))
    # Signed distance from the block sphere to the cone boundary
    # (exact in front of the apex, an underestimate behind it — both
    # conservative). Only applied when the cone is proper (cos > 0).
    outside_cone = (perp * cos_cone - proj * sin_cone > r_tot) \
        & (cos_cone > 0.0)
    behind = proj < -r_tot
    # Padding entries carry inverted boxes whose half-extent overflows
    # to +inf; interval slabs cannot reject an inverted box (the
    # corner-product bounds span everything), so reject on radius.
    degenerate = r_tot >= _BIG
    hit = hit & ~outside_cone & ~behind & ~degenerate

    # Conservative entry distance: the slab entry and the radial lower
    # bound |center - origin| - radii are both true lower bounds on any
    # ray's hit parameter (directions are unit length).
    entry = jnp.maximum(jnp.maximum(tmin_lo, dist - r_tot), 0.0)
    return jnp.where(hit, entry, _INF)


def _make_pop(lo_ref, nec):
    """Entry iterator: pop() yields the next candidate entry id (or -1),
    nearest-conservative-entry first within each chunk, skipping every
    entry whose entry distance >= t_worst (per-ray best-hit pruning at
    tile granularity — the t-pruning of an ordered stack walk)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def advance(c, cand, t_worst):
        def cond(s):
            cc, cv = s
            return jnp.logical_and(cc < nec, jnp.min(cv) >= t_worst)

        def body(s):
            cc, _ = s
            cc = cc + 1
            nv = jax.lax.select(
                cc < nec,
                lo_ref[pl.ds(jnp.minimum(cc, nec - 1), 1), :],
                jnp.full((1, CHUNK), _INF, jnp.float32))
            return cc, nv

        return jax.lax.while_loop(cond, body, (c, cand))

    def pop(c, cand, t_worst):
        c, cand = advance(c, cand, t_worst)
        mn = jnp.min(cand)
        got = jnp.logical_and(c < nec, mn < t_worst)
        sel = jnp.min(jnp.where(cand == mn, lane, CHUNK))
        e = jnp.where(got, c * CHUNK + sel, -1)
        cand = jnp.where(lane == sel, _INF, cand)
        return e, c, cand

    return pop


def _mt_block(buf, s, ox, oy, oz, dx, dy, dz, t_cap):
    """Masked Moller-Trumbore: (TILE_R, 1) ray columns vs the 128-lane
    triangle block in buf[s] -> (TILE_R, CHUNK) t (miss = MISS_DISTANCE).
    (D_Triangle::Trace semantics, Nexus/src/Cuda/Geometry/Triangle.cuh:
    53-87; degenerate padding triangles yield det=0 -> rejected.)"""
    ax = buf[s, 0:1, :]
    ay = buf[s, 1:2, :]
    az = buf[s, 2:3, :]
    e0x = buf[s, 3:4, :] - ax
    e0y = buf[s, 4:5, :] - ay
    e0z = buf[s, 5:6, :] - az
    e1x = buf[s, 6:7, :] - ax
    e1y = buf[s, 7:8, :] - ay
    e1z = buf[s, 8:9, :] - az
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


def _pop_batch(pop, c, cand, t_worst):
    """Pop up to BATCH entries (front-packed; -1 once exhausted)."""
    es = []
    for _ in range(BATCH):
        e, c, cand = pop(c, cand, t_worst)
        es.append(e)
    return jnp.stack(es), c, cand


def _closest_kernel(instanced, nec,
                    ent_blk_ref, ent_inst_ref, inv_ref,   # SMEM
                    ray_ref, aabb_ref, tri_hbm,           # VMEM/VMEM/HBM
                    t_ref, slot_ref, inst_ref,            # outputs
                    lo_ref, buf, sem):                    # scratch
    t_ref[:] = jnp.full(t_ref.shape, MISS_DISTANCE, jnp.float32)
    slot_ref[:] = jnp.full(slot_ref.shape, -1, jnp.int32)
    inst_ref[:] = jnp.zeros(inst_ref.shape, jnp.int32)
    valid = ray_ref[:, 6:7] > 0.0

    @pl.when(jnp.any(valid))
    def _():
        lo_ref[:] = _cull_entries(aabb_ref, _tile_bounds(ray_ref, valid))
        pop = _make_pop(lo_ref, nec)
        ox, oy, oz = ray_ref[:, 0:1], ray_ref[:, 1:2], ray_ref[:, 2:3]
        dx, dy, dz = ray_ref[:, 3:4], ray_ref[:, 4:5], ray_ref[:, 5:6]
        laneT = jax.lax.broadcasted_iota(jnp.int32, (t_ref.shape[0], CHUNK),
                                         1)

        def dma(e, s, k):
            b = ent_blk_ref[e]
            return pltpu.make_async_copy(tri_hbm.at[b], buf.at[s, k],
                                         sem.at[s, k])

        es0, c0, cand0 = _pop_batch(pop, jnp.int32(0),
                                    lo_ref[pl.ds(0, 1), :], _INF)
        for k in range(BATCH):
            @pl.when(es0[k] >= 0)
            def _(k=k):
                dma(es0[k], 0, k).start()

        def cond(s):
            return s[0][0] >= 0

        def body(s):
            es_cur, sl, c, cand = s
            t_worst = jnp.max(jnp.where(valid, t_ref[:], 0.0))
            es_nxt, c, cand = _pop_batch(pop, c, cand, t_worst)
            for k in range(BATCH):
                @pl.when(es_nxt[k] >= 0)
                def _(k=k):
                    dma(es_nxt[k], 1 - sl, k).start()

            for k in range(BATCH):
                @pl.when(es_cur[k] >= 0)
                def _(k=k):
                    e_cur = es_cur[k]
                    dma(e_cur, sl, k).wait()
                    t_best = t_ref[:]
                    tox, toy, toz, tdx, tdy, tdz, inst = _entry_rays(
                        instanced, inv_ref, ent_inst_ref, e_cur,
                        ox, oy, oz, dx, dy, dz)
                    t = _mt_block(buf.at[sl], k, tox, toy, toz,
                                  tdx, tdy, tdz, t_best)
                    t_min = jnp.min(t, axis=1, keepdims=True)
                    kk = jnp.min(jnp.where(t == t_min, laneT, CHUNK),
                                 axis=1, keepdims=True)
                    better = t_min < t_best
                    b = ent_blk_ref[e_cur]
                    t_ref[:] = jnp.where(better, t_min, t_best)
                    slot_ref[:] = jnp.where(better, b * CHUNK + kk,
                                            slot_ref[:])
                    if instanced:
                        inst_ref[:] = jnp.where(better, inst, inst_ref[:])
            return es_nxt, 1 - sl, c, cand

        jax.lax.while_loop(cond, body, (es0, jnp.int32(0), c0, cand0))


def _anyhit_kernel(instanced, nec,
                   ent_blk_ref, ent_inst_ref, inv_ref,
                   ray_ref, aabb_ref, tri_hbm,
                   hit_ref,
                   lo_ref, buf, sem):
    hit_ref[:] = jnp.zeros(hit_ref.shape, bool)
    valid = ray_ref[:, 6:7] > 0.0
    tmax = ray_ref[:, 7:8]

    @pl.when(jnp.any(valid & (tmax > 0.0)))
    def _():
        lo_ref[:] = _cull_entries(aabb_ref, _tile_bounds(ray_ref, valid))
        pop = _make_pop(lo_ref, nec)
        ox, oy, oz = ray_ref[:, 0:1], ray_ref[:, 1:2], ray_ref[:, 2:3]
        dx, dy, dz = ray_ref[:, 3:4], ray_ref[:, 4:5], ray_ref[:, 5:6]

        def dma(e, s, k):
            b = ent_blk_ref[e]
            return pltpu.make_async_copy(tri_hbm.at[b], buf.at[s, k],
                                         sem.at[s, k])

        def t_open():
            # Worst open shadow distance; 0 once every valid ray is
            # occluded, which makes pop() return -1 -> early exit.
            return jnp.max(jnp.where(valid & ~hit_ref[:], tmax, 0.0))

        es0, c0, cand0 = _pop_batch(pop, jnp.int32(0),
                                    lo_ref[pl.ds(0, 1), :], t_open())
        for k in range(BATCH):
            @pl.when(es0[k] >= 0)
            def _(k=k):
                dma(es0[k], 0, k).start()

        def cond(s):
            return s[0][0] >= 0

        def body(s):
            es_cur, sl, c, cand = s
            es_nxt, c, cand = _pop_batch(pop, c, cand, t_open())
            for k in range(BATCH):
                @pl.when(es_nxt[k] >= 0)
                def _(k=k):
                    dma(es_nxt[k], 1 - sl, k).start()

            for k in range(BATCH):
                @pl.when(es_cur[k] >= 0)
                def _(k=k):
                    e_cur = es_cur[k]
                    dma(e_cur, sl, k).wait()
                    tox, toy, toz, tdx, tdy, tdz, _ = _entry_rays(
                        instanced, inv_ref, ent_inst_ref, e_cur,
                        ox, oy, oz, dx, dy, dz)
                    cap = jnp.where(hit_ref[:], 0.0, tmax)
                    t = _mt_block(buf.at[sl], k, tox, toy, toz,
                                  tdx, tdy, tdz, cap)
                    hit_ref[:] = hit_ref[:] | jnp.any(t < cap, axis=1,
                                                      keepdims=True)
            return es_nxt, 1 - sl, c, cand

        jax.lax.while_loop(cond, body, (es0, jnp.int32(0), c0, cand0))


# --------------------------------------------------------------------------
# Host wrappers
# --------------------------------------------------------------------------

def _pack_rays(ray_o, ray_d, t_max, rp):
    """(R,3)x2 + (R,) -> (rp, 8) [o.xyz d.xyz valid tmax], zero-padded
    invalid rows. Rays PARKED at huge origins (the wavefront pipeline
    parks dead lanes at +1e30, render/wavefront.py) are marked invalid
    so they cannot blow up the tile's conservative bounds — an
    all-parked tile skips every block. Directions must be unit length
    (the radial entry bound assumes |d| == 1)."""
    r = ray_o.shape[0]
    parked = jnp.any(jnp.abs(ray_o) >= 1.0e29, axis=1, keepdims=True)
    valid = jnp.where(parked, 0.0, 1.0)
    packed = jnp.concatenate(
        [ray_o, ray_d, valid, t_max[:, None].astype(jnp.float32)], axis=1)
    return jnp.pad(packed, ((0, rp - r), (0, 0)))


def _common_specs(nec, tile_r):
    smem = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(3)]
    in_specs = smem + [
        pl.BlockSpec((tile_r, 8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [pltpu.VMEM((nec, CHUNK), jnp.float32),
               pltpu.VMEM((2, BATCH, 9, CHUNK), jnp.float32),
               pltpu.SemaphoreType.DMA((2, BATCH))]
    return in_specs, scratch


@functools.partial(jax.jit, static_argnames=("interpret", "tile_r"))
def closest_hit_scene(bs: BlockedScene, ray_o, ray_d, interpret=False,
                      tile_r=TILE_R):
    """Closest hit. Returns (t, slot, inst): slot = block*128 + lane
    (-1 on miss; map through bs.to_global for the global triangle id),
    inst = instance id (0 for flat scenes)."""
    r = ray_o.shape[0]
    rp = max((r + tile_r - 1) // tile_r, 1) * tile_r
    rays = _pack_rays(ray_o, ray_d,
                      jnp.full((r,), MISS_DISTANCE, jnp.float32), rp)
    nec = bs.aabb.shape[0]
    in_specs, scratch = _common_specs(nec, tile_r)
    col = pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    t, slot, inst = pl.pallas_call(
        functools.partial(_closest_kernel, bs.instanced, nec),
        grid=(rp // tile_r,),
        in_specs=in_specs,
        out_specs=(col, col, col),
        out_shape=(jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((rp, 1), jnp.int32)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(bs.ent_block, bs.ent_inst, bs.inst_inv, rays, bs.aabb, bs.tri)
    return t.reshape(rp)[:r], slot.reshape(rp)[:r], inst.reshape(rp)[:r]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_r"))
def any_hit_scene(bs: BlockedScene, ray_o, ray_d, t_max, interpret=False,
                  tile_r=TILE_R):
    """Occlusion test (True = some hit with t < t_max)."""
    r = ray_o.shape[0]
    rp = max((r + tile_r - 1) // tile_r, 1) * tile_r
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    rays = _pack_rays(ray_o, ray_d, tm, rp)
    nec = bs.aabb.shape[0]
    in_specs, scratch = _common_specs(nec, tile_r)
    hit = pl.pallas_call(
        functools.partial(_anyhit_kernel, bs.instanced, nec),
        grid=(rp // tile_r,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 1), bool),
        scratch_shapes=scratch,
        interpret=interpret,
    )(bs.ent_block, bs.ent_inst, bs.inst_inv, rays, bs.aabb, bs.tri)
    return hit.reshape(rp)[:r]
