"""Pallas TPU trace kernels: shortlist-driven block intersection.

The performance core (the reference's BVH8Trace / BVH8TraceShadow,
Nexus/src/Cuda/BVH/BVH8Traversal.cuh:148-518, re-designed for the TPU
execution model rather than ported):

  GPU reference                      TPU kernel (this file)
  ---------------------------------  ---------------------------------
  per-thread stack traversal         NO per-lane traversal state at all
  warp-coherent node fetches         dense (TILE_R x 128) vector ops
  atomicAdd dynamic ray fetch        grid over fixed ray tiles
  near-first child ordering          per-tile NEAR-TO-FAR block
                                     shortlist (scalar prefetch)
  per-lane triangle postponement     whole-tile BLOCK SKIP (@pl.when)

Triangles are grouped into blocks of 128 in SAH-builder order
(bvh2.tri_order — consecutive triangles are spatial neighbors, the same
locality the CWBVH leaves encode), each block carrying its AABB.

Two phases per trace:
  1. CULL (XLA, vectorized): slab-test every ray against every block
     AABB, reduce per ray tile → the tile's hit blocks sorted
     near-to-far by entry distance (`_tile_shortlists`).
  2. INTERSECT (Pallas): the shortlist rides in as scalar-prefetch SMEM
     operands; each grid step walks ONLY its tile's blocks, nearest
     first, runs the 128-wide masked Möller–Trumbore, and terminates
     early once every ray's best hit is nearer than the next block's
     entry (the TPU analog of ordered stack traversal + t-pruning).

Rays live along sublanes (TILE_R rows), triangles along lanes (128 per
block), so the kernel issues ZERO gathers — per-lane dynamic indexing
is the one primitive this hardware lacks (XLA-level gathers cost ~35us
per (65k,) fetch — measured), while an entire masked intersection block
is pure VPU work.

The layout is built host-side by `block_triangles`; t/u/v returned by
the kernel are refined analytically outside (same differentiability
contract as accel/traverse2.closest_hit).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nexus_tpu.geom.types import MISS_DISTANCE

CHUNK = 128      # triangles per block (lane width)
TILE_R = 512     # rays per grid step (sublane-major columns)
_LANES = 128


@flax.struct.dataclass
class BlockedTris:
    """Blocked triangle layout + block AABBs (device pytree)."""
    # (NB, CHUNK) float32 triangle components, SAH order, padded with
    # degenerate point-triangles (v0=v1=v2 — Möller–Trumbore rejects).
    ax: jnp.ndarray
    ay: jnp.ndarray
    az: jnp.ndarray
    bx: jnp.ndarray
    by: jnp.ndarray
    bz: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    cz: jnp.ndarray
    aabb: jnp.ndarray        # (NB, 8) f32: bmin xyz, bmax xyz, pad
    to_global: jnp.ndarray   # (NB*CHUNK,) int32 blocked slot -> tri id
    n_blocks: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def vmem_bytes(self) -> int:
        return self.n_blocks * CHUNK * 4 * 9 + self.n_blocks * 32


def block_triangles(v0, v1, v2, order=None) -> BlockedTris:
    """Host-side blocking. `order` (e.g. bvh2.tri_order) gives spatial
    coherence; identity if None."""
    import numpy as np

    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    n = v0.shape[0]
    if order is None:
        order = np.arange(n, dtype=np.int32)
    order = np.asarray(order, np.int32)
    nb = max((n + CHUNK - 1) // CHUNK, 1)
    pad = nb * CHUNK - n

    def blk(v):
        vo = v[order]
        # Degenerate padding: all three vertices at the last real vertex.
        fill = np.repeat(vo[-1:], pad, axis=0)
        return np.concatenate([vo, fill]).reshape(nb, CHUNK, 3)

    b0, b1, b2 = blk(v0), blk(v1), blk(v2)
    bmin = np.minimum(np.minimum(b0, b1), b2).min(axis=1)
    bmax = np.maximum(np.maximum(b0, b1), b2).max(axis=1)
    aabb = np.zeros((nb, 8), np.float32)
    aabb[:, 0:3] = bmin
    aabb[:, 3:6] = bmax
    to_global = np.concatenate(
        [order, np.zeros(pad, np.int32)]).astype(np.int32)
    return BlockedTris(
        ax=jnp.asarray(b0[..., 0]), ay=jnp.asarray(b0[..., 1]),
        az=jnp.asarray(b0[..., 2]),
        bx=jnp.asarray(b1[..., 0]), by=jnp.asarray(b1[..., 1]),
        bz=jnp.asarray(b1[..., 2]),
        cx=jnp.asarray(b2[..., 0]), cy=jnp.asarray(b2[..., 1]),
        cz=jnp.asarray(b2[..., 2]),
        aabb=jnp.asarray(aabb), to_global=jnp.asarray(to_global),
        n_blocks=nb)


def _mt_block(tri_refs, b, ox, oy, oz, dx, dy, dz, t_cap):
    """Masked Möller–Trumbore of ray column-vectors (TILE_R, 1) against
    triangle block b (lane row (CHUNK,)) → (TILE_R, CHUNK) t and valid.
    (D_Triangle::Trace semantics, Triangle.cuh:53-87.)"""
    axr, ayr, azr, bxr, byr, bzr, cxr, cyr, czr = tri_refs
    ax = axr[b, :][None, :]
    ay = ayr[b, :][None, :]
    az = azr[b, :][None, :]
    e0x = bxr[b, :][None, :] - ax
    e0y = byr[b, :][None, :] - ay
    e0z = bzr[b, :][None, :] - az
    e1x = cxr[b, :][None, :] - ax
    e1y = cyr[b, :][None, :] - ay
    e1z = czr[b, :][None, :] - az
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


def _safe_inv(d):
    tiny = 1.0e-12
    d = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / d


def _tile_shortlists(aabb, ray_o, ray_d, t_cap):
    """Phase 1 (XLA): per-tile block shortlist, sorted near-to-far.

    The vectorized replacement for per-step stack traversal: every ray
    slab-tests every block AABB; a tile's shortlist is the blocks ANY of
    its rays enters, ordered by the tile's nearest entry distance (the
    CWBVH octant-ordered hit-mask analog, BVH8Traversal.cuh:55-146).

    Args are padded to a TILE_R multiple. t_cap is the per-ray maximum
    distance (MISS_DISTANCE for closest-hit). Returns
    (ids (nT, NB) int32, tmin (nT, NB) f32 sorted, counts (nT,) int32);
    entries past counts[i] hold tmin=+inf.
    """
    rp = ray_o.shape[0]
    n_tiles = rp // TILE_R
    nb = aabb.shape[0]
    bmin = aabb[:, 0:3]   # (NB, 3)
    bmax = aabb[:, 3:6]
    inv = _safe_inv(ray_d)

    def group_fn(args):
        o_t, inv_t, tc = args        # (G, TILE_R, 3) ... (G, TILE_R)
        t1 = (bmin[None, None] - o_t[..., None, :]) * inv_t[..., None, :]
        t2 = (bmax[None, None] - o_t[..., None, :]) * inv_t[..., None, :]
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)  # (G, TILE_R, NB)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < tc[..., None])
        entry = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
        return jnp.min(entry, axis=1)                 # (G, NB)

    args = (ray_o.reshape(n_tiles, TILE_R, 3),
            inv.reshape(n_tiles, TILE_R, 3),
            t_cap.reshape(n_tiles, TILE_R))
    # Bound the (G, TILE_R, NB, 3) intermediate to ~50 MB: small scenes
    # cull in ONE vector op; big ones loop over tile groups.
    g = max(1, min(n_tiles, 4_000_000 // max(TILE_R * nb, 1)))
    if g == n_tiles:
        tmins = group_fn(args)
    else:
        n_grp = (n_tiles + g - 1) // g
        pad = n_grp * g - n_tiles
        args = jax.tree.map(
            lambda a: jnp.pad(
                a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                constant_values=1.0e30
            ).reshape((n_grp, g) + a.shape[1:]), args)
        tmins = jax.lax.map(group_fn, args).reshape(
            n_grp * g, nb)[:n_tiles]
    order = jnp.argsort(tmins, axis=1).astype(jnp.int32)
    tmin_sorted = jnp.take_along_axis(tmins, order, axis=1)
    counts = jnp.sum(jnp.isfinite(tmins), axis=1).astype(jnp.int32)
    return order, tmin_sorted, counts


def _closest_kernel(n_blocks,
                    ids_ref, tmin_ref, cnt_ref,   # scalar-prefetch SMEM
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    axr, ayr, azr, bxr, byr, bzr, cxr, cyr, czr,
                    t_ref, id_ref):
    del n_blocks
    tri_refs = (axr, ayr, azr, bxr, byr, bzr, cxr, cyr, czr)
    i = pl.program_id(0)
    ox = ox_ref[:]                      # (TILE_R, 1) ray column vectors
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, CHUNK), 1)
    # Best-hit state lives in the OUTPUT refs (VMEM scratch semantics);
    # the dynamic-trip-count while_loop visits ONLY this tile's
    # shortlist entries — skipped blocks cost nothing at all.
    t_ref[:] = jnp.full((TILE_R, 1), MISS_DISTANCE, jnp.float32)
    id_ref[:] = jnp.full((TILE_R, 1), -1, jnp.int32)
    n_list = cnt_ref[i]

    def cond(carry):
        k, t_far = carry
        # Ordered early termination: blocks come nearest-first, so once
        # the next entry distance exceeds the tile's WORST best-hit no
        # remaining block can improve any ray.
        return (k < n_list) & (tmin_ref[i, k] < t_far)

    def body(carry):
        k, _ = carry
        b = ids_ref[i, k]
        t_best = t_ref[:]
        t = _mt_block(tri_refs, b, ox, oy, oz, dx, dy, dz, t_best)
        t_min = jnp.min(t, axis=1, keepdims=True)
        # argmin via masked lane-index min (ties → lowest lane).
        kk = jnp.min(jnp.where(t == t_min, lane, CHUNK), axis=1,
                     keepdims=True)
        better = t_min < t_best
        t_new = jnp.where(better, t_min, t_best)
        t_ref[:] = t_new
        id_ref[:] = jnp.where(better, b * CHUNK + kk, id_ref[:])
        return k + 1, jnp.max(t_new)

    jax.lax.while_loop(cond, body, (jnp.int32(0), MISS_DISTANCE))


def _anyhit_kernel(n_blocks,
                   ids_ref, tmin_ref, cnt_ref,    # scalar-prefetch SMEM
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   tmax_ref,
                   axr, ayr, azr, bxr, byr, bzr, cxr, cyr, czr,
                   hit_ref):
    del n_blocks
    tri_refs = (axr, ayr, azr, bxr, byr, bzr, cxr, cyr, czr)
    i = pl.program_id(0)
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tmax = tmax_ref[:]

    hit_ref[:] = jnp.zeros((TILE_R, 1), bool)
    n_list = cnt_ref[i]

    def cond(carry):
        k, n_open = carry
        # Any-hit early exit: stop once every ray in the tile is
        # occluded (nearest-first order makes this fast).
        return (k < n_list) & (n_open > 0)

    def body(carry):
        k, _ = carry
        b = ids_ref[i, k]
        found = hit_ref[:]
        # Occluded rays stop intersecting: cap their t to 0.
        t_cap = jnp.where(found, 0.0, tmax)
        t = _mt_block(tri_refs, b, ox, oy, oz, dx, dy, dz, t_cap)
        new_found = found | jnp.any(t < t_cap, axis=1, keepdims=True)
        hit_ref[:] = new_found
        return k + 1, jnp.sum((~new_found).astype(jnp.int32))

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(TILE_R)))


def _to_col(x, rp, fill=0.0):
    """(R,) → (rp, 1) padded column (rays live along sublanes)."""
    r = x.shape[0]
    return jnp.pad(x, (0, rp - r), constant_values=fill).reshape(rp, 1)


def _pad_rays(ray_o, ray_d, rp):
    """Pad to the tile multiple with parked rays (origin at +1e30 →
    every slab test misses, so pad lanes never enter a shortlist)."""
    r = ray_o.shape[0]
    o = jnp.pad(ray_o, ((0, rp - r), (0, 0)), constant_values=1.0e30)
    d = jnp.pad(ray_d, ((0, rp - r), (0, 0)), constant_values=1.0)
    return o, d


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_blocks(bt: BlockedTris, ray_o, ray_d, interpret=False):
    """Closest hit over blocked triangles. Returns (t, blocked_slot)
    with blocked_slot = -1 on miss (map through bt.to_global outside)."""
    r = ray_o.shape[0]
    rp = max((r + TILE_R - 1) // TILE_R, 1) * TILE_R
    o_p, d_p = _pad_rays(ray_o, ray_d, rp)
    ids, tmins, counts = _tile_shortlists(
        bt.aabb, o_p, d_p, jnp.full((rp,), MISS_DISTANCE, jnp.float32))

    ray_specs = [pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM) for _ in range(6)]
    full = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(9)]
    out_spec = pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(rp // TILE_R,),
        in_specs=ray_specs + full,
        out_specs=(out_spec, out_spec))
    t, slot = pl.pallas_call(
        functools.partial(_closest_kernel, bt.n_blocks),
        out_shape=(jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids, tmins, counts,
      _to_col(o_p[:, 0], rp), _to_col(o_p[:, 1], rp),
      _to_col(o_p[:, 2], rp), _to_col(d_p[:, 0], rp),
      _to_col(d_p[:, 1], rp), _to_col(d_p[:, 2], rp),
      bt.ax, bt.ay, bt.az, bt.bx, bt.by, bt.bz,
      bt.cx, bt.cy, bt.cz)
    return t.reshape(rp)[:r], slot.reshape(rp)[:r]


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit_blocks(bt: BlockedTris, ray_o, ray_d, t_max, interpret=False):
    """Occlusion test (True = some hit with t < t_max)."""
    r = ray_o.shape[0]
    rp = max((r + TILE_R - 1) // TILE_R, 1) * TILE_R
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    o_p, d_p = _pad_rays(ray_o, ray_d, rp)
    tm_p = jnp.pad(tm, (0, rp - r))
    ids, tmins, counts = _tile_shortlists(bt.aabb, o_p, d_p, tm_p)

    ray_specs = [pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM) for _ in range(7)]
    full = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(9)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(rp // TILE_R,),
        in_specs=ray_specs + full,
        out_specs=pl.BlockSpec((TILE_R, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM))
    hit = pl.pallas_call(
        functools.partial(_anyhit_kernel, bt.n_blocks),
        out_shape=jax.ShapeDtypeStruct((rp, 1), bool),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids, tmins, counts,
      _to_col(o_p[:, 0], rp), _to_col(o_p[:, 1], rp),
      _to_col(o_p[:, 2], rp), _to_col(d_p[:, 0], rp),
      _to_col(d_p[:, 1], rp), _to_col(d_p[:, 2], rp), _to_col(tm_p, rp),
      bt.ax, bt.ay, bt.az, bt.bx, bt.by, bt.bz,
      bt.cx, bt.cy, bt.cz)
    return hit.reshape(rp)[:r]
