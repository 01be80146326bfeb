"""CWBVH (BVH8) traversal in pure JAX — batched lockstep.

TPU re-expression of BVH8Trace / BVH8TraceShadow
(Nexus/src/Cuda/BVH/BVH8Traversal.cuh:148-518). The CUDA version is a
per-thread persistent loop with hit-mask stack entries decoded by `prmt`
byte tricks and octant-reordered bit indices; none of that maps to the
VPU. The TPU formulation instead:

  - one lockstep ``lax.while_loop`` over the whole ray batch (as in
    traverse2.py) — every op is batch-wide and vectorized;
  - each stack entry is ONE child reference (int32) + its entry
    distance; a node pop decompresses and slab-tests all 8 quantized
    children AS AN 8-LANE VECTOR OP — the 8-wide parallelism the CUDA
    kernel gets from `vmin/vmax` video instructions comes from the
    (R, 8, 3) array shape here;
  - children are pushed far-to-near through a static sorting network, so
    the near child pops first (replaces octant-order bit indexing);
  - popped entries whose recorded distance exceeds the current best are
    discarded (stale-entry pruning, standard in stackful traversal).

Entry encoding (int32): >= 0 → node id; < 0 → leaf run:
-(start*4 + count) - 1 with count in 1..3 (P_MAX=3, never 0).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from nexus_tpu.geom import triangle
from nexus_tpu.geom.types import MISS_DISTANCE, Intersection

# Steps executed per while_loop iteration. The loop body is mask-
# idempotent (finished lanes do nothing), so manual unrolling is safe;
# it matters because each while_loop iteration carries a large fixed
# dispatch overhead on the remote-TPU backend (~0.6 ms measured on an
# EMPTY loop) — unrolling amortizes it.
UNROLL = 8

# Batcher odd-even merge network for 8 lanes (19 compare-exchanges).
_SORT_PAIRS = ((0, 1), (2, 3), (4, 5), (6, 7),
               (0, 2), (1, 3), (4, 6), (5, 7),
               (1, 2), (5, 6),
               (0, 4), (1, 5), (2, 6), (3, 7),
               (2, 4), (3, 5),
               (1, 2), (3, 4), (5, 6))


@flax.struct.dataclass
class BVH8Arrays:
    """Device mirror of accel/bvh8.BVH8 + its triangle soup."""
    p: jnp.ndarray                  # (M, 3) f32
    scale: jnp.ndarray              # (M, 3) f32
    child_base: jnp.ndarray         # (M,) i32
    tri_base: jnp.ndarray           # (M,) i32
    child_is_internal: jnp.ndarray  # (M, 8) bool
    child_offset: jnp.ndarray       # (M, 8) i32
    child_tri_count: jnp.ndarray    # (M, 8) i32
    qlo: jnp.ndarray                # (M, 8, 3) uint8
    qhi: jnp.ndarray                # (M, 8, 3) uint8
    tri_idx: jnp.ndarray            # (N,) i32
    v0: jnp.ndarray                 # (N, 3)
    v1: jnp.ndarray
    v2: jnp.ndarray
    # Static worst-case stack size: each pop removes 1 entry and pushes
    # <= 8, so usage <= 1 + 7 * depth. Stack HBM traffic scales with
    # this, so it is sized per-tree (jit-static).
    stack_depth: int = flax.struct.field(pytree_node=False, default=64)


def device_arrays(bvh8, v0, v1, v2) -> BVH8Arrays:
    depth = bvh8.depth
    stack = max(16, ((7 * depth + 2 + 7) // 8) * 8)
    return BVH8Arrays(
        p=jnp.asarray(bvh8.p), scale=jnp.asarray(bvh8.scale),
        child_base=jnp.asarray(bvh8.child_base),
        tri_base=jnp.asarray(bvh8.tri_base),
        child_is_internal=jnp.asarray(bvh8.child_is_internal),
        child_offset=jnp.asarray(bvh8.child_offset),
        child_tri_count=jnp.asarray(bvh8.child_tri_count),
        qlo=jnp.asarray(bvh8.qlo), qhi=jnp.asarray(bvh8.qhi),
        tri_idx=jnp.asarray(bvh8.tri_idx),
        v0=jnp.asarray(v0, jnp.float32), v1=jnp.asarray(v1, jnp.float32),
        v2=jnp.asarray(v2, jnp.float32),
        stack_depth=stack)


def _safe_inv(d):
    tiny = 1.0e-12
    d = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / d


def _traverse(bvh: BVH8Arrays, o, d, t_max, any_hit: bool):
    r = o.shape[0]
    depth = bvh.stack_depth
    inv_d = _safe_inv(d)
    # Dense one-hot stack addressing: per-row dynamic-column scatter /
    # gather lowers catastrophically on the TPU backend (serialized
    # scatters); a (R, D) compare-mask + where is pure VPU work.
    iota_d = jnp.arange(depth)[None, :]                 # (1, D)

    def stack_read(stack, idx):
        onehot = iota_d == idx[:, None]
        return jnp.sum(jnp.where(onehot, stack, 0), axis=1)

    def stack_write(stack, idx, value, mask):
        sel = (iota_d == idx[:, None]) & mask[:, None]
        return jnp.where(sel, value[:, None], stack)

    def cond(state):
        ptr, _, _, _, found = state
        live = ptr > 0
        if any_hit:
            live = live & ~found
        return jnp.any(live)

    def step(state):
        ptr, stack_e, stack_t, best, found = state
        t_best, u_b, v_b, id_b = best
        live = ptr > 0
        if any_hit:
            live = live & ~found

        top = jnp.maximum(ptr - 1, 0)
        entry = stack_read(stack_e, top)
        t_entry = stack_read(stack_t, top)
        ptr = jnp.where(live, ptr - 1, ptr)
        if not any_hit:
            live = live & (t_entry < t_best)   # stale-entry pruning

        # ---- Node pop: vector slab-test of 8 quantized children ------
        is_node = live & (entry >= 0)
        nidx = jnp.where(is_node, entry, 0)
        p = bvh.p[nidx][:, None, :]                      # (R, 1, 3)
        s = bvh.scale[nidx][:, None, :]
        lo = p + bvh.qlo[nidx].astype(jnp.float32) * s   # (R, 8, 3)
        hi = p + bvh.qhi[nidx].astype(jnp.float32) * s
        t1 = (lo - o[:, None, :]) * inv_d[:, None, :]
        t2 = (hi - o[:, None, :]) * inv_d[:, None, :]
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)     # (R, 8)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        off = bvh.child_offset[nidx]                     # (R, 8)
        hit8 = is_node[:, None] & (off >= 0) & (tmax >= tmin) \
            & (tmax > 0.0) & (tmin < t_best[:, None])
        t8 = jnp.where(hit8, tmin, MISS_DISTANCE)

        is_int = bvh.child_is_internal[nidx]
        node_entry = bvh.child_base[nidx][:, None] + off
        start = bvh.tri_base[nidx][:, None] + off
        cnt = bvh.child_tri_count[nidx]
        leaf_entry = -(start * 4 + cnt) - 1
        entry8 = jnp.where(is_int, node_entry, leaf_entry)

        # Sort the 8 (t, entry) pairs DESCENDING by t so the nearest is
        # pushed last → popped first. Columns live as separate (R,)
        # arrays: .at[:, a].set() lowers to whole-array
        # dynamic-update-slices that dominate the profile; plain where
        # on slices fuses.
        ts = [t8[:, i] for i in range(8)]
        es = [entry8[:, i] for i in range(8)]
        for a, b in _SORT_PAIRS:
            swap = ts[a] < ts[b]                # want descending
            ts[a], ts[b] = (jnp.where(swap, ts[b], ts[a]),
                            jnp.where(swap, ts[a], ts[b]))
            es[a], es[b] = (jnp.where(swap, es[b], es[a]),
                            jnp.where(swap, es[a], es[b]))

        # All 8 pushes in ONE pass over the stack: build the update as a
        # sum of disjoint one-hots (fuses into a single HBM sweep; eight
        # sequential wheres cost eight read+write sweeps of (R, D)).
        pos = ptr
        val_e = jnp.zeros((r, depth), jnp.int32)
        val_t = jnp.zeros((r, depth), jnp.float32)
        written = jnp.zeros((r, depth), bool)
        for k in range(8):
            push = ts[k] < MISS_DISTANCE
            sel = (iota_d == pos[:, None]) & push[:, None]
            val_e = val_e + sel * es[k][:, None]
            val_t = val_t + sel * ts[k][:, None]
            written = written | sel
            pos = pos + push.astype(jnp.int32)
        stack_e = jnp.where(written, val_e, stack_e)
        stack_t = jnp.where(written, val_t, stack_t)
        ptr = pos

        # ---- Leaf pop: ≤3 triangle tests (P_MAX, BVH8.h:20) ----------
        is_leaf = live & (entry < 0)
        dec = -entry - 1
        tstart = jnp.where(is_leaf, dec >> 2, 0)
        tcnt = jnp.where(is_leaf, dec & 3, 0)
        for k in range(3):
            in_run = is_leaf & (k < tcnt)
            slot = jnp.clip(tstart + k, 0, bvh.tri_idx.shape[0] - 1)
            tri_id = bvh.tri_idx[slot]
            valid, t, u, v = triangle.intersect(
                o, d, bvh.v0[tri_id], bvh.v1[tri_id], bvh.v2[tri_id],
                t_max=t_best)
            take = in_run & valid
            t_best = jnp.where(take, t, t_best)
            u_b = jnp.where(take, u, u_b)
            v_b = jnp.where(take, v, v_b)
            id_b = jnp.where(take, tri_id, id_b)
        found = found | (is_leaf & (id_b >= 0) & (t_best < t_max))

        return ptr, stack_e, stack_t, (t_best, u_b, v_b, id_b), found

    def step_k(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    stack_e0 = jnp.zeros((r, depth), jnp.int32)
    stack_t0 = jnp.zeros((r, depth), jnp.float32)
    best0 = (t_max.astype(jnp.float32), jnp.zeros(r, jnp.float32),
             jnp.zeros(r, jnp.float32), jnp.full(r, -1, jnp.int32))
    init = (jnp.ones(r, jnp.int32), stack_e0, stack_t0, best0,
            jnp.zeros(r, bool))
    _, _, _, best, found = lax.while_loop(cond, step_k, init)
    return best, found


def closest_hit(bvh: BVH8Arrays, ray_o, ray_d,
                t_max=MISS_DISTANCE) -> Intersection:
    """Closest hit over the CWBVH; same differentiability contract as
    traverse2.closest_hit (non-diff index search + analytic refinement)."""
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    bvh_s, o_s, d_s, tm_s = jax.lax.stop_gradient(
        (bvh, ray_o, ray_d, t_max_b))
    (_, _, _, tri), _ = _traverse(bvh_s, o_s, d_s, tm_s, any_hit=False)
    miss = tri < 0
    tri_c = jnp.maximum(tri, 0)
    t, u, v = triangle.refine(
        ray_o, ray_d, bvh.v0[tri_c], bvh.v1[tri_c], bvh.v2[tri_c])
    return Intersection(
        t=jnp.where(miss, MISS_DISTANCE, t), u=u, v=v, tri_idx=tri_c,
        inst_idx=jnp.zeros_like(tri))


def any_hit(bvh: BVH8Arrays, ray_o, ray_d, t_max) -> jnp.ndarray:
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    bvh_s, o_s, d_s, tm_s = jax.lax.stop_gradient(
        (bvh, ray_o, ray_d, t_max_b))
    _, found = _traverse(bvh_s, o_s, d_s, tm_s, any_hit=True)
    return found
