"""BVH2 traversal in pure JAX (closest-hit + any-hit).

Functional re-expression of the reference's stack traversal
(Nexus/src/Cuda/BVH/BVH2Traversal.cuh:7-52): near-child-first ordered
descent with an explicit per-ray stack. Unlike the CUDA per-thread loop,
this is a BATCHED LOCKSTEP loop: one ``lax.while_loop`` advances every
ray in the batch by one stack entry per iteration, with lane masks for
rays that already finished — each body op is a wide vectorized gather /
compare over the whole batch, which is what the TPU VPU wants.

(An earlier jax.vmap(while_loop) formulation compiled but broadcast the
captured triangle arrays to a per-ray copy on the TPU backend —
O(rays × tris) HBM — so the batch dimension lives INSIDE the loop ops
instead. Leaf triangle tests are unrolled to the builder's static
max leaf size rather than a dynamic fori_loop for the same reason.)

This is the debug/reference traversal; the CWBVH path (accel/bvh8 +
kernels/trace) is the fast one, mirroring how the reference keeps
BVH2Traversal.cuh as the simple path next to BVH8Traversal.cuh.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from nexus_tpu.geom import aabb, triangle
from nexus_tpu.geom.types import MISS_DISTANCE, Intersection

STACK_DEPTH = 64  # ample for leaf>=1 SAH trees (depth ~2*log2(N))
# Loop-body repetitions per while_loop iteration: each while iteration
# costs ~0.6 ms of fixed dispatch overhead on the remote-TPU backend
# (measured on an empty loop), and the body is mask-idempotent, so
# manual unrolling amortizes it (see traverse8.py).
UNROLL = 8


@flax.struct.dataclass
class BVH2Arrays:
    """Device mirror of a host BVH2 (accel/bvh2.BVH2) + its triangles."""
    bmin: jnp.ndarray        # (M, 3)
    bmax: jnp.ndarray        # (M, 3)
    left_first: jnp.ndarray  # (M,)
    count: jnp.ndarray       # (M,)
    tri_order: jnp.ndarray   # (N,)
    v0: jnp.ndarray          # (N, 3)
    v1: jnp.ndarray          # (N, 3)
    v2: jnp.ndarray          # (N, 3)
    # Static max triangles per leaf (builder's leaf_size): bounds the
    # unrolled leaf test. Not a pytree leaf.
    max_leaf: int = flax.struct.field(pytree_node=False, default=4)


def device_arrays(bvh, v0, v1, v2) -> BVH2Arrays:
    """Upload a host BVH2 + triangle soup to device arrays."""
    import numpy as np

    return BVH2Arrays(
        bmin=jnp.asarray(bvh.bmin), bmax=jnp.asarray(bvh.bmax),
        left_first=jnp.asarray(bvh.left_first), count=jnp.asarray(bvh.count),
        tri_order=jnp.asarray(bvh.tri_order),
        v0=jnp.asarray(v0, jnp.float32), v1=jnp.asarray(v1, jnp.float32),
        v2=jnp.asarray(v2, jnp.float32),
        max_leaf=int(np.max(np.asarray(bvh.count))))


def _safe_inv(d: jnp.ndarray) -> jnp.ndarray:
    """1/d with zeros nudged to ±tiny (slab test stays well-defined)."""
    tiny = 1.0e-12
    d = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / d


def _traverse_batch(bvh: BVH2Arrays, o: jnp.ndarray, d: jnp.ndarray,
                    t_max: jnp.ndarray, any_hit: bool):
    """Lockstep batched traversal. o/d: (R, 3); t_max: (R,).

    Returns (t, u, v, tri_idx, found): each (R,). tri_idx = -1 on miss.
    """
    r = o.shape[0]
    inv_d = _safe_inv(d)
    # Dense one-hot stack addressing — per-row dynamic-column scatter
    # serializes on the TPU backend (see traverse8.py).
    iota_d = jnp.arange(STACK_DEPTH)[None, :]

    def stack_read(stack, idx):
        onehot = iota_d == idx[:, None]
        return jnp.sum(jnp.where(onehot, stack, 0), axis=1)

    def stack_write(stack, idx, value, mask):
        sel = (iota_d == idx[:, None]) & mask[:, None]
        return jnp.where(sel, value[:, None], stack)

    def cond(state):
        ptr, _, _, found = state
        live = ptr > 0
        if any_hit:
            live = live & ~found
        return jnp.any(live)

    def step(state):
        ptr, stack, best, found = state
        t_best, u_b, v_b, id_b = best
        live = ptr > 0
        if any_hit:
            live = live & ~found

        node = stack_read(stack, jnp.maximum(ptr - 1, 0))
        ptr = jnp.where(live, ptr - 1, ptr)
        first = bvh.left_first[node]
        num = bvh.count[node]
        is_leaf = live & (num > 0)

        # --- Leaf: unrolled triangle tests (static max_leaf) ----------
        for k in range(max(bvh.max_leaf, 1)):
            in_leaf = is_leaf & (k < num)
            slot = jnp.clip(first + k, 0, bvh.tri_order.shape[0] - 1)
            tri_id = bvh.tri_order[slot]
            valid, t, u, v = triangle.intersect(
                o, d, bvh.v0[tri_id], bvh.v1[tri_id], bvh.v2[tri_id],
                t_max=t_best)
            take = in_leaf & valid
            t_best = jnp.where(take, t, t_best)
            u_b = jnp.where(take, u, u_b)
            v_b = jnp.where(take, v, v_b)
            id_b = jnp.where(take, tri_id, id_b)

        found = found | (is_leaf & (id_b >= 0) & (t_best < t_max))

        # --- Internal: ordered child push (near popped first) ---------
        is_int = live & (num == 0)
        left = jnp.where(is_int, first, 0)
        t_l = aabb.intersect(o, inv_d, bvh.bmin[left], bvh.bmax[left],
                             t_best=t_best)
        t_r = aabb.intersect(o, inv_d, bvh.bmin[left + 1],
                             bvh.bmax[left + 1], t_best=t_best)
        near_is_left = t_l <= t_r
        near = jnp.where(near_is_left, left, left + 1)
        far = jnp.where(near_is_left, left + 1, left)
        t_near = jnp.minimum(t_l, t_r)
        t_far = jnp.maximum(t_l, t_r)

        push_far = is_int & (t_far < MISS_DISTANCE)
        stack = stack_write(stack, ptr, far, push_far)
        ptr = ptr + push_far.astype(jnp.int32)
        push_near = is_int & (t_near < MISS_DISTANCE)
        stack = stack_write(stack, ptr, near, push_near)
        ptr = ptr + push_near.astype(jnp.int32)

        return ptr, stack, (t_best, u_b, v_b, id_b), found

    def step_k(state):
        # Amortize the per-iteration while_loop dispatch overhead
        # (~0.6 ms on the remote-TPU backend); body is mask-idempotent.
        for _ in range(UNROLL):
            state = step(state)
        return state

    stack0 = jnp.zeros((r, STACK_DEPTH), jnp.int32)
    best0 = (t_max.astype(jnp.float32), jnp.zeros(r, jnp.float32),
             jnp.zeros(r, jnp.float32), jnp.full(r, -1, jnp.int32))
    init = (jnp.ones(r, jnp.int32), stack0, best0, jnp.zeros(r, bool))
    _, _, best, found = lax.while_loop(cond, step_k, init)
    t_best, u_b, v_b, id_b = best
    return t_best, u_b, v_b, id_b, found


def closest_hit(bvh: BVH2Arrays, ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                t_max=MISS_DISTANCE) -> Intersection:
    """Closest-hit traversal of a ray batch. Shapes (R, 3) → Intersection (R,).

    Differentiability contract (SURVEY.md §7 step 7): the stack traversal
    is a discrete index search (lax.while_loop — not reverse-
    differentiable, treated as a non-diff workspace: all its inputs are
    stop_gradient'ed). The returned t/u/v are then RECOMPUTED by an
    analytic Möller–Trumbore against the found triangle, so gradients
    flow to ray origin/direction and triangle vertices in closed form —
    "backward replays saved hits", no traversal in the backward pass.
    """
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    bvh_s, o_s, d_s, tm_s = jax.lax.stop_gradient(
        (bvh, ray_o, ray_d, t_max_b))
    _, _, _, tri, _ = _traverse_batch(bvh_s, o_s, d_s, tm_s, any_hit=False)
    miss = tri < 0
    tri_c = jnp.maximum(tri, 0)
    # Differentiable refinement (same result for hits, modulo fp).
    t, u, v = triangle.refine(
        ray_o, ray_d, bvh.v0[tri_c], bvh.v1[tri_c], bvh.v2[tri_c])
    return Intersection(
        t=jnp.where(miss, MISS_DISTANCE, t), u=u, v=v,
        tri_idx=tri_c,
        inst_idx=jnp.zeros_like(tri))


def any_hit(bvh: BVH2Arrays, ray_o: jnp.ndarray, ray_d: jnp.ndarray,
            t_max) -> jnp.ndarray:
    """Occlusion test: True where SOME hit exists closer than t_max.

    Mirrors BVH8TraceShadow's early-exit semantics
    (Nexus/src/Cuda/BVH/BVH8Traversal.cuh:326-518): a lane stops
    traversing at its first accepted hit.
    """
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    # Occlusion is a discrete predicate: whole computation is non-diff.
    bvh_s, o_s, d_s, tm_s = jax.lax.stop_gradient(
        (bvh, ray_o, ray_d, t_max_b))
    _, _, _, _, found = _traverse_batch(bvh_s, o_s, d_s, tm_s, any_hit=True)
    return found
