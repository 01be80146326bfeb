"""Two-level TLAS→BLAS traversal in pure JAX (closest-hit + any-hit).

Functional re-expression of the reference's instanced traversal
(Nexus/src/Cuda/BVH/BVH8Traversal.cuh:234-267: TLAS leaf → transform ray
by instance invTransform, save backupRay, record instanceStackDepth,
restart at BLAS root; restore the world ray when the stack pointer
returns to that depth, l.293-315). Same BATCHED LOCKSTEP formulation as
accel/traverse2.py — one ``lax.while_loop`` advances every lane one
stack event per iteration — extended with three per-lane state fields:

  cur_inst   : instance the lane is inside (-1 = world/TLAS level)
  inst_depth : stack pointer recorded at instance entry; popping back
               to it restores the world-space ray (backupRay analog)
  cur_o/d/inv: the working ray (world or object space)

The object-space ray is the instance's FULL affine inverse applied to
(origin, direction) without renormalizing the direction, so the ray
parameter t is identical in both spaces and one scalar `t_best` ranks
hits across instances — exactly the reference's convention
(BVH8Traversal.cuh:246-249 transforms direction unnormalized).

TLAS leaves hold exactly ONE instance (accel/tlas.py builds leaf=1), so
"enter instance" is a single lockstep event per pop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from nexus_tpu.accel.tlas import TLASArrays
from nexus_tpu.geom import aabb, triangle
from nexus_tpu.geom.types import MISS_DISTANCE, Intersection

STACK_DEPTH = 96  # TLAS depth + BLAS depth share one stack
UNROLL = 8  # amortize while_loop dispatch overhead (see traverse2.py)


def _safe_inv(d: jnp.ndarray) -> jnp.ndarray:
    tiny = 1.0e-12
    d = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / d


def _xform_point(m34: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(R, 3, 4) affine × (R, 3) point."""
    return jnp.einsum("...ij,...j->...i", m34[..., :3], p) + m34[..., 3]


def _xform_vector(m34: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", m34[..., :3], v)


def _traverse_batch(t: TLASArrays, o: jnp.ndarray, d: jnp.ndarray,
                    t_max: jnp.ndarray, any_hit: bool):
    """Lockstep two-level traversal. o/d: (R, 3); t_max: (R,).

    Returns (t_hit, u, v, tri_idx, inst_idx, found). tri_idx is the
    GLOBAL (merged) triangle id; -1 on miss.
    """
    r = o.shape[0]
    world_inv = _safe_inv(d)
    iota_d = jnp.arange(STACK_DEPTH)[None, :]

    def stack_read(stack, idx):
        onehot = iota_d == idx[:, None]
        return jnp.sum(jnp.where(onehot, stack, 0), axis=1)

    def stack_write(stack, idx, value, mask):
        sel = (iota_d == idx[:, None]) & mask[:, None]
        return jnp.where(sel, value[:, None], stack)

    def cond(state):
        ptr = state[0]
        found = state[-1]
        live = ptr > 0
        if any_hit:
            live = live & ~found
        return jnp.any(live)

    def step(state):
        ptr, stack, cur, inst, best, found = state
        cur_o, cur_d, cur_inv = cur
        cur_inst, inst_depth = inst
        t_best, u_b, v_b, id_b, inst_b = best
        live = ptr > 0
        if any_hit:
            live = live & ~found

        # --- Restore world ray at instance exit (cuh:303-309) ---------
        leave = live & (cur_inst >= 0) & (ptr == inst_depth)
        cur_o = jnp.where(leave[:, None], o, cur_o)
        cur_d = jnp.where(leave[:, None], d, cur_d)
        cur_inv = jnp.where(leave[:, None], world_inv, cur_inv)
        cur_inst = jnp.where(leave, -1, cur_inst)

        # --- Pop ------------------------------------------------------
        node = stack_read(stack, jnp.maximum(ptr - 1, 0))
        ptr = jnp.where(live, ptr - 1, ptr)
        first = t.left_first[node]
        num = t.count[node]
        is_leaf = live & (num > 0)
        in_tlas = node < t.n_tlas_nodes

        # --- TLAS leaf: enter instance (cuh:234-267) -------------------
        enter = is_leaf & in_tlas
        i_id = t.inst_order[jnp.clip(first, 0, t.inst_order.shape[0] - 1)]
        inv34 = t.inst_inv[i_id]
        o_obj = _xform_point(inv34, o)
        d_obj = _xform_vector(inv34, d)
        cur_o = jnp.where(enter[:, None], o_obj, cur_o)
        cur_d = jnp.where(enter[:, None], d_obj, cur_d)
        cur_inv = jnp.where(enter[:, None], _safe_inv(d_obj), cur_inv)
        cur_inst = jnp.where(enter, i_id, cur_inst)
        inst_depth = jnp.where(enter, ptr, inst_depth)
        stack = stack_write(stack, ptr, t.inst_root[i_id], enter)
        ptr = ptr + enter.astype(jnp.int32)

        # --- BLAS leaf: unrolled triangle tests ------------------------
        tri_leaf = is_leaf & ~in_tlas
        for k in range(max(t.max_leaf, 1)):
            in_leaf = tri_leaf & (k < num)
            slot = jnp.clip(first + k, 0, t.tri_order.shape[0] - 1)
            tri_id = t.tri_order[slot]
            valid, th, uh, vh = triangle.intersect(
                cur_o, cur_d, t.v0[tri_id], t.v1[tri_id], t.v2[tri_id],
                t_max=t_best)
            take = in_leaf & valid
            t_best = jnp.where(take, th, t_best)
            u_b = jnp.where(take, uh, u_b)
            v_b = jnp.where(take, vh, v_b)
            id_b = jnp.where(take, tri_id, id_b)
            inst_b = jnp.where(take, cur_inst, inst_b)

        found = found | (tri_leaf & (id_b >= 0) & (t_best < t_max))

        # --- Internal: ordered child push ------------------------------
        is_int = live & (num == 0)
        left = jnp.where(is_int, first, 0)
        t_l = aabb.intersect(cur_o, cur_inv, t.bmin[left], t.bmax[left],
                             t_best=t_best)
        t_r = aabb.intersect(cur_o, cur_inv, t.bmin[left + 1],
                             t.bmax[left + 1], t_best=t_best)
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

        return (ptr, stack, (cur_o, cur_d, cur_inv),
                (cur_inst, inst_depth), (t_best, u_b, v_b, id_b, inst_b),
                found)

    def step_k(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    stack0 = jnp.zeros((r, STACK_DEPTH), jnp.int32)
    best0 = (t_max.astype(jnp.float32), jnp.zeros(r, jnp.float32),
             jnp.zeros(r, jnp.float32), jnp.full(r, -1, jnp.int32),
             jnp.full(r, -1, jnp.int32))
    init = (jnp.ones(r, jnp.int32), stack0,
            (o, d, world_inv),
            (jnp.full(r, -1, jnp.int32), jnp.full(r, -1, jnp.int32)),
            best0, jnp.zeros(r, bool))
    final = lax.while_loop(cond, step_k, init)
    t_best, u_b, v_b, id_b, inst_b = final[4]
    return t_best, u_b, v_b, id_b, inst_b, final[5]


def closest_hit(t: TLASArrays, ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                t_max=MISS_DISTANCE) -> Intersection:
    """Closest-hit over the instanced scene. Returns Intersection with
    tri_idx = GLOBAL (merged) triangle id and inst_idx set.

    Same differentiability contract as traverse2.closest_hit: traversal
    runs under stop_gradient, then t/u/v are recomputed analytically
    against the found OBJECT-space triangle with the object-space ray
    (differentiable through the instance inverse transform too).
    """
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    t_s, o_s, d_s, tm_s = jax.lax.stop_gradient((t, ray_o, ray_d, t_max_b))
    _, _, _, tri, inst, _ = _traverse_batch(t_s, o_s, d_s, tm_s,
                                            any_hit=False)
    miss = tri < 0
    tri_c = jnp.maximum(tri, 0)
    inst_c = jnp.maximum(inst, 0)
    inv34 = t.inst_inv[inst_c]
    o_obj = _xform_point(inv34, ray_o)
    d_obj = _xform_vector(inv34, ray_d)
    th, u, v = triangle.refine(o_obj, d_obj, t.v0[tri_c], t.v1[tri_c],
                               t.v2[tri_c])
    return Intersection(
        t=jnp.where(miss, MISS_DISTANCE, th), u=u, v=v,
        tri_idx=tri_c, inst_idx=inst_c)


def any_hit(t: TLASArrays, ray_o: jnp.ndarray, ray_d: jnp.ndarray,
            t_max) -> jnp.ndarray:
    """Occlusion test across instances (BVH8TraceShadow analog)."""
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    t_s, o_s, d_s, tm_s = jax.lax.stop_gradient((t, ray_o, ray_d, t_max_b))
    _, _, _, _, _, found = _traverse_batch(t_s, o_s, d_s, tm_s,
                                           any_hit=True)
    return found
