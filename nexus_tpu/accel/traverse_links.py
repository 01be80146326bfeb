"""Stackless skip-link traversal — the fast TPU path (flat + instanced).

Replaces the per-lane stack of traverse2/traverse_tlas with threaded
per-octant links (accel/links.py): per-lane traversal state is a single
node index (plus, for instancing, one return link + the object-space
ray). Every lockstep step is a handful of (R,)-indexed gathers + one
slab test + masked triangle tests — no O(depth) one-hot stack traffic.

Instance transition follows the reference's semantics
(Nexus/src/Cuda/BVH/BVH8Traversal.cuh:234-267,303-309) with the stack
replaced by a single return slot: entering an instance saves the TLAS
miss link and jumps to the BLAS root; the BLAS root's miss link is -1,
so when a lane's next-node goes negative INSIDE an instance it restores
the world ray and resumes at the saved TLAS link. One nesting level
(TLAS→BLAS) is exactly what the reference supports.

The object-space ray keeps its direction UNNORMALIZED so the ray
parameter t ranks hits across instances (BVH8Traversal.cuh:246-249).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from nexus_tpu.accel.tlas import TLASArrays
from nexus_tpu.accel.traverse2 import BVH2Arrays
from nexus_tpu.geom import aabb, triangle
from nexus_tpu.geom.types import MISS_DISTANCE, Intersection

UNROLL = 4  # lockstep steps per while_loop iteration (dispatch amortize)


@flax.struct.dataclass
class LinkedBVH2:
    """BVH2Arrays + per-octant skip links, ready for device traversal."""
    base: BVH2Arrays
    hit: jnp.ndarray   # (8*M,) int32, row-major [octant, node]
    miss: jnp.ndarray  # (8*M,)
    n_nodes: int = flax.struct.field(pytree_node=False, default=0)


def link_bvh2(base: BVH2Arrays) -> LinkedBVH2:
    import numpy as np

    from nexus_tpu.accel.links import build_links

    links = build_links(np.asarray(base.bmin), np.asarray(base.bmax),
                        np.asarray(base.left_first), np.asarray(base.count))
    return LinkedBVH2(base=base,
                      hit=jnp.asarray(links.hit.reshape(-1)),
                      miss=jnp.asarray(links.miss.reshape(-1)),
                      n_nodes=int(base.left_first.shape[0]))


@flax.struct.dataclass
class LinkedTLAS:
    """TLASArrays + merged per-octant links.

    Links are built per sub-tree (TLAS, each BLAS) in LOCAL node space,
    then offset into the merged space; the TLAS's instance-leaf hit
    links are left equal to its miss links (the traversal intercepts
    instance leaves explicitly). BLAS roots keep miss = -1 (= "return to
    TLAS" once inside an instance).
    """
    base: TLASArrays
    hit: jnp.ndarray   # (8*M,)
    miss: jnp.ndarray  # (8*M,)


def link_tlas(base: TLASArrays) -> LinkedTLAS:
    import numpy as np

    from nexus_tpu.accel.links import build_links

    bmin = np.asarray(base.bmin)
    bmax = np.asarray(base.bmax)
    left_first = np.asarray(base.left_first)
    count = np.asarray(base.count)
    m = left_first.shape[0]
    n_tlas = base.n_tlas_nodes

    hit = np.full((8, m), -1, np.int32)
    miss = np.full((8, m), -1, np.int32)

    # TLAS sub-tree (its left_first values are local TLAS indices for
    # internal nodes; leaves index inst_order, never followed as links).
    lt = build_links(bmin[:n_tlas], bmax[:n_tlas],
                     left_first[:n_tlas], count[:n_tlas])
    hit[:, :n_tlas] = lt.hit
    miss[:, :n_tlas] = lt.miss

    # Each BLAS sub-tree: recover local left_first by subtracting the
    # node offset (internal) — leaf firsts index tri_order and are
    # irrelevant for links, so make every leaf's count nonzero as-is.
    roots = np.unique(np.asarray(base.inst_root))
    bounds = np.sort(np.concatenate([roots, [m]]))
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        lf = left_first[lo:hi].copy()
        internal = count[lo:hi] == 0
        lf[internal] -= lo
        lb = build_links(bmin[lo:hi], bmax[lo:hi], lf, count[lo:hi])
        h = lb.hit
        ms = lb.miss
        hit[:, lo:hi] = np.where(h >= 0, h + lo, -1)
        miss[:, lo:hi] = np.where(ms >= 0, ms + lo, -1)

    return LinkedTLAS(base=base,
                      hit=jnp.asarray(hit.reshape(-1)),
                      miss=jnp.asarray(miss.reshape(-1)))


def _safe_inv(d: jnp.ndarray) -> jnp.ndarray:
    tiny = 1.0e-12
    d = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / d


def _octant(d: jnp.ndarray) -> jnp.ndarray:
    neg = d < 0
    return (neg[..., 0].astype(jnp.int32)
            | (neg[..., 1].astype(jnp.int32) << 1)
            | (neg[..., 2].astype(jnp.int32) << 2))


def _leaf_tris(b, first, num, tri_leaf, o, d, best, cur_inst=None):
    """Unrolled masked triangle tests shared by both traversals."""
    t_best, u_b, v_b, id_b, inst_b = best
    for k in range(max(b.max_leaf, 1)):
        in_leaf = tri_leaf & (k < num)
        slot = jnp.clip(first + k, 0, b.tri_order.shape[0] - 1)
        tri_id = b.tri_order[slot]
        valid, th, uh, vh = triangle.intersect(
            o, d, b.v0[tri_id], b.v1[tri_id], b.v2[tri_id], t_max=t_best)
        take = in_leaf & valid
        t_best = jnp.where(take, th, t_best)
        u_b = jnp.where(take, uh, u_b)
        v_b = jnp.where(take, vh, v_b)
        id_b = jnp.where(take, tri_id, id_b)
        if cur_inst is not None:
            inst_b = jnp.where(take, cur_inst, inst_b)
    return t_best, u_b, v_b, id_b, inst_b


# --------------------------------------------------------------------------
# Flat scene
# --------------------------------------------------------------------------

def _traverse_flat(lb: LinkedBVH2, o, d, t_max, any_hit: bool):
    b = lb.base
    r = o.shape[0]
    inv_d = _safe_inv(d)
    oct_base = _octant(d) * lb.n_nodes

    def cond(state):
        cur, _, found = state
        live = cur >= 0
        if any_hit:
            live = live & ~found
        return jnp.any(live)

    def step(state):
        cur, best, found = state
        live = cur >= 0
        if any_hit:
            live = live & ~found
        node = jnp.maximum(cur, 0)
        t_box = aabb.intersect(o, inv_d, b.bmin[node], b.bmax[node],
                               t_best=best[0])
        box_hit = live & (t_box < MISS_DISTANCE)
        num = b.count[node]
        is_leaf = num > 0
        first = b.left_first[node]

        t_best, u_b, v_b, id_b, _ = _leaf_tris(
            b, first, num, box_hit & is_leaf, o, d, (*best, None))
        best = (t_best, u_b, v_b, id_b)
        found = found | (box_hit & is_leaf & (id_b >= 0)
                         & (t_best < t_max))

        follow = box_hit & ~is_leaf
        nxt = jnp.where(follow, lb.hit[oct_base + node],
                        lb.miss[oct_base + node])
        cur = jnp.where(live, nxt, cur)
        return cur, best, found

    def step_k(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    best0 = (t_max.astype(jnp.float32), jnp.zeros(r, jnp.float32),
             jnp.zeros(r, jnp.float32), jnp.full(r, -1, jnp.int32))
    init = (jnp.zeros(r, jnp.int32), best0, jnp.zeros(r, bool))
    _, best, found = lax.while_loop(cond, step_k, init)
    return (*best, found)


def closest_hit(lb: LinkedBVH2, ray_o, ray_d,
                t_max=MISS_DISTANCE) -> Intersection:
    """Closest hit; same differentiability contract as traverse2
    (stop_gradient traversal + analytic Möller–Trumbore refinement)."""
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    lb_s, o_s, d_s, tm_s = jax.lax.stop_gradient((lb, ray_o, ray_d, t_max_b))
    _, _, _, tri, _ = _traverse_flat(lb_s, o_s, d_s, tm_s, any_hit=False)
    miss = tri < 0
    tri_c = jnp.maximum(tri, 0)
    b = lb.base
    t, u, v = triangle.refine(ray_o, ray_d, b.v0[tri_c], b.v1[tri_c],
                              b.v2[tri_c])
    return Intersection(t=jnp.where(miss, MISS_DISTANCE, t), u=u, v=v,
                        tri_idx=tri_c, inst_idx=jnp.zeros_like(tri))


def any_hit(lb: LinkedBVH2, ray_o, ray_d, t_max) -> jnp.ndarray:
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    lb_s, o_s, d_s, tm_s = jax.lax.stop_gradient((lb, ray_o, ray_d, t_max_b))
    _, _, _, _, found = _traverse_flat(lb_s, o_s, d_s, tm_s, any_hit=True)
    return found


# --------------------------------------------------------------------------
# Instanced (TLAS→BLAS)
# --------------------------------------------------------------------------

def _traverse_tlas(lt: LinkedTLAS, o, d, t_max, any_hit: bool):
    t = lt.base
    r = o.shape[0]
    world_inv = _safe_inv(d)
    m = t.left_first.shape[0]
    world_oct = _octant(d) * m

    def cond(state):
        cur = state[0]
        found = state[-1]
        live = cur >= 0
        if any_hit:
            live = live & ~found
        return jnp.any(live)

    def step(state):
        cur, ret, cur_inst, ray, best, found = state
        cur_o, cur_d, cur_inv, oct_b = ray
        live = cur >= 0
        if any_hit:
            live = live & ~found
        node = jnp.maximum(cur, 0)
        t_box = aabb.intersect(cur_o, cur_inv, t.bmin[node], t.bmax[node],
                               t_best=best[0])
        box_hit = live & (t_box < MISS_DISTANCE)
        num = t.count[node]
        first = t.left_first[node]
        is_leaf = num > 0
        in_tlas = node < t.n_tlas_nodes

        # Instance leaf hit → enter the BLAS (save the TLAS continuation).
        enter = box_hit & is_leaf & in_tlas
        i_id = t.inst_order[jnp.clip(first, 0, t.inst_order.shape[0] - 1)]
        inv34 = t.inst_inv[i_id]
        o_obj = jnp.einsum("...ij,...j->...i", inv34[..., :3], o) \
            + inv34[..., 3]
        d_obj = jnp.einsum("...ij,...j->...i", inv34[..., :3], d)
        cur_o = jnp.where(enter[:, None], o_obj, cur_o)
        cur_d = jnp.where(enter[:, None], d_obj, cur_d)
        cur_inv = jnp.where(enter[:, None], _safe_inv(d_obj), cur_inv)
        oct_b = jnp.where(enter, _octant(d_obj) * m, oct_b)
        cur_inst = jnp.where(enter, i_id, cur_inst)
        ret = jnp.where(enter, lt.miss[world_oct + node], ret)

        # BLAS triangle leaf.
        tri_leaf = box_hit & is_leaf & ~in_tlas
        best = _leaf_tris(t, first, num, tri_leaf, cur_o, cur_d, best,
                          cur_inst=cur_inst)
        found = found | (tri_leaf & (best[3] >= 0) & (best[0] < t_max))

        # Next node.
        follow = box_hit & ~is_leaf
        nxt = jnp.where(
            enter, t.inst_root[i_id],
            jnp.where(follow, lt.hit[oct_b + node], lt.miss[oct_b + node]))

        # BLAS exhausted (nxt < 0 while inside an instance): restore the
        # world ray, resume at the saved TLAS link (cuh:303-309).
        leave = live & (nxt < 0) & (cur_inst >= 0)
        cur_o = jnp.where(leave[:, None], o, cur_o)
        cur_d = jnp.where(leave[:, None], d, cur_d)
        cur_inv = jnp.where(leave[:, None], world_inv, cur_inv)
        oct_b = jnp.where(leave, world_oct, oct_b)
        cur_inst = jnp.where(leave, -1, cur_inst)
        nxt = jnp.where(leave, ret, nxt)

        cur = jnp.where(live, nxt, cur)
        return (cur, ret, cur_inst, (cur_o, cur_d, cur_inv, oct_b), best,
                found)

    def step_k(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    best0 = (t_max.astype(jnp.float32), jnp.zeros(r, jnp.float32),
             jnp.zeros(r, jnp.float32), jnp.full(r, -1, jnp.int32),
             jnp.full(r, -1, jnp.int32))
    init = (jnp.zeros(r, jnp.int32), jnp.full(r, -1, jnp.int32),
            jnp.full(r, -1, jnp.int32), (o, d, world_inv, world_oct),
            best0, jnp.zeros(r, bool))
    final = lax.while_loop(cond, step_k, init)
    t_best, u_b, v_b, id_b, inst_b = final[4]
    return t_best, u_b, v_b, id_b, inst_b, final[5]


def closest_hit_tlas(lt: LinkedTLAS, ray_o, ray_d,
                     t_max=MISS_DISTANCE) -> Intersection:
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    lt_s, o_s, d_s, tm_s = jax.lax.stop_gradient((lt, ray_o, ray_d, t_max_b))
    _, _, _, tri, inst, _ = _traverse_tlas(lt_s, o_s, d_s, tm_s,
                                           any_hit=False)
    miss = tri < 0
    tri_c = jnp.maximum(tri, 0)
    inst_c = jnp.maximum(inst, 0)
    t = lt.base
    inv34 = t.inst_inv[inst_c]
    o_obj = jnp.einsum("...ij,...j->...i", inv34[..., :3], ray_o) \
        + inv34[..., 3]
    d_obj = jnp.einsum("...ij,...j->...i", inv34[..., :3], ray_d)
    th, u, v = triangle.refine(o_obj, d_obj, t.v0[tri_c], t.v1[tri_c],
                               t.v2[tri_c])
    return Intersection(t=jnp.where(miss, MISS_DISTANCE, th), u=u, v=v,
                        tri_idx=tri_c, inst_idx=inst_c)


def any_hit_tlas(lt: LinkedTLAS, ray_o, ray_d, t_max) -> jnp.ndarray:
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               ray_o.shape[:-1])
    lt_s, o_s, d_s, tm_s = jax.lax.stop_gradient((lt, ray_o, ray_d, t_max_b))
    _, _, _, _, _, found = _traverse_tlas(lt_s, o_s, d_s, tm_s, any_hit=True)
    return found
