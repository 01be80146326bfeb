"""Geometry view: uniform world-space accessors over flat and instanced scenes.

The megakernel shades in WORLD space. A flat scene (SceneBuilder.build)
stores world-space triangles in one BVH2; an instanced scene
(SceneBuilder.build_instanced) stores OBJECT-space triangles per BLAS
plus per-instance transforms (accel/tlas.py). These helpers give the
integrator one interface over both, implementing the reference's
instance-aware shading prologue: hit point via instance.transform,
normals via invTransform.Transposed() (PathTracer.cu:328-346), material
from the instance binding (PathTracer.cu:331), light-triangle transforms
and WORLD-area pdfs in NEE (PathTracer.cu:225-277).

Dispatch is static (`scene.is_instanced` is a non-pytree field), so jit
traces exactly one path — no runtime branching.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from nexus_tpu.accel import traverse2, traverse_links, traverse_tlas
from nexus_tpu.accel.traverse_links import LinkedBVH2, LinkedTLAS
from nexus_tpu.accel.traverse_tlas import _xform_point, _xform_vector
from nexus_tpu.core.gather import take_small
from nexus_tpu.geom.types import MISS_DISTANCE, Intersection


def _linked(scene):
    if scene.is_instanced:
        return LinkedTLAS(base=scene.tlas, hit=scene.links_hit,
                          miss=scene.links_miss)
    return LinkedBVH2(base=scene.bvh, hit=scene.links_hit,
                      miss=scene.links_miss,
                      n_nodes=int(scene.bvh.left_first.shape[0]))


def _use_pallas(scene) -> bool:
    """Static dispatch: the HBM-resident Pallas kernel
    (kernels/trace_hbm.py) serves BOTH flat and instanced scenes on the
    TPU backend. CPU/tests take the skip-link path (the kernel itself
    is covered by interpret-mode tests in tests/test_trace_hbm.py)."""
    import os

    import jax

    return (scene.blocked is not None
            and jax.default_backend() == "tpu"
            and not os.environ.get("NEXUS_NO_PALLAS"))


def closest_hit(scene, ray_o, ray_d, live=None, compact=True) -> Intersection:
    """Closest hit over all lanes; `live` (R,) bool marks lanes whose
    result matters (dead lanes return a miss). On the Pallas path with
    `compact`, live lanes are stable-partition packed into dense ray
    tiles before the kernel (render/compact.py — the reference's
    wavefront queue compaction, PathTracer.cu:302-306); elsewhere dead
    lanes are parked at +1e30 so traversal skips them."""
    if _use_pallas(scene):
        return _pallas_closest(scene, ray_o, ray_d, live=live,
                               compact=compact)
    if live is not None:
        ray_o = jnp.where(live[..., None], ray_o, 1.0e30)
        ray_d = jnp.where(live[..., None], ray_d, 1.0)
    if scene.bvh8 is not None:       # CWBVH (build(accel="bvh8"))
        from nexus_tpu.accel import traverse8

        out = traverse8.closest_hit(scene.bvh8, ray_o, ray_d)
    elif scene.links_hit is not None:  # stackless skip-link fast path
        if scene.is_instanced:
            out = traverse_links.closest_hit_tlas(_linked(scene),
                                                  ray_o, ray_d)
        else:
            out = traverse_links.closest_hit(_linked(scene), ray_o,
                                             ray_d)
    elif scene.is_instanced:
        out = traverse_tlas.closest_hit(scene.tlas, ray_o, ray_d)
    else:
        out = traverse2.closest_hit(scene.bvh, ray_o, ray_d)
    # Named trace saves (see _pallas_closest): the remat_bounce policy
    # must never re-run a traversal While loop in the reverse pass —
    # on any backend.
    from jax.ad_checkpoint import checkpoint_name

    return jax.tree.map(lambda a: checkpoint_name(a, "trace"), out)


def _pallas_closest(scene, ray_o, ray_d, interpret=False, live=None,
                    compact=True) -> Intersection:
    from nexus_tpu.geom import triangle as tri_mod
    from nexus_tpu.kernels import trace_hbm as ktrace
    from nexus_tpu.render.compact import adaptive_closest_hit

    bt_s, o_s, d_s = jax.lax.stop_gradient((scene.blocked, ray_o, ray_d))
    if live is not None and compact:
        t, tri, inst = adaptive_closest_hit(
            lambda o, d: ktrace.closest_hit_scene(bt_s, o, d,
                                                  interpret=interpret),
            o_s, d_s, live)
    else:
        if live is not None:
            o_s = jnp.where(live[..., None], o_s, 1.0e30)
            d_s = jnp.where(live[..., None], d_s, 1.0)
        t, tri, inst = ktrace.closest_hit_scene(bt_s, o_s, d_s,
                                                interpret=interpret)
    # Named so RenderSettings.remat_bounce's checkpoint policy can save
    # EXACTLY the trace results and recompute the (cheap, fusible)
    # shade math in the reverse pass — the backward profile showed the
    # scan's ~100-intermediates-per-bounce residual stacking as the
    # top bwd sink (docs/perf.md round 5). No-op without the policy.
    from jax.ad_checkpoint import checkpoint_name

    t = checkpoint_name(t, "trace")
    tri = checkpoint_name(tri, "trace")
    inst = checkpoint_name(inst, "trace")
    miss = tri < 0
    tri = jnp.maximum(tri, 0)   # global id comes straight from the
    #                             kernel's block id row — no gather
    inst = jnp.maximum(inst, 0)
    # Differentiable refinement against the found WORLD-space triangle
    # (the same contract as accel/traverse2.closest_hit; instanced verts
    # go through inst_m, keeping transform gradients alive in shading).
    # fetch_attr's combined gather CSEs with the bounce's own fetch.
    attr = fetch_attr(scene, tri, inst)
    th, u, v = tri_mod.refine(ray_o, ray_d, attr.v0, attr.v1, attr.v2)
    return Intersection(t=jnp.where(miss, MISS_DISTANCE, th), u=u, v=v,
                        tri_idx=tri, inst_idx=inst)


def any_hit(scene, ray_o, ray_d, t_max, live=None,
            compact=True) -> jnp.ndarray:
    """Occlusion test; `live` marks lanes that need an answer (dead
    lanes return False). Pallas + `compact` packs the live shadow rays
    into dense tiles first (render/compact.py) — the 83%-dead interior
    shadow tiles of round 4 otherwise walk their blocks at full cost."""
    from jax.ad_checkpoint import checkpoint_name

    if live is not None:
        t_max = jnp.where(live, t_max, 0.0)
    if _use_pallas(scene):
        from nexus_tpu.kernels import trace_hbm as ktrace
        from nexus_tpu.render.compact import adaptive_any_hit

        bt_s, o_s, d_s, tm_s = jax.lax.stop_gradient(
            (scene.blocked, ray_o, ray_d, t_max))
        if live is not None and compact:
            return checkpoint_name(adaptive_any_hit(
                lambda o, d, tm: ktrace.any_hit_scene(bt_s, o, d, tm),
                o_s, d_s, tm_s, live), "trace")
        return checkpoint_name(
            ktrace.any_hit_scene(bt_s, o_s, d_s, tm_s), "trace")
    if scene.bvh8 is not None:       # CWBVH (build(accel="bvh8"))
        from nexus_tpu.accel import traverse8

        out = traverse8.any_hit(scene.bvh8, ray_o, ray_d, t_max)
    elif scene.links_hit is not None:
        if scene.is_instanced:
            out = traverse_links.any_hit_tlas(_linked(scene), ray_o,
                                              ray_d, t_max)
        else:
            out = traverse_links.any_hit(_linked(scene), ray_o, ray_d,
                                         t_max)
    elif scene.is_instanced:
        out = traverse_tlas.any_hit(scene.tlas, ray_o, ray_d, t_max)
    else:
        out = traverse2.any_hit(scene.bvh, ray_o, ray_d, t_max)
    return checkpoint_name(out, "trace")


@flax.struct.dataclass
class TriAttr:
    """World-space shading attributes of a hit set, fetched with ONE
    gather from SceneData.tri_attr (v0..uv2+meta in one (N, 26) row).
    Per-component tables (scene.n0, scene.uv0, ...) remain for the CPU
    paths, but the integrator uses this: under jvp/vjp tracing XLA kept
    the per-component gathers as ~14 separate serial 65k-index passes
    per bounce (~5.6 ms) where the fwd-only program fused them; one
    wide gather is one pass in both programs."""
    v0: jnp.ndarray   # (R, 3) world-space vertices
    v1: jnp.ndarray
    v2: jnp.ndarray
    n0: jnp.ndarray   # (R, 3) world vertex normals (UNNORMALIZED)
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # (R, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    mat_id: jnp.ndarray      # (R,) int32 material binding
    inst_ntris: jnp.ndarray  # (R,) int32 owning mesh triangle count


def fetch_attr(scene, tri_id, inst_id) -> TriAttr:
    """All shading attributes for global triangles `tri_id` under
    instances `inst_id`, via one combined gather (+ the instanced
    transform of PathTracer.cu:328-346 where applicable)."""
    a = scene.tri_attr[tri_id]                       # (R, 26): 1 gather
    v0, v1, v2 = a[..., 0:3], a[..., 3:6], a[..., 6:9]
    n0, n1, n2 = a[..., 9:12], a[..., 12:15], a[..., 15:18]
    uv0, uv1, uv2 = a[..., 18:20], a[..., 20:22], a[..., 22:24]
    if scene.is_instanced:
        t = scene.tlas
        m = take_small(t.inst_m, inst_id)
        v0, v1, v2 = (_xform_point(m, v0), _xform_point(m, v1),
                      _xform_point(m, v2))
        nm = take_small(t.inst_nrm, inst_id)         # (..., 3, 3)
        xf = lambda n: jnp.einsum("...ij,...j->...i", nm, n,
                          precision="highest")
        n0, n1, n2 = xf(n0), xf(n1), xf(n2)
        mat_id = take_small(t.inst_mat, inst_id)
        ntris = take_small(t.inst_ntris, inst_id)
    else:
        mat_id = a[..., 24].astype(jnp.int32)
        ntris = take_small(scene.inst_ntris, a[..., 25].astype(jnp.int32))
    return TriAttr(v0=v0, v1=v1, v2=v2, n0=n0, n1=n1, n2=n2,
                   uv0=uv0, uv1=uv1, uv2=uv2, mat_id=mat_id,
                   inst_ntris=ntris)


def tri_world_verts(scene, tri_id, inst_id):
    """World-space (v0, v1, v2) of global triangle `tri_id` under
    instance `inst_id` (D_Triangle triangleTransformed analog,
    PathTracer.cu:370-375)."""
    if scene.is_instanced:
        t = scene.tlas
        m = take_small(t.inst_m, inst_id)
        return (_xform_point(m, t.v0[tri_id]),
                _xform_point(m, t.v1[tri_id]),
                _xform_point(m, t.v2[tri_id]))
    b = scene.bvh
    return b.v0[tri_id], b.v1[tri_id], b.v2[tri_id]


def tri_world_normals(scene, tri_id, inst_id):
    """Vertex normals transformed to world (UNNORMALIZED — callers
    normalize after barycentric interpolation; invT^T per
    PathTracer.cu:343-346)."""
    n0 = scene.n0[tri_id]
    n1 = scene.n1[tri_id]
    n2 = scene.n2[tri_id]
    if scene.is_instanced:
        nm = take_small(scene.tlas.inst_nrm, inst_id)  # (..., 3, 3)
        xf = lambda n: jnp.einsum("...ij,...j->...i", nm, n,
                          precision="highest")
        return xf(n0), xf(n1), xf(n2)
    return n0, n1, n2


def world_geometric_normal(scene, tri_id, inst_id) -> jnp.ndarray:
    """UNNORMALIZED world geometric normal of the triangle."""
    from nexus_tpu.geom import triangle as tri_mod

    if scene.is_instanced:
        t = scene.tlas
        gn = tri_mod.geometric_normal(t.v0[tri_id], t.v1[tri_id],
                                      t.v2[tri_id])
        return jnp.einsum("...ij,...j->...i",
                          take_small(t.inst_nrm, inst_id), gn,
                          precision="highest")
    b = scene.bvh
    return tri_mod.geometric_normal(b.v0[tri_id], b.v1[tri_id], b.v2[tri_id])


def material_id(scene, tri_id, inst_id) -> jnp.ndarray:
    """Material binding: per-instance when instanced (PathTracer.cu:331),
    per-triangle in the flat scene."""
    if scene.is_instanced:
        return take_small(scene.tlas.inst_mat, inst_id)
    return scene.tri_meta[tri_id][..., 0]


def hit_inst_ntris(scene, tri_id, inst_id) -> jnp.ndarray:
    """Triangle count of the hit instance's mesh (for the emissive-hit
    MIS light pdf, PathTracer.cu:376)."""
    if scene.is_instanced:
        return take_small(scene.tlas.inst_ntris, inst_id)
    return take_small(scene.inst_ntris, scene.tri_meta[tri_id][..., 1])
