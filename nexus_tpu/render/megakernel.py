"""Megakernel path-tracing integrator.

The TPU re-expression of the reference's per-bounce wavefront pipeline
(Generate → Trace → Logic → Shade<BSDF> → NEE/shadow-trace → Accumulate,
Nexus/src/Cuda/PathTracer/PathTracer.cu) as ONE fused jittable function:
a ``lax.scan`` over bounces with per-lane active masks replacing the
atomic work queues, and the lane-wise BSDF dispatch (bsdf/dispatch.py)
replacing the four per-material kernels. XLA fuses the whole bounce body;
there is no host round-trip inside a sample.

Semantics matched to the reference (citations inline):
  - miss → background before Russian roulette    (PathTracer.cu:151-164)
  - RR from bounce 1, p = max(throughput)        (PathTracer.cu:166-175;
    we clamp p ≤ 1 — identical whenever throughput ≤ 1, unbiased either
    way, SURVEY.md §8.4)
  - emissive-hit MIS weight vs lastPdf, disabled at bounce 1
                                                 (PathTracer.cu:352-390)
  - shading-normal flip for backfacing non-dielectric hits
                                                 (PathTracer.cu:408-412)
  - opacity/alpha pass-through: ray continues, no NEE, lastPdf and MIS
    origin intentionally stale                   (PathTracer.cu:418-428)
  - NEE: uniform light → uniform triangle → uniform point, area→solid
    angle pdf, power-heuristic vs BSDF eval pdf  (PathTracer.cu:213-308)
  - conductors shade and do NEE — enabled, unlike the reference's
    disabled kernel (PathTracer.cu:475-478, SURVEY.md §8.1).

Differentiable end-to-end: discrete decisions (RR, lobe pick, light
pick) are measure-preserving reparameterization-free choices — gradients
flow through radiance values, not through the decisions themselves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

import flax.struct

from nexus_tpu.bsdf.dispatch import eval_bsdf, sample_bsdf
from nexus_tpu.core import rng
from nexus_tpu.core.config import RenderSettings
from nexus_tpu.core.math import (barycentric, dot, dot_keep, normalize,
                                 offset_ray, sgne, to_local_frame,
                                 to_world_frame)
from nexus_tpu.core.gather import take_small
from nexus_tpu.core.sampling import (is_pdf_valid, power_heuristic,
                                     uniform_index, uniform_triangle)
from nexus_tpu.geom import triangle as tri_mod
from nexus_tpu.geom.types import MISS_DISTANCE
from nexus_tpu.scene import textures, view
from nexus_tpu.scene.camera import generate_rays
from nexus_tpu.scene.materials import DIELECTRIC
from nexus_tpu.scene.scene import SceneData

_LAST_PDF_INIT = 1.0e10  # first emissive hit gets MIS weight ≈ 1 (PathTracer.cu:118)


def _maybe_remat(body, settings: RenderSettings):
    """settings.remat_bounce: checkpoint each scan step saving ONLY the
    named trace-kernel outputs (scene/view.py checkpoint_name) — the
    reverse pass recomputes the fusible shade/NEE math per bounce
    instead of materializing every intermediate into scan residuals
    (the round-5 glass backward profile's top sink; docs/perf.md)."""
    if not settings.remat_bounce:
        return body
    policy = jax.checkpoint_policies.save_only_these_names("trace")
    return jax.checkpoint(body, policy=policy)


@flax.struct.dataclass
class _PathState:
    """Per-lane path state (D_PathStateSOA analog, PathTracer.cuh:19-29)."""
    ray_o: jnp.ndarray       # (R, 3) current ray origin (offset)
    ray_d: jnp.ndarray       # (R, 3)
    throughput: jnp.ndarray  # (R, 3)
    radiance: jnp.ndarray    # (R, 3)
    last_pdf: jnp.ndarray    # (R,)
    mis_origin: jnp.ndarray  # (R, 3) origin of the last REAL scatter
    active: jnp.ndarray      # (R,) bool
    state: jnp.ndarray       # (R,) uint32 RNG state


def _sample_background(scene: SceneData, direction: jnp.ndarray) -> jnp.ndarray:
    """HDR equirect env map or flat background color.

    Matches SampleBackground (PathTracer.cu:64-83) — except our env maps
    are true float HDR (the reference routes .hdr through its 8-bit LDR
    loader, SURVEY.md §8.3; parity mode lives in io/loader).
    """
    if scene.has_env:
        return textures.sample_equirect(scene.env_map, direction)
    return scene.background_color * scene.background_intensity


def _light_pdf_area(scene: SceneData, wv0, wv1, wv2,
                    n_tris_of_owner: jnp.ndarray) -> jnp.ndarray:
    """1 / (lightCount * triCount * worldArea) over WORLD-space verts
    (PathTracer.cu:367-375 — triangleTransformed.Area(), §8.7)."""
    area = tri_mod.area(wv0, wv1, wv2)
    denom = (jnp.float32(max(scene.n_lights, 1))
             * n_tris_of_owner.astype(jnp.float32) * area)
    return 1.0 / jnp.maximum(denom, 1.0e-20)


def _next_event_estimation(scene: SceneData, settings: RenderSettings,
                           mat, wi_local, normal, g_normal, hit_p,
                           throughput, u4):
    """One NEE sample per lane (NextEventEstimation, PathTracer.cu:213-308).

    Returns (shadow_o, shadow_d, shadow_dist, contribution, do_trace).
    """
    light_id = uniform_index(u4[..., 0], scene.n_lights)
    ntris = take_small(scene.light_ntris, light_id)
    k = uniform_index(u4[..., 1], ntris)
    tri_id = take_small(scene.light_tris,
                        take_small(scene.light_start, light_id) + k)
    light_owner = (take_small(scene.light_inst, light_id)
                   if scene.is_instanced else jnp.zeros_like(light_id))

    uv = uniform_triangle(u4[..., 2], u4[..., 3])
    lat = view.fetch_attr(scene, tri_id, light_owner)  # 1 gather
    lv0, lv1, lv2 = lat.v0, lat.v1, lat.v2
    p_light = barycentric(lv0, lv1, lv2, uv)
    light_gn = normalize(tri_mod.geometric_normal(lv0, lv1, lv2))
    light_n = normalize(barycentric(lat.n0, lat.n1, lat.n2, uv))

    # Offset both endpoints along their geometric normals
    # (PathTracer.cu:251-259).
    to_light = p_light - hit_p
    shadow_o = offset_ray(hit_p, g_normal * sgne(dot(to_light, normal))[..., None])
    p_light = offset_ray(
        p_light, light_gn * sgne(dot(-to_light, light_n))[..., None])
    to_light = p_light - shadow_o
    dist = jnp.sqrt(jnp.maximum(dot(to_light, to_light), 1.0e-20))
    shadow_d = to_light / dist[..., None]

    wo_local = to_local_frame(normal, shadow_d)
    cos_theta_o = jnp.abs(dot(light_n, shadow_d))
    d_sq = dot(to_light, to_light)

    light_pdf = _light_pdf_area(scene, lv0, lv1, lv2, ntris) \
        * d_sq / jnp.maximum(cos_theta_o, 1.0e-8)
    pdf_ok = is_pdf_valid(light_pdf)

    eval_thr, bsdf_pdf, eval_ok = eval_bsdf(
        mat, wi_local, wo_local, settings.strict_fresnel_parity)
    weight = power_heuristic(light_pdf, bsdf_pdf)

    light_mat = scene.materials.take(lat.mat_id)
    # Emissive texture at the sampled light point (PathTracer.cu:295-301).
    light_uv = barycentric(lat.uv0, lat.uv1, lat.uv2, uv)
    emis_tex = textures.sample(scene.textures, light_mat.emissive_map,
                               light_uv)
    emission = jnp.where((light_mat.emissive_map >= 0)[..., None],
                         emis_tex[..., :3], light_mat.emission)
    emissive = emission * light_mat.intensity[..., None]

    contrib = weight[..., None] * throughput * eval_thr * emissive \
        / jnp.maximum(light_pdf, 1.0e-20)[..., None]
    do_trace = pdf_ok & eval_ok & (jnp.max(emissive, axis=-1) > 0.0)
    contrib = jnp.where(do_trace[..., None], contrib, 0.0)
    return shadow_o, shadow_d, dist, contrib, do_trace


def _bounce(scene: SceneData, settings: RenderSettings, ps: _PathState,
            bounce_idx: jnp.ndarray, with_stats: bool = False):
    """One wavefront bounce over all lanes (LogicKernel + Shade + NEE)."""
    # --- Trace (closest hit) -------------------------------------------
    # Dead lanes return a miss; with settings.compact_queues the Pallas
    # path stable-partitions live rays into dense tiles first
    # (render/compact.py — the wavefront queue-compaction analog),
    # otherwise they are parked at +inf origin and skipped per-tile.
    isect = view.closest_hit(scene, ps.ray_o, ps.ray_d, live=ps.active,
                             compact=settings.compact_queues)
    hit = ps.active & (isect.t < MISS_DISTANCE)

    # --- Miss: background (PathTracer.cu:151-164), before RR -----------
    bg = _sample_background(scene, ps.ray_d)
    miss_now = ps.active & ~hit
    radiance = jnp.where(miss_now[..., None],
                         ps.radiance + ps.throughput * bg, ps.radiance)

    # --- Russian roulette (PathTracer.cu:166-175; clamp per §8.4) ------
    # p is DETACHED: dividing by a differentiable p = max(throughput)
    # cancels the parameter dependence of throughput in AD (the gradient
    # then lives only in the discrete survival decision, which AD treats
    # as fixed — silently zeroing material gradients). With p detached,
    # the AD estimator of dE[radiance]/dθ stays unbiased.
    state, u_rr = rng.rand(ps.state)
    p_survive = jax.lax.stop_gradient(
        jnp.clip(jnp.max(ps.throughput, axis=-1), 0.0, 1.0))
    first_bounce = bounce_idx == 0
    # rr_start_bounce: RR disabled before this bounce (reference starts at
    # 1, i.e. immediately after the first hit; set >= path_length to turn
    # RR off entirely, e.g. for FD gradient checks).
    p_survive = jnp.where(bounce_idx < settings.rr_start_bounce,
                          1.0, p_survive)
    survive = u_rr < p_survive
    throughput = ps.throughput / jnp.maximum(p_survive, 1.0e-8)[..., None]
    active = ps.active & hit & survive

    # --- Surface fetch (Shade prologue, PathTracer.cu:319-346;
    # instanced: transform + invT^T normals, material per instance) ----
    tri_id = isect.tri_idx
    inst_id = isect.inst_idx
    # Miss/dead lanes carry garbage barycentrics (refine() against an
    # arbitrary triangle from a parked 1e30 origin can produce ~1e12
    # ratios). Their radiance is masked out below, but hit_p built from
    # them reaches d_sq ~ 1e24 whose VJP overflows to inf — and 0 * inf
    # = NaN poisons gradients of everything that fed the PREVIOUS
    # bounce's direction (roughness, ior). Zero them before any
    # geometry derives from them.
    uv = jnp.where(hit[..., None],
                   jnp.stack([isect.u, isect.v], axis=-1), 0.0)
    attr = view.fetch_attr(scene, tri_id, inst_id)  # ONE combined gather
    v0, v1, v2 = attr.v0, attr.v1, attr.v2
    hit_p = barycentric(v0, v1, v2, uv)
    normal = normalize(barycentric(attr.n0, attr.n1, attr.n2, uv))
    g_normal = normalize(tri_mod.geometric_normal(v0, v1, v2))
    mat = scene.materials.take(attr.mat_id)

    # --- Texture fetches (PathTracer.cu:347-351, 400-405) --------------
    tex_uv = barycentric(attr.uv0, attr.uv1, attr.uv2, uv)
    diffuse_tex = textures.sample(scene.textures, mat.diffuse_map, tex_uv)
    has_dmap = mat.diffuse_map >= 0
    # The reference REPLACES albedo with the texture color (cu:404).
    mat = mat.replace(albedo=jnp.where(
        has_dmap[..., None], diffuse_tex[..., :3], mat.albedo))
    emis_tex = textures.sample(scene.textures, mat.emissive_map, tex_uv)
    mat = mat.replace(emission=jnp.where(
        (mat.emissive_map >= 0)[..., None], emis_tex[..., :3], mat.emission))

    # --- Emissive hit w/ MIS (PathTracer.cu:357-390) -------------------
    emissive = mat.emission * mat.intensity[..., None]
    is_emitter = jnp.max(emissive, axis=-1) > 0.0
    allow_mis = settings.use_mis & ~first_bounce
    cos_o = jnp.abs(dot(normal, ps.ray_d))
    d_sq = dot(hit_p - ps.mis_origin, hit_p - ps.mis_origin)
    hit_light_pdf = _light_pdf_area(
        scene, v0, v1, v2, attr.inst_ntris) \
        * d_sq / jnp.maximum(cos_o, 1.0e-8)
    mis_w = jnp.where(is_pdf_valid(hit_light_pdf),
                      power_heuristic(ps.last_pdf, hit_light_pdf), 0.0)
    weight = jnp.where(allow_mis, mis_w, 1.0)
    emit_contrib = weight[..., None] * emissive * throughput
    radiance = jnp.where((active & is_emitter)[..., None],
                         radiance + emit_contrib, radiance)

    # Last bounce: emissive only, no scatter (PathTracer.cu:394-395).
    scatterable = active & (bounce_idx < settings.path_length - 1)

    # --- Normal flip for backfacing non-dielectrics (cu:408-412) -------
    backface = dot(g_normal, ps.ray_d) > 0.0
    flip = backface & (mat.mtype != DIELECTRIC)
    normal = jnp.where(flip[..., None], -normal, normal)
    g_normal = jnp.where(flip[..., None], -g_normal, g_normal)

    wi_local = to_local_frame(normal, -ps.ray_d)

    # --- Opacity / texture-alpha pass-through (cu:418-428) -------------
    state, u_op = rng.rand(state)
    state, u_alpha = rng.rand(state)
    pass_through = scatterable & (
        (u_op > mat.opacity)
        | (has_dmap & (u_alpha > diffuse_tex[..., 3])))

    # --- NEE (one shadow ray per lane) ---------------------------------
    us = []
    for _ in range(4):
        state, u = rng.rand(state)
        us.append(u)
    u4 = jnp.stack(us, axis=-1)
    n_shadow_rays = jnp.uint32(0)
    do_nee = settings.use_mis and scene.n_lights > 0
    if do_nee:
        sh_o, sh_d, sh_dist, nee_contrib, nee_valid = _next_event_estimation(
            scene, settings, mat, wi_local, normal, g_normal, hit_p,
            throughput, u4)
        nee_valid = nee_valid & scatterable & ~pass_through
        # Trace shadow rays only where needed: the sparse shadow queue
        # is compacted into dense tiles on the Pallas path (round-4
        # measured 17% occupancy on interior bounce rays); dead lanes
        # get t_max = 0 and exit immediately on every path.
        occluded = view.any_hit(scene, sh_o, sh_d, sh_dist - 1.0e-4,
                                live=nee_valid,
                                compact=settings.compact_queues)
        radiance = jnp.where((nee_valid & ~occluded)[..., None],
                             radiance + nee_contrib, radiance)
        if with_stats:
            n_shadow_rays = jnp.sum(nee_valid).astype(jnp.uint32)

    # --- BSDF sample & scatter (cu:430-456) ----------------------------
    us = []
    for _ in range(5):
        state, u = rng.rand(state)
        us.append(u)
    u5 = jnp.stack(us, axis=-1)
    wo_local, sample_thr, sample_pdf, sample_ok = sample_bsdf(
        mat, wi_local, u5, settings.strict_fresnel_parity)
    wo_world = normalize(to_world_frame(normal, wo_local))

    # Pass-through lanes keep direction/throughput/lastPdf/mis_origin
    # (the reference leaves pathState untouched, cu:418-428).
    new_d = jnp.where(pass_through[..., None], ps.ray_d, wo_world)
    new_o = offset_ray(
        hit_p, g_normal * sgne(dot(new_d, normal))[..., None])
    scattered = scatterable & (pass_through | sample_ok)

    new_throughput = jnp.where(
        pass_through[..., None], throughput, throughput * sample_thr)
    new_last_pdf = jnp.where(pass_through, ps.last_pdf, sample_pdf)
    new_mis_origin = jnp.where(pass_through[..., None], ps.mis_origin, new_o)

    new_ps = _PathState(
        ray_o=jnp.where(scattered[..., None], new_o, ps.ray_o),
        ray_d=jnp.where(scattered[..., None], new_d, ps.ray_d),
        throughput=jnp.where(scattered[..., None], new_throughput,
                             throughput),
        radiance=radiance,
        last_pdf=jnp.where(scattered, new_last_pdf, ps.last_pdf),
        mis_origin=jnp.where(scattered[..., None], new_mis_origin,
                             ps.mis_origin),
        active=scattered,
        state=state)
    if with_stats:
        # Honest ray accounting (SURVEY.md §8.6: the reference's Mrays/s
        # counts pixels, not rays — ours counts actual trace + shadow
        # queue occupancy, the wavefront queue-size analog).
        n_trace = jnp.sum(ps.active).astype(jnp.uint32)
        return new_ps, (n_trace, n_shadow_rays)
    return new_ps


def render_pixels(scene: SceneData, settings: RenderSettings,
                  pixel_idx: jnp.ndarray, sample_idx) -> jnp.ndarray:
    """Trace one path per entry of pixel_idx; returns (R, 3) HDR radiance.

    The shardable unit: pixel_idx may be any subset/shard of the image —
    the RNG is keyed on (pixel, sample) so results are identical however
    pixels are partitioned across devices (SURVEY.md §4 shard-equivalence).
    """
    # Hoist the texture neighborhood sheet out of the bounce scan: the
    # per-tap build inside the scan body is rebuilt every bounce (and
    # its transpose every reverse bounce — the top instanced-bwd sink,
    # docs/perf.md round 5).
    scene = scene.replace(textures=textures.with_quad(scene.textures))
    if scene.has_env:   # same hoist for the env-map sheet
        scene = scene.replace(
            env_map=textures.build_env_quad(scene.env_map))
    n = pixel_idx.shape[0]
    state = rng.init_state(pixel_idx.astype(jnp.uint32), sample_idx)

    us = []
    for _ in range(4):
        state, u = rng.rand(state)
        us.append(u)
    ray = generate_rays(scene.camera, pixel_idx.astype(jnp.int32),
                        jnp.stack(us, axis=-1))

    ps = _PathState(
        ray_o=ray.origin, ray_d=ray.direction,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        last_pdf=jnp.full((n,), _LAST_PDF_INIT, jnp.float32),
        mis_origin=ray.origin,
        active=jnp.ones((n,), bool),
        state=state)

    def body(ps, bounce_idx):
        return _bounce(scene, settings, ps, bounce_idx), None

    ps, _ = lax.scan(_maybe_remat(body, settings), ps,
                     jnp.arange(settings.path_length))
    return ps.radiance


def count_rays(scene: SceneData, settings: RenderSettings,
               pixel_idx: jnp.ndarray, sample_idx):
    """Count the trace + shadow rays one sample actually processes.

    Used by the benchmark harness to report real Mrays/s (the wavefront
    queue-occupancy definition) rather than the reference's
    pixels-per-second counter (MetricsPanel.cpp:28,35, SURVEY.md §8.6).
    Returns (n_trace_rays, n_shadow_rays) as uint32 scalars.
    """
    n = pixel_idx.shape[0]
    state = rng.init_state(pixel_idx.astype(jnp.uint32), sample_idx)
    us = []
    for _ in range(4):
        state, u = rng.rand(state)
        us.append(u)
    ray = generate_rays(scene.camera, pixel_idx.astype(jnp.int32),
                        jnp.stack(us, axis=-1))
    ps = _PathState(
        ray_o=ray.origin, ray_d=ray.direction,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        last_pdf=jnp.full((n,), _LAST_PDF_INIT, jnp.float32),
        mis_origin=ray.origin,
        active=jnp.ones((n,), bool),
        state=state)

    def body(ps, bounce_idx):
        return _bounce(scene, settings, ps, bounce_idx, with_stats=True)

    ps, (n_trace, n_shadow) = lax.scan(
        body, ps, jnp.arange(settings.path_length))
    return jnp.sum(n_trace), jnp.sum(n_shadow)


def render_sample(scene: SceneData, settings: RenderSettings,
                  sample_idx) -> jnp.ndarray:
    """Trace one sample per pixel; returns (W*H, 3) HDR radiance."""
    n_pix = scene.camera.width * scene.camera.height
    return render_pixels(scene, settings,
                         jnp.arange(n_pix, dtype=jnp.int32), sample_idx)


@functools.partial(jax.jit, static_argnames=("settings",))
def _render_one(scene, settings, sample_idx):
    """Module-level jit cache: one compilation per (scene treedef,
    settings) — NOT per render() call (a fresh jit closure per call
    would recompile every invocation)."""
    return render_sample(scene, settings, sample_idx)


@functools.partial(jax.jit, static_argnames=("settings", "n_samples"))
def _render_fused(scene, settings, pix, inv, n_samples, sample_offset):
    """All n_samples in ONE dispatch: lax.scan over sample indices.
    sample_offset is traced, so resuming at a different offset does not
    recompile. `pix` is the frame's pixel enumeration (z-order for
    trace-tile coherence, core/zorder.py) and `inv` its inverse; both
    are passed as arguments (a closure-captured 65k constant would be
    re-uploaded per executable)."""
    def body(acc, s):
        return acc + render_pixels(scene, settings, pix,
                                   sample_offset + s), None

    acc, _ = lax.scan(body, jnp.zeros((pix.shape[0], 3), jnp.float32),
                      jnp.arange(n_samples, dtype=jnp.uint32))
    # One gather restores row-major pixel order per frame (not per
    # sample) — lane i held pixel pix[i].
    return acc[inv] / n_samples


def render(scene: SceneData, settings: RenderSettings, n_samples: int,
           sample_offset: int = 0) -> jnp.ndarray:
    """Progressive-mean accumulation over n_samples (AccumulateKernel
    semantics, PathTracer.cu:489-492). Returns (H, W, 3) HDR."""
    from nexus_tpu.core.zorder import zorder_inverse_jnp, zorder_pixels_jnp

    w, h = scene.camera.width, scene.camera.height
    acc = _render_fused(scene, settings, zorder_pixels_jnp(w, h),
                        zorder_inverse_jnp(w, h), n_samples,
                        jnp.uint32(sample_offset))
    return acc.reshape(scene.camera.height, scene.camera.width, 3)
