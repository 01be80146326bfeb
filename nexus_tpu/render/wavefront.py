"""Wavefront integrator: sorted-compaction bounce pipeline.

The reference's wavefront architecture routes rays through global work
queues so each kernel runs on a dense, coherent working set
(Nexus/src/Cuda/PathTracer/PathTracer.cu:177-209 queue routing;
Nexus/src/Renderer/PathTracer.cpp:114-124 stage graph). On TPU, the
default coherence mechanism is the Z-ORDER pixel enumeration
(core/zorder.py): trace tiles are compact pixel blocks for camera rays
and stay spatially grouped across bounces, and dead lanes are parked at
+inf origin so the trace kernel's slab tests skip them.

This module adds the queue analog on top, OPT-IN via
RenderSettings.sort_lanes (default False): before every bounce the
lanes are reordered by (dead, direction-octant) with one `jnp.argsort`:

  - dead lanes sink to the tail, so whole ray tiles of the Pallas trace
    kernel are parked and skip every triangle block — tile-granular
    stream compaction without a host round-trip or a shape change;
  - live lanes cluster by octant, making tiles directionally coherent —
    the TPU analog of the reference's warp-coherence tricks (dynamic ray
    fetch + triangle postponement, BVH8Traversal.cuh:171-180,269-277).

It is off by default because it does not currently pay: the argsort +
pytree permute costs ~6.5 ms per 65k-lane bounce on v5e while the
per-ray-culling kernel tolerates the residual incoherence of z-ordered
lanes (docs/perf.md). With sort_lanes=False this module is the
megakernel integrator plus a no-op permutation (kept as one honest code
path; the sort becomes worthwhile for deep bounce trees where most
lanes die early).

The bounce body itself is shared with render/megakernel.py (`_bounce`),
so the two integrators are sampling-identical per lane; only lane ORDER
differs, and the RNG is per-lane state carried through the permutation,
so results match the megakernel exactly up to float addition order (it
is exact: each lane's path is computed identically, just at a different
row).

Radiance is unsorted back to pixel order with one scatter at the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nexus_tpu.core import rng
from nexus_tpu.core.config import RenderSettings
from nexus_tpu.render.megakernel import (_LAST_PDF_INIT, _bounce,
                                         _maybe_remat, _PathState)
from nexus_tpu.scene.camera import generate_rays
from nexus_tpu.scene.scene import SceneData


def _octant(d: jnp.ndarray) -> jnp.ndarray:
    neg = d < 0
    return (neg[..., 0].astype(jnp.int32)
            | (neg[..., 1].astype(jnp.int32) << 1)
            | (neg[..., 2].astype(jnp.int32) << 2))


def render_pixels(scene: SceneData, settings: RenderSettings,
                  pixel_idx: jnp.ndarray, sample_idx) -> jnp.ndarray:
    """Trace one path per pixel_idx entry with per-bounce lane sorting.

    Drop-in replacement for megakernel.render_pixels (same signature,
    same estimator); preferable whenever the Pallas trace kernel is in
    use — sorted tiles cull better and dead tiles cost nothing.
    """
    from nexus_tpu.scene import textures as _textures

    # Hoist the texture neighborhood sheet out of the bounce scan
    # (see megakernel.render_pixels / docs/perf.md round 5).
    scene = scene.replace(textures=_textures.with_quad(scene.textures))
    if scene.has_env:   # same hoist for the env-map sheet
        scene = scene.replace(
            env_map=_textures.build_env_quad(scene.env_map))
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
    lane_pix = jnp.arange(n, dtype=jnp.int32)

    # Dead-lane PARKING: a stable 1-bit partition per bounce sinks dead
    # lanes to the tail WITHOUT disturbing the z-order of live lanes,
    # so whole trace tiles go fully-dead and skip every block (the
    # queue-compaction analog at its cheapest). Opt-in via
    # settings.park_dead_min_tris (default off): at 4 bounces the
    # ~13 ms/bounce permute measured 3% net SLOWER on the 1M interior —
    # it pays for deep path lengths where late bounces are mostly dead.
    park = (not settings.sort_lanes
            and 0 < settings.park_dead_min_tris <= scene.tri_count)

    def body(carry, bounce):
        ps, lane_pix = carry
        if settings.sort_lanes:
            # Full sort: live-first, then by direction octant (the
            # queue analog). Stable, so image coherence survives within
            # each octant. Off by default — see RenderSettings.
            key = jnp.where(ps.active, _octant(ps.ray_d), 8)
            perm = jnp.argsort(key, stable=True)
            ps = jax.tree.map(lambda a: a[perm], ps)
            lane_pix = lane_pix[perm]
        elif park:
            perm = jnp.argsort(~ps.active, stable=True)
            ps = jax.tree.map(lambda a: a[perm], ps)
            lane_pix = lane_pix[perm]
        ps = _bounce(scene, settings, ps, bounce)
        return (ps, lane_pix), None

    (ps, lane_pix), _ = jax.lax.scan(
        _maybe_remat(body, settings), (ps, lane_pix),
        jnp.arange(settings.path_length))

    # Unsort: one scatter back to pixel order.
    out = jnp.zeros((n, 3), jnp.float32)
    return out.at[lane_pix].set(ps.radiance)


@functools.partial(jax.jit, static_argnames=("settings", "n_samples"))
def _render_fused(scene, settings, pix, inv, n_samples, sample_offset):
    """All n_samples in ONE dispatch (lax.scan over sample indices),
    cached at module level — a fresh jit closure per render() call
    would recompile every invocation. sample_offset is traced so
    resuming does not recompile. `pix`/`inv` are the z-order pixel
    enumeration and its inverse (core/zorder.py)."""
    def body(acc, s):
        return acc + render_pixels(scene, settings, pix,
                                   sample_offset + s), None

    acc, _ = jax.lax.scan(body, jnp.zeros((pix.shape[0], 3), jnp.float32),
                          jnp.arange(n_samples, dtype=jnp.uint32))
    return acc[inv] / n_samples


def render(scene: SceneData, settings: RenderSettings, n_samples: int,
           sample_offset: int = 0) -> jnp.ndarray:
    """Progressive-mean accumulation (AccumulateKernel semantics,
    PathTracer.cu:489-492) over the wavefront pipeline."""
    from nexus_tpu.core.zorder import zorder_inverse_jnp, zorder_pixels_jnp

    w, h = scene.camera.width, scene.camera.height
    acc = _render_fused(scene, settings, zorder_pixels_jnp(w, h),
                        zorder_inverse_jnp(w, h), n_samples,
                        jnp.uint32(sample_offset))
    return acc.reshape(scene.camera.height, scene.camera.width, 3)
