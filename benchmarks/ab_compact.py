"""Interleaved A/B: trace-queue compaction (render/compact.py) on the
bounce-`b` shadow and closest queues, plus the full fused sample with
RenderSettings.compact_queues on/off.

Round-4 finding this targets (docs/perf.md): interior bounce-1 any-hit
spent 60 ms on 11,160 live shadow rays spread over 512 tiles at 17%
occupancy — dead tiles still walked their blocks. Compaction packs the
live rays into dense head tiles; this script measures what that buys
on the real wavefront at depth, interleaved in one process (the only
valid A/B on the drift-prone tunneled TPU; benchmarks/_timing.py).

Usage: PYTHONPATH=. python benchmarks/ab_compact.py [--res 256]
       [--scene interior] [--bounce 1] [--samples]
"""

import argparse
import json
import sys


def main():
    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default="interior",
                    choices=("cornell_sphere", "bunny", "interior",
                             "instanced"))
    ap.add_argument("--bounce", type=int, default=1)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--path-length", type=int, default=4)
    ap.add_argument("--samples", action="store_true",
                    help="also A/B the full fused sample on/off")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks._timing import interleave
    from nexus_tpu import scenes
    from nexus_tpu.core import rng
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.core.zorder import zorder_pixels_jnp
    from nexus_tpu.render import megakernel as mk
    from nexus_tpu.scene import view

    r = args.res
    if args.scene == "bunny":
        import tempfile

        scene = scenes.bunny_scene(tempfile.mkdtemp(), r, r, subdiv=6)
    elif args.scene == "interior":
        scene = scenes.interior_scene(r, r, target_tris=1_000_000)
    elif args.scene == "instanced":
        scene = scenes.instanced_env_scene(r, r)
    else:
        scene = scenes.glass_scene(r, r)
    settings = RenderSettings(width=r, height=r,
                              path_length=args.path_length)
    n = r * r
    pix = zorder_pixels_jnp(r, r)

    state = rng.init_state(pix.astype(jnp.uint32), jnp.uint32(0))
    us = []
    for _ in range(4):
        state, u = rng.rand(state)
        us.append(u)
    ray = jax.jit(lambda s, p, u: mk.generate_rays(s.camera, p, u))(
        scene, pix, jnp.stack(us, axis=-1))
    ps0 = mk._PathState(
        ray_o=ray.origin, ray_d=ray.direction,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        last_pdf=jnp.full((n,), mk._LAST_PDF_INIT, jnp.float32),
        mis_origin=ray.origin,
        active=jnp.ones((n,), bool), state=state)

    @jax.jit
    def advance(s, p):
        for b in range(args.bounce):
            p = mk._bounce(s, settings, p, jnp.int32(b))
        return p

    ps = jax.block_until_ready(advance(scene, ps0))

    @jax.jit
    def shadow_rays(s, p):
        isect = view.closest_hit(s, p.ray_o, p.ray_d, live=p.active)
        hit = p.active & (isect.t < mk.MISS_DISTANCE)
        uv = jnp.where(hit[..., None],
                       jnp.stack([isect.u, isect.v], axis=-1), 0.0)
        attr = view.fetch_attr(s, isect.tri_idx, isect.inst_idx)
        hit_p = mk.barycentric(attr.v0, attr.v1, attr.v2, uv)
        normal = mk.normalize(
            mk.barycentric(attr.n0, attr.n1, attr.n2, uv))
        g_normal = mk.normalize(
            mk.tri_mod.geometric_normal(attr.v0, attr.v1, attr.v2))
        mat = s.materials.take(attr.mat_id)
        wi_local = mk.to_local_frame(normal, -p.ray_d)
        st, _ = rng.rand(p.state)
        us = []
        for _ in range(4):
            st, u = rng.rand(st)
            us.append(u)
        sh_o, sh_d, sh_dist, _c, valid = mk._next_event_estimation(
            s, settings, mat, wi_local, normal, g_normal, hit_p,
            p.throughput, jnp.stack(us, axis=-1))
        return sh_o, sh_d, sh_dist - 1e-4, valid & hit

    sh_o, sh_d, sh_t, sh_live = jax.block_until_ready(
        shadow_rays(scene, ps))

    from nexus_tpu.render.compact import compact_src

    zero_live = jnp.zeros_like(sh_live)
    cases = {
        # Floor diagnostics: what 512 fully-dead tiles cost (kernel
        # pass-through), and what the index maps alone cost.
        "anyhit_alldead": jax.jit(
            lambda: view.any_hit(scene, sh_o, sh_d, sh_t,
                                 live=zero_live, compact=False)),
        "maps_only": jax.jit(lambda: compact_src(sh_live)[0]),
        "anyhit_direct": jax.jit(
            lambda: view.any_hit(scene, sh_o, sh_d, sh_t,
                                 live=sh_live, compact=False)),
        "anyhit_compact": jax.jit(
            lambda: view.any_hit(scene, sh_o, sh_d, sh_t,
                                 live=sh_live, compact=True)),
        "closest_direct": jax.jit(
            lambda: view.closest_hit(scene, ps.ray_o, ps.ray_d,
                                     live=ps.active, compact=False).t),
        "closest_compact": jax.jit(
            lambda: view.closest_hit(scene, ps.ray_o, ps.ray_d,
                                     live=ps.active, compact=True).t),
    }
    if args.samples:
        s_on = settings
        s_off = RenderSettings(width=r, height=r,
                               path_length=args.path_length,
                               compact_queues=False)

        def sample(stn):
            return jax.jit(
                lambda: mk.render_pixels(scene, stn, pix,
                                         jnp.uint32(0)),
                static_argnames=())
        cases["sample_compact"] = sample(s_on)
        cases["sample_direct"] = sample(s_off)

    stats = interleave(cases, reps=args.reps, rounds=args.rounds)
    out = {
        "scene": args.scene, "res": r, "bounce": args.bounce,
        "lanes": n,
        "active": int(jnp.sum(ps.active)),
        "shadow_live": int(jnp.sum(sh_live)),
        "ms": {k: v["median"] for k, v in stats.items()},
        "ms_min": {k: v["min"] for k, v in stats.items()},
        "sync_ms": stats["anyhit_direct"]["sync_ms"],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
