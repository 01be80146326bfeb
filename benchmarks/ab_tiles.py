"""Interleaved tile_r sweep on REAL bounce-depth rays + pop counters.

Round-4 swept TILE_R on camera/synthetic rays (docs/perf.md: 128 wins).
This sweeps the closest-hit kernel on the actual wavefront at depth
`--bounce` of a real scene, with `closest_hit_stats` pop counters, to
re-check the cost model where it matters (interior bounce rays are the
140 ms line item): per-pop VPU cost scales with TILE_R (R/8 issue
slots), per-tile alive-entry UNION shrinks with footprint, tile count
doubles as R halves — the product decides.

Usage: PYTHONPATH=. python benchmarks/ab_tiles.py [--scene interior]
       [--bounce 1] [--tiles 64 128 256]
"""

import argparse
import json
import sys


def main():
    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default="interior")
    ap.add_argument("--bounce", type=int, default=1)
    ap.add_argument("--tiles", type=int, nargs="*", default=[64, 128, 256])
    ap.add_argument("--depths", type=int, nargs="*", default=[2],
                    help="DMA pipeline depths (flights in flight)")
    ap.add_argument("--flights", type=int, nargs="*", default=[None],
                    help="entries per flight (default: auto)")
    ap.add_argument("--bpe", type=int, default=0,
                    help="rebuild with this blocks_per_entry")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks._timing import interleave
    from nexus_tpu import scenes
    from nexus_tpu.core import rng
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.core.zorder import zorder_pixels_jnp
    from nexus_tpu.kernels import trace_hbm as K
    from nexus_tpu.render import megakernel as mk

    r = args.res
    if args.scene == "interior":
        scene = scenes.interior_scene(r, r, target_tris=1_000_000)
    elif args.scene == "bunny":
        import tempfile

        scene = scenes.bunny_scene(tempfile.mkdtemp(), r, r, subdiv=6)
    else:
        scene = scenes.glass_scene(r, r)
    settings = RenderSettings(width=r, height=r, path_length=4)
    n = r * r
    pix = zorder_pixels_jnp(r, r)
    state = rng.init_state(pix.astype(jnp.uint32), jnp.uint32(0))
    us = []
    for _ in range(4):
        state, u = rng.rand(state)
        us.append(u)
    ray = jax.jit(lambda s, p, u: mk.generate_rays(s.camera, p, u))(
        scene, pix, jnp.stack(us, axis=-1))
    ps = mk._PathState(
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

    ps = jax.block_until_ready(advance(scene, ps))
    o = jnp.where(ps.active[:, None], ps.ray_o, 1.0e30)
    d = jnp.where(ps.active[:, None], ps.ray_d, 1.0)
    bs = scene.blocked
    if args.bpe and args.bpe != bs.blocks_per_entry:
        # Rebuild the blocked layout with an explicit blocks_per_entry
        # from the scene's world-space verts (flat scenes: tri_attr
        # rows 0..8 are world verts in GLOBAL-id order).
        assert not scene.is_instanced
        ta = np.asarray(scene.tri_attr)
        bs = K.build_blocked_flat(
            ta[:, 0:3], ta[:, 3:6], ta[:, 6:9],
            np.arange(ta.shape[0], dtype=np.int32),
            blocks_per_entry=args.bpe)

    cases = {}
    for t in args.tiles:
        for dp in args.depths:
            for fl in args.flights:
                key = f"tile{t}_d{dp}" + (f"_f{fl}" if fl else "")
                cases[key] = (
                    lambda t=t, dp=dp, fl=fl: K.closest_hit_scene(
                        bs, o, d, tile_r=t, depth=dp, flight=fl)[0])
    stats = interleave(cases, reps=args.reps, rounds=args.rounds)

    pops = {}
    for t in args.tiles:
        _t, _s, _i, pc = K.closest_hit_stats(bs, o, d, tile_r=t)
        pc = np.asarray(pc)
        pops[f"tile{t}_d2"] = {
            "tiles": int(pc.shape[0]),
            "chunk_pops_mean": round(float(pc[:, 0].mean()), 1),
            "isect_mean": round(float(pc[:, 1].mean()), 1),
            "isect_total": int(pc[:, 1].sum()),
        }

    out = {"scene": args.scene, "bounce": args.bounce,
           "active": int(jnp.sum(ps.active)),
           "ms": {k: v["median"] for k, v in stats.items()},
           "ms_min": {k: v["min"] for k, v in stats.items()},
           "pops": pops,
           "sync_ms": next(iter(stats.values()))["sync_ms"]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
