"""Deep-path (reference-default 10-bounce) settings A/B: queue
compaction vs dead-lane parking vs both.

The reference defaults to pathLength=10 (RenderSettings.h:7). Round 4
left parking opt-in with the claim it "pays at 8+ bounces"; round 5's
queue compaction addresses the same dead-lane waste at the trace level
(only the kernel-facing columns move). This interleaved A/B decides
the defaults for the deep regime (VERDICT r4 #5).

Usage: PYTHONPATH=. python benchmarks/ab_deep.py [--scene cornell]
       [--bounces 10]
"""

import argparse
import json
import sys


def main():
    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--bounces", type=int, default=10)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from benchmarks._timing import interleave
    from nexus_tpu import scenes
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.core.zorder import zorder_pixels_jnp
    from nexus_tpu.render.wavefront import render_pixels

    r = args.res
    if args.scene == "interior":
        scene = scenes.interior_scene(r, r, target_tris=1_000_000)
    else:
        scene = scenes.glass_scene(r, r)
    pix = zorder_pixels_jnp(r, r)
    base = RenderSettings(width=r, height=r, path_length=args.bounces)

    variants = {
        "compact": base,
        "direct": dataclasses.replace(base, compact_queues=False),
        "park": dataclasses.replace(base, compact_queues=False,
                                    park_dead_min_tris=1),
        "compact+park": dataclasses.replace(base, park_dead_min_tris=1),
    }
    fns = {k: jax.jit(lambda s, p, i, _st=st: render_pixels(s, _st, p, i))
           for k, st in variants.items()}
    cases = {k: (lambda f=f: f(scene, pix, jnp.uint32(0)))
             for k, f in fns.items()}
    stats = interleave(cases, reps=args.reps, rounds=args.rounds)
    print(json.dumps({
        "scene": args.scene, "res": r, "bounces": args.bounces,
        "ms": {k: v["median"] for k, v in stats.items()},
        "ms_min": {k: v["min"] for k, v in stats.items()},
        "sync_ms": next(iter(stats.values()))["sync_ms"],
    }, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
