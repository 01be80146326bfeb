"""Interleaved A/B of the backward pass: plain scan residuals vs the
remat_bounce checkpoint policy (save only the named trace outputs).

VERDICT r4 #4: glass bwd/fwd = 0.66, bunny 0.72 with no committed
profile. benchmarks/profile_bwd.py attributed the extra backward time
to scan residual stacking (~100 dynamic_update_slice/slice pairs per
bounce); remat_bounce recomputes the fusible shade math in reverse
from the saved trace results instead. This measures fwd, bwd(plain),
bwd(remat) interleaved in one process.

Usage: PYTHONPATH=. python benchmarks/ab_bwd.py [--scene glass|bunny|
       cornell_sphere|interior] [--res 256]
"""

import argparse
import dataclasses
import json
import sys
import tempfile


def main():
    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="glass")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks._timing import interleave
    from nexus_tpu import scenes
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.core.zorder import zorder_pixels_jnp
    from nexus_tpu.render.wavefront import render_pixels

    r = args.res
    bounces = 6 if args.scene == "glass" else 4
    if args.scene == "bunny":
        scene = scenes.bunny_scene(tempfile.mkdtemp(), r, r, subdiv=6)
    elif args.scene == "interior":
        scene = scenes.interior_scene(r, r, target_tris=1_000_000)
    else:
        scene = scenes.glass_scene(r, r)
    plain = RenderSettings(width=r, height=r, path_length=bounces,
                           remat_bounce=False)
    remat = dataclasses.replace(plain, remat_bounce=True)
    pix = zorder_pixels_jnp(r, r)

    def loss(materials, s, p, i, st):
        img = render_pixels(s.replace(materials=materials), st, p, i)
        return jnp.mean(jnp.clip(img, 0.0, 10.0))

    fwd = jax.jit(lambda s, p, i: render_pixels(s, plain, p, i))
    bwd_p = jax.jit(lambda s, p, i: jax.grad(loss, allow_int=True)(
        s.materials, s, p, i, plain))
    bwd_r = jax.jit(lambda s, p, i: jax.grad(loss, allow_int=True)(
        s.materials, s, p, i, remat))

    cases = {
        "fwd": lambda: fwd(scene, pix, jnp.uint32(1)),
        "bwd_plain": lambda: bwd_p(scene, pix, jnp.uint32(1)),
        "bwd_remat": lambda: bwd_r(scene, pix, jnp.uint32(1)),
    }
    stats = interleave(cases, reps=args.reps, rounds=args.rounds)
    ms = {k: v["median"] for k, v in stats.items()}
    print(json.dumps({
        "scene": args.scene, "res": r, "bounces": bounces,
        "ms": ms,
        "ms_min": {k: v["min"] for k, v in stats.items()},
        "ratio_plain": round(ms["fwd"] / ms["bwd_plain"], 3),
        "ratio_remat": round(ms["fwd"] / ms["bwd_remat"], 3),
        "sync_ms": stats["fwd"]["sync_ms"],
    }, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
