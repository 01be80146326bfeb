"""Per-stage timing decomposition: trace / shadow / sort / shade.

Answers "where does the Mrays/s go" (VERDICT r1: the end-to-end number
could not be decomposed). Each stage is timed as its own jitted
function on warm buffers, so stage sums won't exactly equal the fused
pipeline (XLA fuses across stages there) — they bound it and rank the
costs.

Usage:  PYTHONPATH=. python benchmarks/stage_timings.py [--res 256]
        [--cpu]
"""

import argparse
import json
import sys
import time


def timeit(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default="cornell_sphere",
                    choices=("cornell_sphere", "bunny", "interior"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from nexus_tpu import scenes
    from nexus_tpu.core import rng
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.render.megakernel import _LAST_PDF_INIT, _bounce, \
        _PathState
    from nexus_tpu.render.wavefront import _octant
    from nexus_tpu.scene import view
    from nexus_tpu.scene.camera import generate_rays

    r = args.res
    if args.scene == "bunny":
        import tempfile

        scene = scenes.bunny_scene(tempfile.mkdtemp(), r, r, subdiv=6)
    elif args.scene == "interior":
        scene = scenes.interior_scene(r, r, target_tris=1_000_000)
    else:
        scene = scenes.glass_scene(r, r)
    settings = RenderSettings(width=r, height=r, path_length=4)
    n = r * r
    pix = jnp.arange(n, dtype=jnp.int32)

    state = rng.init_state(pix.astype(jnp.uint32), jnp.uint32(0))
    us = []
    for _ in range(4):
        state, u = rng.rand(state)
        us.append(u)
    ray = jax.jit(lambda s, p, u: generate_rays(s.camera, p, u))(
        scene, pix, jnp.stack(us, axis=-1))

    stages = {}
    stages["trace_closest"] = timeit(
        jax.jit(lambda s, o, d: view.closest_hit(s, o, d).t),
        scene, ray.origin, ray.direction)
    stages["trace_shadow"] = timeit(
        jax.jit(lambda s, o, d: view.any_hit(s, o, d, 5.0)),
        scene, ray.origin, ray.direction)
    stages["sort_octant"] = timeit(
        jax.jit(lambda d: jnp.argsort(_octant(d))), ray.direction)

    ps = _PathState(
        ray_o=ray.origin, ray_d=ray.direction,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        last_pdf=jnp.full((n,), _LAST_PDF_INIT, jnp.float32),
        mis_origin=ray.origin,
        active=jnp.ones((n,), bool), state=state)
    stages["full_bounce"] = timeit(
        jax.jit(lambda s, p: _bounce(s, settings, p, jnp.int32(0)).radiance),
        scene, ps)
    # Shade+NEE-math = bounce minus its two traces (approximate: the
    # bounce jit fuses, but trace dominates are comparable).
    stages["shade_nee_approx"] = max(
        stages["full_bounce"] - stages["trace_closest"]
        - stages["trace_shadow"], 0.0)

    out = {
        "scene": args.scene, "res": r,
        "tris": int(scene.tri_count),
        "backend": jax.devices()[0].platform,
        "rays": n,
        "stages_ms": {k: round(v * 1e3, 3) for k, v in stages.items()},
        "trace_mrays_s": round(n / stages["trace_closest"] / 1e6, 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
