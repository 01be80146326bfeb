"""Interleaved A/B: VMEM-resident triangle blocks vs HBM+DMA pops.

The round-5 tile-sweep fit (docs/perf.md) put the HBM kernel's per-pop
cost at ~0.79 us FIXED — the serial select→DMA→wait dependency — and
only ~0.21 us of (R,128) VPU work. Scenes whose whole blocked tri
array fits in VMEM (~16 MB/core; cornell 92 KB, bunny 3.3 MB, the
instanced BLAS 205 KB) can delete the DMA leg entirely and run
selection at ZERO staleness (flight=1, depth=1). This measures both
kernels on REAL bounce-depth rays of a real scene, interleaved in one
process (timing discipline rule #2).

Usage: PYTHONPATH=. python benchmarks/ab_vmem.py [--scene bunny]
       [--bounce 1] [--reps 10] [--rounds 5]
"""

import argparse
import json
import sys


def main():
    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default="bunny")
    ap.add_argument("--bounce", type=int, default=1)
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
    if args.scene == "bunny":
        import tempfile

        scene = scenes.bunny_scene(tempfile.mkdtemp(), r, r, subdiv=6)
    elif args.scene == "instanced":
        scene = scenes.instanced_env_scene(r, r, n_inst=25, subdiv=4)
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

    if args.bounce:
        ps = jax.block_until_ready(advance(scene, ps))
    o = jnp.where(ps.active[:, None], ps.ray_o, 1.0e30)
    d = jnp.where(ps.active[:, None], ps.ray_d, 1.0)
    bs = scene.blocked
    tri_mb = bs.tri.size * 4 / 2**20

    cases = {
        "closest_hbm": lambda: K.closest_hit_scene(
            bs, o, d, vmem_tris=False)[0],
        "closest_vmem": lambda: K.closest_hit_scene(
            bs, o, d, vmem_tris=True)[0],
        "anyhit_hbm": lambda: K.any_hit_scene(
            bs, o, d, 1.0, vmem_tris=False),
        "anyhit_vmem": lambda: K.any_hit_scene(
            bs, o, d, 1.0, vmem_tris=True),
    }
    stats = interleave(cases, reps=args.reps, rounds=args.rounds)

    # Correctness cross-check on chip before reporting timings.
    t0, s0, _ = K.closest_hit_scene(bs, o, d, vmem_tris=False)
    t1, s1, _ = K.closest_hit_scene(bs, o, d, vmem_tris=True)
    agree = bool(np.allclose(np.asarray(t0), np.asarray(t1))
                 and (np.asarray(s0) == np.asarray(s1)).all())

    out = {"scene": args.scene, "bounce": args.bounce,
           "tri_mb": round(tri_mb, 2),
           "active": int(jnp.sum(ps.active)),
           "agree": agree,
           "ms": {k: v["median"] for k, v in stats.items()},
           "ms_min": {k: v["min"] for k, v in stats.items()},
           "sync_ms": next(iter(stats.values()))["sync_ms"]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
