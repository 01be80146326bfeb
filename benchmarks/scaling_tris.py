"""Trace throughput vs scene size: the HBM-resident kernel's scaling
claim (kernels/trace_hbm.py cost model — time grows with visible local
complexity, not scene size).

Sweeps blob scenes from ~5k to ~1.3M triangles, traces coherent camera
rays, reports Mrays/s per size (and optionally a TILE_R sweep).

TIMING HYGIENE: the first device-to-host readback in a process
permanently disables the axon tunnel's fast dispatch (~16 ms/call
after; see bench.py docstring). Every readback (hit counts) is
deferred until all configs have been timed.

Usage:  PYTHONPATH=. python benchmarks/scaling_tris.py [--rays 262144]
        [--subdivs 4 5 6 7 8] [--tiles 128 256 512] [--cpu]
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--subdivs", type=int, nargs="+", default=[4, 5, 6, 7])
    ap.add_argument("--tiles", type=int, nargs="+", default=None,
                    help="also sweep TILE_R values")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU interpret-free run (slow; for smoke only)")
    args = ap.parse_args()

    import jax

    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from nexus_tpu.accel import bvh2
    from nexus_tpu.kernels import trace_hbm as K
    from nexus_tpu.scenes import blob_mesh

    results = []
    deferred_hits = []   # device arrays; read back only after all timing
    for sub in args.subdivs:
        v, f = blob_mesh(sub)
        v0 = v[f[:, 0]]
        v1 = v[f[:, 1]]
        v2 = v[f[:, 2]]
        t_build0 = time.perf_counter()
        tree = bvh2.build(v0, v1, v2, leaf_size=8)
        bs = K.build_blocked_flat(v0, v1, v2, tree.tri_order)
        build_s = time.perf_counter() - t_build0

        # Coherent camera-style rays toward the blob.
        rng = np.random.default_rng(0)
        n = args.rays
        o = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
        side = int(np.sqrt(n))
        gx, gy = np.meshgrid(np.linspace(-1, 1, side),
                             np.linspace(-1, 1, side))
        tgt = np.stack([gx.ravel(), gy.ravel(),
                        np.zeros(side * side)], axis=1)
        tgt = np.concatenate([tgt, rng.uniform(-1, 1, (n - side * side, 3))])
        d = tgt.astype(np.float32) - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o_j, d_j = jnp.asarray(o), jnp.asarray(d.astype(np.float32))

        interp = jax.default_backend() != "tpu"   # Pallas CPU = interpret
        for tile_r in (args.tiles or [K.TILE_R]):
            t, slot, inst = K.closest_hit_scene(bs, o_j, d_j,
                                                tile_r=tile_r,
                                                interpret=interp)
            t.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.reps):
                t, slot, inst = K.closest_hit_scene(bs, o_j, d_j,
                                                    tile_r=tile_r,
                                                    interpret=interp)
            t.block_until_ready()
            dt = (time.perf_counter() - t0) / args.reps
            rec = {
                "tris": int(f.shape[0]), "rays": n, "tile_r": tile_r,
                "ms": round(dt * 1e3, 3),
                "mrays_s": round(n / dt / 1e6, 3),
                "build_s": round(build_s, 2),
                "blocks": int(bs.n_blocks),
                "backend": jax.devices()[0].platform,
            }
            results.append(rec)
            deferred_hits.append(slot)

    # All timing done — readbacks are now safe.
    for rec, slot in zip(results, deferred_hits):
        rec["hit_frac"] = round(
            int((np.asarray(slot) >= 0).sum()) / rec["rays"], 3)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
