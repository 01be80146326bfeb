"""Trace throughput vs scene size: the HBM-resident kernel's scaling
claim (kernels/trace_hbm.py cost model — time grows with visible local
complexity, not scene size).

Sweeps blob scenes from ~5k to ~1.3M triangles, traces coherent
camera-style rays in Z-ORDER tiles (core/zorder.py — the production
enumeration), reports per-size timing with dispersion.

MEASUREMENT DISCIPLINE (benchmarks/_timing.py): all sizes are timed
with round-robin INTERLEAVING in one process (cross-process and even
cross-minute absolute numbers on the tunneled TPU vary up to 3x, so a
sequential sweep confounds size with drift — round 3's committed sweep
suffered exactly that); every readback (hit counts) is deferred until
all timing is done (readback poison).

Usage:  PYTHONPATH=. python benchmarks/scaling_tris.py [--rays 65536]
        [--subdivs 4 5 6 7 8] [--tiles 128 256 512] [--cpu]
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--subdivs", type=int, nargs="+", default=[4, 5, 6, 7])
    ap.add_argument("--tiles", type=int, nargs="+", default=None,
                    help="also sweep TILE_R values")
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU interpret-free run (slow; for smoke only)")
    args = ap.parse_args()

    import jax

    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import time

    import jax.numpy as jnp
    import numpy as np

    from benchmarks._timing import interleave
    from nexus_tpu.accel import bvh2
    from nexus_tpu.core.zorder import zorder_pixels
    from nexus_tpu.kernels import trace_hbm as K
    from nexus_tpu.scenes import blob_mesh

    n = args.rays
    side = int(np.sqrt(n))
    assert side * side == n, "--rays must be a square"
    zp = zorder_pixels(side, side)

    interp = False
    cases = {}
    meta = {}
    outs = {}
    for sub in args.subdivs:
        v, f = blob_mesh(sub)
        v0 = v[f[:, 0]]
        v1 = v[f[:, 1]]
        v2 = v[f[:, 2]]
        t_build0 = time.perf_counter()
        tree = bvh2.build(v0, v1, v2, leaf_size=8)
        bs = K.build_blocked_flat(v0, v1, v2, tree.tri_order)
        build_s = time.perf_counter() - t_build0

        # Coherent camera-style rays toward the blob, z-order tiled.
        o = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
        gx, gy = np.meshgrid(np.linspace(-1, 1, side),
                             np.linspace(-1, 1, side))
        tgt = np.stack([gx.ravel(), gy.ravel(), np.zeros(n)], axis=1)
        d = (tgt - o).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o_j = jnp.asarray(o[zp])
        d_j = jnp.asarray(d[zp])

        import jax as _jax

        interp = _jax.default_backend() != "tpu"
        for tile_r in (args.tiles or [K.TILE_R]):
            key = f"sub{sub}_t{tile_r}"
            cases[key] = (lambda bs=bs, o_j=o_j, d_j=d_j, tile_r=tile_r:
                          K.closest_hit_scene(bs, o_j, d_j,
                                              tile_r=tile_r,
                                              interpret=interp)[0])
            meta[key] = {"tris": int(f.shape[0]), "rays": n,
                         "tile_r": tile_r, "build_s": round(build_s, 2),
                         "blocks": int(bs.n_blocks)}
            outs[key] = K.closest_hit_scene(bs, o_j, d_j, tile_r=tile_r,
                                            interpret=interp)[1]

    stats = interleave(cases, reps=args.reps, rounds=args.rounds)

    # All timing done — readbacks are now safe.
    results = []
    for key, st in stats.items():
        rec = dict(meta[key])
        rec.update({
            "ms": st["min"], "ms_median": st["median"],
            "ms_max": st["max"],
            # Headline uses the MEDIAN like bench.py (same-named units
            # must be cross-file comparable; min overstates throughput
            # on the drift-prone tunnel). Best-case kept separately.
            "mrays_s": round(n / st["median"] / 1e3, 1),
            "mrays_s_best": round(n / st["min"] / 1e3, 1),
            "backend": jax.devices()[0].platform,
            "hit_frac": round(
                int((np.asarray(outs[key]) >= 0).sum()) / n, 3),
        })
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
