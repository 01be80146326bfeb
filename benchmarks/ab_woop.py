"""Interleaved A/B: Moller-Trumbore (VPU) vs Woop MXU-matmul block
intersection (kernels/trace_hbm.py `_woop_block`).

The round-4 roofline statement (docs/perf.md): the trace kernel is
VPU-instruction-issue bound at ~45 (R,128) ops per pop with HBM at
~1/800 of capacity — the MXU is the only idle unit. The Woop layout
precomputes per-triangle inverse-affine transforms at block-build time
so a 128-ray x 128-tri test becomes three (2R,4)x(4,128) f32 matmuls
plus ~28 VPU ops. This measures both layouts on identical scenes and
rays, interleaved in one process (benchmarks/_timing.py discipline).
Verdict rule (VERDICT r4 #2): adopt if >=1.5x on the intersect-heavy
phase, else commit the negative result.

Usage: PYTHONPATH=. python benchmarks/ab_woop.py [--subdivs 4 6]
       [--rays 65536]
"""

import argparse
import json
import sys
import time


def main():
    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--subdivs", type=int, nargs="*", default=[4, 6, 7])
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

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

    cases, meta, agree = {}, {}, {}
    for sub in args.subdivs:
        v, f = blob_mesh(sub)
        v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        tree = bvh2.build(v0, v1, v2, leaf_size=8)
        bs_mt = K.build_blocked_flat(v0, v1, v2, tree.tri_order)
        bs_wp = K.build_blocked_flat(v0, v1, v2, tree.tri_order,
                                     woop=True)

        o = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
        gx, gy = np.meshgrid(np.linspace(-1, 1, side),
                             np.linspace(-1, 1, side))
        tgt = np.stack([gx.ravel(), gy.ravel(), np.zeros(n)], axis=1)
        d = (tgt - o).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o_j, d_j = jnp.asarray(o[zp]), jnp.asarray(d[zp])

        interp = jax.default_backend() != "tpu"
        for name, bs in (("mt", bs_mt), ("woop", bs_wp)):
            key = f"sub{sub}_{name}"
            cases[key] = (lambda bs=bs, o_j=o_j, d_j=d_j:
                          K.closest_hit_scene(bs, o_j, d_j,
                                              interpret=interp)[0])
            meta[key] = {"tris": int(f.shape[0]), "rays": n,
                         "blocks": int(bs.n_blocks), "layout": name}
        # Correctness cross-check: identical winning tri on >=99.9% of
        # rays (f32 tie-breaks near shared edges may differ).
        s_mt = np.asarray(K.closest_hit_scene(bs_mt, o_j, d_j,
                                              interpret=interp)[1])
        s_wp = np.asarray(K.closest_hit_scene(bs_wp, o_j, d_j,
                                              interpret=interp)[1])
        agree[f"sub{sub}"] = round(float((s_mt == s_wp).mean()), 5)

    stats = interleave(cases, reps=args.reps, rounds=args.rounds)
    out = {"agree_frac": agree, "results": []}
    for key, st in stats.items():
        rec = dict(meta[key])
        rec.update({"ms": st["median"], "ms_min": st["min"],
                    "mrays_s": round(n / st["median"] / 1e3, 1)})
        out["results"].append(rec)
    out["sync_ms"] = next(iter(stats.values()))["sync_ms"]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
