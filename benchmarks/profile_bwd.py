"""Fused-program profile of forward vs value+grad (VERDICT r4 #4).

Captures a jax.profiler device trace of (a) one forward sample and
(b) one value+grad of the same sample, then aggregates device-op time
by kernel name so the EXTRA cost of the backward program is attributed
to named ops — the honest way to find backward sinks (isolated per-op
timings are dispatch-floor artifacts; docs/perf.md discipline #1).

Usage: PYTHONPATH=. python benchmarks/profile_bwd.py
         [--scene glass|cornell_sphere|bunny] [--res 256] [--spp 1]
Prints a JSON summary: top device ops for fwd and bwd programs and the
fwd/bwd totals.
"""

import argparse
import collections
import glob
import json
import os
import sys
import tempfile


_CONTAINERS = ("%while", "%cond", "%copy-start", "%copy-done")


def _aggregate(logdir):
    """Sum device-plane LEAF op durations by (shortened) op name.

    Containers (%while/%cond) hold their children's time and async copy
    start/done events span their wait time — summing those double- or
    wildly over-counts (an early draft attributed 695 ms of a 44 ms
    program to %copy-start). Kept: '%'-prefixed leaf thunks. The
    program wall per call is reported separately from the 'jit_' span."""
    from jax.profiler import ProfileData

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    agg = collections.Counter()
    program = 0.0
    for f in files:
        pd = ProfileData.from_file(f)
        for plane in pd.planes:
            nm = plane.name.lower()
            if not ("tpu" in nm or "device" in nm or "axon" in nm):
                continue
            if "host" in nm:
                continue
            for line in plane.lines:
                for ev in line.events:
                    dur = ev.duration_ns / 1e6
                    name = ev.name.split(".")[0][:60]
                    if name.startswith("jit_"):
                        program += dur
                        continue
                    if not name.startswith("%"):
                        continue
                    if any(name.startswith(c) for c in _CONTAINERS):
                        continue
                    agg[name] += dur
    return agg, program


def main():
    from nexus_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="glass")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--bounces", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nexus_tpu import scenes
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.core.zorder import zorder_pixels_jnp
    from nexus_tpu.render.wavefront import render_pixels

    r = args.res
    if args.scene == "bunny":
        scene = scenes.bunny_scene(tempfile.mkdtemp(), r, r, subdiv=6)
        args.bounces = 4
    elif args.scene == "cornell_sphere":
        scene = scenes.glass_scene(r, r)
        args.bounces = 4
    elif args.scene == "instanced":
        scene = scenes.instanced_env_scene(r, r, n_inst=25, subdiv=4)
        args.bounces = 4
    else:
        scene = scenes.glass_scene(r, r)
    settings = RenderSettings(width=r, height=r,
                              path_length=args.bounces)
    pix = zorder_pixels_jnp(r, r)

    fwd = jax.jit(lambda s, p, i: render_pixels(s, settings, p, i))

    def loss(materials, s, p, i):
        img = render_pixels(s.replace(materials=materials),
                            settings, p, i)
        return jnp.mean(jnp.clip(img, 0.0, 10.0))

    bwd = jax.jit(lambda s, p, i: jax.value_and_grad(
        loss, allow_int=True)(s.materials, s, p, i))

    def sync(x):
        jax.block_until_ready(x)
        leaf = jax.tree_util.tree_leaves(x)[0]
        import numpy as np
        np.asarray(leaf[(0,) * leaf.ndim])

    sync(fwd(scene, pix, jnp.uint32(0)))     # compile
    sync(bwd(scene, pix, jnp.uint32(0)))

    out = {"scene": args.scene, "res": r, "bounces": args.bounces}
    for tag, fn in (("fwd", fwd), ("bwd", bwd)):
        with tempfile.TemporaryDirectory() as td:
            jax.profiler.start_trace(td)
            v = None
            for _ in range(args.reps):
                v = fn(scene, pix, jnp.uint32(1))
            sync(v)
            jax.profiler.stop_trace()
            agg, total = _aggregate(td)
        out[f"{tag}_total_ms_per_call"] = round(total / args.reps, 2)
        out[f"{tag}_top"] = [
            {"op": k, "ms_per_call": round(v_ / args.reps, 3)}
            for k, v_ in agg.most_common(18)]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
