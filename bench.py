"""Benchmark: Mrays/s on the megakernel forward path (real chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Ray counting follows the wavefront queue-occupancy definition (actual
trace + shadow rays processed), NOT the reference's pixels/second counter
(Nexus/src/Renderer/Panels/MetricsPanel.cpp:28,35 — SURVEY.md §8.6).
The reference publishes no numbers (BASELINE.md), so vs_baseline is
reported against the rays/s of the previous round when available
(bench_history.json), else null.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.io.loader import add_model
    from nexus_tpu.render.megakernel import count_rays
    from nexus_tpu.render.wavefront import render_pixels
    from nexus_tpu.scene.scene import SceneBuilder

    width = height = int(os.environ.get("BENCH_RES", "256"))
    spp = int(os.environ.get("BENCH_SPP", "4"))
    path_length = int(os.environ.get("BENCH_BOUNCES", "4"))

    b = SceneBuilder()
    add_model(b, "/root/reference/Nexus/assets/demo_scenes/"
                 "cornell_box_sphere/cornell_box_sphere.glb")
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=width, height=height)
    scene = b.build()
    settings = RenderSettings(width=width, height=height,
                              path_length=path_length)

    n_pix = width * height
    pixel_idx = jnp.arange(n_pix, dtype=jnp.int32)

    fn = jax.jit(lambda s, p, i: render_pixels(s, settings, p, i))
    # Warmup/compile
    fn(scene, pixel_idx, jnp.uint32(0)).block_until_ready()

    # Count actual rays for one representative sample set.
    counter = jax.jit(lambda s, p, i: count_rays(s, settings, p, i))
    totals = [counter(scene, pixel_idx, jnp.uint32(k)) for k in range(spp)]
    n_rays = float(sum(int(t) + int(sh) for t, sh in totals))

    t0 = time.perf_counter()
    out = None
    for k in range(spp):
        out = fn(scene, pixel_idx, jnp.uint32(k))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    assert np.isfinite(np.asarray(out)).all(), "non-finite radiance"
    mrays = n_rays / dt / 1e6

    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_history.json")
    vs_baseline = None
    history = []
    if os.path.exists(hist_path):
        try:
            history = json.load(open(hist_path))
            if history:
                vs_baseline = mrays / history[-1]["value"]
        except Exception:
            history = []
    history.append({"ts": time.time(), "value": mrays, "unit": "Mrays/s",
                    "res": width, "spp": spp, "bounces": path_length,
                    "backend": jax.devices()[0].platform})
    try:
        json.dump(history, open(hist_path, "w"), indent=1)
    except OSError:
        pass

    print(json.dumps({
        "metric": "Mrays/s/chip (wavefront fwd, cornell_box_sphere "
                  f"{width}x{height}x{spp}spp, {path_length} bounces)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
