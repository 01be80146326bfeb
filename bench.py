"""Benchmark: Mrays/s forward AND backward on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Ray counting follows the wavefront queue-occupancy definition (actual
trace + shadow rays processed), NOT the reference's pixels/second counter
(Nexus/src/Renderer/Panels/MetricsPanel.cpp:28,35 — SURVEY.md §8.6).
The reference publishes no numbers (BASELINE.md), so vs_baseline is
reported against the same config's rays/s of the previous round when
available (bench_history.json), else null.

TIMING HYGIENE (critical on the axon TPU tunnel):
`block_until_ready` does not reliably block — in some process regimes
it returns while kernels are still executing, which is what produced
round 3's impossible scaling numbers AND its "readback poison" lore
(the readback never slowed anything; it forced the synchronization the
block skipped — verified by A/B with per-call readbacks, docs/perf.md).
Every timed round here therefore ends with a one-element readback, and
the measured dispatch+readback round trip is subtracted. BENCH_FULL
still isolates configs in subprocesses (process speed regimes differ).

Env knobs:
  BENCH_CONFIG  primary config name (default cornell_sphere; one of
                cornell_sphere | bunny | glass | instanced | interior |
                cornell_deep | interior_deep — the _deep pair runs the
                reference's default 10-bounce regime,
                RenderSettings.h:7)
  BENCH_FULL=1  also run every other config and append each to history
  BENCH_RES/BENCH_SPP/BENCH_BOUNCES  override the primary config shape
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def _configs():
    """name -> (scene_fn, width, height, spp, bounces). Scene builders
    imported lazily; resolutions follow BASELINE.json configs 1-5."""
    from nexus_tpu import scenes

    return {
        "cornell_sphere": (lambda w, h: scenes.glass_scene(w, h),
                           256, 256, 4, 4),
        "bunny": (lambda w, h: scenes.bunny_scene(
            tempfile.mkdtemp(prefix="bench_bunny"), w, h, subdiv=6),
            256, 256, 4, 4),
        "glass": (lambda w, h: scenes.glass_scene(w, h), 256, 256, 8, 6),
        "instanced": (lambda w, h: scenes.instanced_env_scene(
            w, h, n_inst=25, subdiv=4), 1280, 720, 1, 4),
        "interior": (lambda w, h: scenes.interior_scene(
            w, h, target_tris=1_000_000), 1920, 1080, 1, 4),
        # The reference's DEFAULT path depth is 10
        # (Nexus/src/Renderer/RenderSettings.h:7); configs 1-5 follow
        # BASELINE.json's 4-6 bounce shapes, these two cover the deep
        # regime where queue compaction / parking economics flip
        # (VERDICT r4 #5).
        "cornell_deep": (lambda w, h: scenes.glass_scene(w, h),
                         256, 256, 4, 10),
        "interior_deep": (lambda w, h: scenes.interior_scene(
            w, h, target_tris=1_000_000), 1920, 1080, 1, 10),
    }


def bench_config(name, spec, res_override=None, spp_override=None,
                 bounces_override=None):
    """Time forward and backward renders of one config on the device.
    Returns a history record dict. ALL timing happens before ANY
    device-to-host readback (see module docstring)."""
    import jax
    import jax.numpy as jnp

    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.render.megakernel import count_rays
    from nexus_tpu.render.wavefront import render_pixels

    scene_fn, width, height, spp, bounces = spec
    if res_override:
        width = height = res_override
    spp = spp_override or spp
    bounces = bounces_override or bounces

    t0 = time.perf_counter()
    scene = scene_fn(width, height)
    build_s = time.perf_counter() - t0
    settings = RenderSettings(width=width, height=height,
                              path_length=bounces)
    n_pix = width * height
    # Lane chunking: >1M-lane megakernel launches exhaust HLO temp
    # memory (720p/1080p backward residuals). Fixed-size pixel chunks
    # with gradient accumulation are the production pattern — every
    # chunk reuses ONE compiled executable.
    n_chunks = -(-n_pix // (1 << 18))
    chunk = -(-n_pix // n_chunks)        # even split, minimal padding
    # Z-order enumeration: trace tiles are compact pixel blocks
    # (core/zorder.py), matching what render()/render_sharded() do.
    from nexus_tpu.core.zorder import zorder_pixels
    pixel_pad = jnp.asarray(np.concatenate(
        [zorder_pixels(width, height),
         np.zeros(n_chunks * chunk - n_pix, np.int32)]))
    chunks = [pixel_pad[c * chunk:(c + 1) * chunk]
              for c in range(n_chunks)]

    fwd = jax.jit(lambda s, p, i: render_pixels(s, settings, p, i))

    def loss(materials, s, p, i):
        img = render_pixels(s.replace(materials=materials), settings, p, i)
        return jnp.mean(jnp.clip(img, 0.0, 10.0))

    bwd = jax.jit(lambda s, p, i: jax.grad(loss, allow_int=True)(
        s.materials, s, p, i))

    def sync(x):
        # TRUE completion barrier: block + one-element readback
        # (see module docstring; device execution is in-order).
        jax.block_until_ready(x)
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    # ---- Phase 1: compile ---------------------------------------------
    t0 = time.perf_counter()
    sync(fwd(scene, chunks[0], jnp.uint32(0)))
    compile_fwd = time.perf_counter() - t0

    # Fixed sync cost to subtract from each timed round.
    tiny = jax.jit(lambda x: x * 2.0)
    sync(tiny(jnp.ones((8, 128))))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(tiny(jnp.ones((8, 128))))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]

    # Median-of-rounds with min/max dispersion (VERDICT r3 next #2:
    # single-shot numbers on the drift-prone tunneled TPU are not
    # evidence). Each round is a full spp pass closed by a sync.
    ROUNDS = 5
    fwd_times = []
    out = None
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for k in range(spp):
            for p in chunks:
                out = fwd(scene, p, jnp.uint32(k))
        sync(out)
        fwd_times.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    fwd_times.sort()
    dt_fwd = fwd_times[len(fwd_times) // 2]

    t0 = time.perf_counter()
    g = bwd(scene, chunks[0], jnp.uint32(0))
    sync(g)
    compile_bwd = time.perf_counter() - t0
    bwd_times = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for k in range(spp):
            for p in chunks:
                g = bwd(scene, p, jnp.uint32(k))
        sync(g)
        bwd_times.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    bwd_times.sort()
    dt_bwd = bwd_times[len(bwd_times) // 2]

    # ---- Phase 2: full readbacks + validation --------------------------
    assert np.isfinite(np.asarray(out)).all(), "non-finite radiance"
    finite = all(np.isfinite(np.asarray(x)).all()
                 for x in jax.tree_util.tree_leaves(g)
                 if np.issubdtype(np.asarray(x).dtype, np.floating))
    assert finite, "non-finite gradients"

    counter = jax.jit(lambda s, p, i: count_rays(s, settings, p, i))
    totals = [counter(scene, p, jnp.uint32(k))
              for k in range(spp) for p in chunks]
    n_rays = float(sum(int(t) + int(sh) for t, sh in totals))

    return {
        "ts": time.time(), "config": name,
        "value": n_rays / dt_fwd / 1e6, "unit": "Mrays/s",
        "fwd_s_min_med_max": [round(fwd_times[0], 4), round(dt_fwd, 4),
                              round(fwd_times[-1], 4)],
        "bwd_s_min_med_max": [round(bwd_times[0], 4), round(dt_bwd, 4),
                              round(bwd_times[-1], 4)],
        "bwd_mrays": n_rays / dt_bwd / 1e6,
        "res": width, "height": height, "spp": spp, "bounces": bounces,
        "tris": int(scene.tri_count),
        "build_s": round(build_s, 1),
        "sync_rtt_s": round(rtt, 4),
        "compile_fwd_s": round(compile_fwd, 1),
        "compile_bwd_s": round(compile_bwd, 1),
        "backend": jax.devices()[0].platform,
    }


def _run_one(primary, res, spp, bounces):
    """Run one config in THIS process and return its record."""
    configs = _configs()
    return bench_config(primary, configs[primary],
                        int(res) if res else None,
                        int(spp) if spp else None,
                        int(bounces) if bounces else None)


def _run_subprocess(name):
    """Run one config in a fresh process (isolates the readback poison
    and any compile-cache state); returns its record or an error dict."""
    env = dict(os.environ, BENCH_CONFIG=name, BENCH_SUB="1")
    env.pop("BENCH_FULL", None)
    # Shape overrides apply to the PRIMARY config only — a child would
    # otherwise run its config at the overridden shape and append that
    # to history as if it were the standard run.
    for k in ("BENCH_RES", "BENCH_SPP", "BENCH_BOUNCES"):
        env.pop(k, None)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600)
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
                if "config" in rec:
                    return rec
            except json.JSONDecodeError:
                continue
        return {"ts": time.time(), "config": name,
                "error": (out.stderr or out.stdout)[-300:]}
    except subprocess.TimeoutExpired:
        return {"ts": time.time(), "config": name, "error": "timeout"}


def main():
    if os.environ.get("NEXUS_BENCH_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    from nexus_tpu.core.cache import enable_compile_cache
    from nexus_tpu.core.debug import maybe_enable_from_env

    enable_compile_cache()
    maybe_enable_from_env()
    primary = os.environ.get("BENCH_CONFIG", "cornell_sphere")
    rec = _run_one(primary, os.environ.get("BENCH_RES"),
                   os.environ.get("BENCH_SPP"),
                   os.environ.get("BENCH_BOUNCES"))

    if os.environ.get("BENCH_SUB"):
        # Child mode: emit the record for the parent and exit.
        print(json.dumps(rec))
        return

    records = [rec]
    if os.environ.get("BENCH_FULL"):
        for name in _configs():
            if name != primary:
                records.append(_run_subprocess(name))

    here = os.path.dirname(os.path.abspath(__file__))
    hist_path = os.path.join(here, "bench_history.json")
    # vs_baseline compares against the PREVIOUS ROUND's last record of
    # this config, not whatever ran minutes ago in this round (r2's
    # silent last-record semantics hid a real regression — VERDICT r2
    # weak #3). The current round number = 1 + the highest BENCH_r<N>
    # the driver has written; each history record is stamped with the
    # round it ran in (file content, not mtime — git checkouts do not
    # preserve mtimes).
    import glob
    import re

    prev_rounds = [int(m.group(1)) for p in
                   glob.glob(os.path.join(here, "BENCH_r*.json"))
                   if (m := re.search(r"BENCH_r(\d+)\.json$", p))]
    cur_round = max(prev_rounds, default=0) + 1
    for r_ in records:
        r_["round"] = cur_round
    vs_baseline = None
    history = []
    if os.path.exists(hist_path):
        try:
            history = json.load(open(hist_path))
            prev = [h for h in history
                    if h.get("config", "cornell_sphere") == primary
                    and "value" in h
                    and h.get("round", 0) < cur_round]
            if not prev:   # no prior-round record: fall back to last
                prev = [h for h in history
                        if h.get("config", "cornell_sphere") == primary
                        and "value" in h]
            if prev:
                vs_baseline = rec["value"] / prev[-1]["value"]
        except Exception:
            history = []
    history.extend(records)
    try:
        json.dump(history, open(hist_path, "w"), indent=1)
    except OSError:
        pass

    print(json.dumps({
        "metric": f"Mrays/s/chip fwd ({primary} {rec['res']}x"
                  f"{rec['height']}x{rec['spp']}spp, {rec['bounces']} "
                  f"bounces; bwd={rec['bwd_mrays']:.3f})",
        "value": round(rec["value"], 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
