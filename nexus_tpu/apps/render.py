"""CLI renderer: scene file → PNG/HDR + metrics JSON, resumable.

The headless replacement for the reference's interactive app shell
(Nexus/src/main.cpp + RayTracerApplication + Renderer menus — our
primary harness is CLI + file output per SURVEY.md §7; an interactive
viewer can layer on top). Feature map:

  File→Open model          →  positional scene path (.glb/.gltf/.obj)
  File→Load HDR map        →  --env path.hdr (true float HDR; the
                               reference's LDR quirk via --env-ldr-parity,
                               SURVEY.md §8.3)
  MetricsPanel             →  --metrics out.json (ms/frame, honest
                               rays/s — actual trace+shadow queue items,
                               NOT the reference's pixels/s counter,
                               MetricsPanel.cpp:28,35, SURVEY.md §8.6)
  SaveScreenshot (PNG)     →  --out out.png (ACES + gamma display path)
  progressive accumulation →  --checkpoint state.npz [--resume]
                               (accumulation buffer + sample counter ARE
                               the render state, SURVEY.md §5.4; the RNG
                               is keyed on (pixel, sample) so a resumed
                               render is bit-identical to an unbroken one)

Usage:
  python -m nexus_tpu.apps.render scene.glb --out img.png --spp 64 \\
      --width 512 --height 512 --bounces 8 --camera-pos 0 1 3.4 \\
      --camera-lookat 0 1 0 --checkpoint ckpt.npz --resume
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nexus_tpu.apps.render",
        description="TPU-native path tracer (Nexus-parity CLI)")
    p.add_argument("scene", help="model file (.glb/.gltf/.obj)")
    p.add_argument("--out", default="render.png", help="output PNG")
    p.add_argument("--hdr-out", default=None,
                   help="also write raw float32 radiance (.npy)")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--bounces", type=int, default=10,
                   help="max path length (reference default 10)")
    p.add_argument("--no-mis", action="store_true",
                   help="disable NEE+MIS (BSDF sampling only)")
    p.add_argument("--camera-pos", nargs=3, type=float,
                   default=(0.0, 1.0, 3.4))
    p.add_argument("--camera-lookat", nargs=3, type=float,
                   default=(0.0, 1.0, 0.0))
    p.add_argument("--fov", type=float, default=50.0,
                   help="horizontal FOV degrees")
    p.add_argument("--aperture", type=float, default=0.0,
                   help="defocus angle degrees (thin lens)")
    p.add_argument("--focus", type=float, default=0.0,
                   help="focus distance (0 = auto from look-at)")
    p.add_argument("--env", default=None, help="environment map (.hdr/.png)")
    p.add_argument("--env-ldr-parity", action="store_true",
                   help="reproduce the reference's 8-bit HDR loading")
    p.add_argument("--background", nargs=3, type=float, default=None,
                   help="flat background color")
    p.add_argument("--background-intensity", type=float, default=1.0)
    p.add_argument("--instanced", action="store_true",
                   help="TLAS/BLAS instanced scene (shared meshes)")
    p.add_argument("--renderer", choices=("wavefront", "megakernel"),
                   default="wavefront")
    p.add_argument("--exposure", type=float, default=0.6,
                   help="tonemap exposure (PathTracer.cu:48)")
    p.add_argument("--metrics", default=None, help="metrics JSON path")
    p.add_argument("--progressive", type=int, default=0, metavar="N",
                   help="rewrite --out every N samples (live progressive "
                        "display analog of the reference's GL "
                        "accumulation blit, OpenGL/PixelBuffer.cpp; pair "
                        "with apps/viewer.py to watch in a browser)")
    p.add_argument("--checkpoint", default=None,
                   help="progressive render state (.npz)")
    p.add_argument("--resume", action="store_true",
                   help="continue from --checkpoint if it exists")
    p.add_argument("--seed", type=int, default=0,
                   help="sample-index offset")
    p.add_argument("--query", nargs=2, type=int, default=None,
                   metavar=("X", "Y"),
                   help="print hit info (instance/material/triangle/"
                        "position) at image pixel (x, y) and exit — the "
                        "reference's click-to-pick (Renderer.cpp:131-142, "
                        "PathTracer.cpp:310-317). (0,0) is the PNG's "
                        "top-left.")
    return p


def query_pixel(scene, x: int, y: int) -> dict:
    """Trace one center ray through image pixel (x, y) and report what
    it hits. Image coordinates match the written PNG (top-left origin);
    the raw render buffer is y-up, hence the row flip."""
    import jax.numpy as jnp

    from nexus_tpu.geom.types import MISS_DISTANCE
    from nexus_tpu.scene import view
    from nexus_tpu.scene.camera import generate_rays

    w, h = scene.camera.width, scene.camera.height
    assert 0 <= x < w and 0 <= y < h, f"pixel ({x},{y}) outside {w}x{h}"
    pix = jnp.asarray([(h - 1 - y) * w + x], jnp.int32)
    ray = generate_rays(scene.camera, pix,
                        jnp.full((1, 4), 0.5, jnp.float32))
    it = view.closest_hit(scene, ray.origin, ray.direction)
    hit = bool(np.asarray(it.t)[0] < MISS_DISTANCE)
    out = {"pixel": [x, y], "hit": hit}
    if hit:
        tri = int(np.asarray(it.tri_idx)[0])
        inst = int(np.asarray(it.inst_idx)[0])
        t = float(np.asarray(it.t)[0])
        mat = int(np.asarray(
            view.material_id(scene, it.tri_idx, it.inst_idx))[0])
        p = np.asarray(ray.origin)[0] + t * np.asarray(ray.direction)[0]
        out.update(t=round(t, 6), triangle=tri, instance=inst,
                   material=mat,
                   position=[round(float(v), 6) for v in p],
                   material_type=int(np.asarray(
                       scene.materials.mtype)[mat]))
    return out


def load_scene(args):
    from nexus_tpu.io.loader import (add_model, add_model_instanced,
                                     load_env_map)
    from nexus_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    if args.instanced:
        add_model_instanced(b, args.scene)
    else:
        add_model(b, args.scene)
    if args.env:
        load_env_map(b, args.env, parity_ldr=args.env_ldr_parity)
    if args.background is not None:
        b.background_color = tuple(args.background)
        b.background_intensity = args.background_intensity
    b.set_camera(position=tuple(args.camera_pos),
                 look_at=tuple(args.camera_lookat),
                 hfov_deg=args.fov, width=args.width, height=args.height,
                 defocus_angle_deg=args.aperture,
                 focus_dist=args.focus if args.focus > 0 else None)
    return b.build_instanced() if args.instanced else b.build()


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from nexus_tpu.core.cache import enable_compile_cache
    from nexus_tpu.core.debug import maybe_enable_from_env

    enable_compile_cache()
    maybe_enable_from_env()   # NEXUS_DEBUG_NAN=1: NaNs raise at source

    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.io.image import write_hdr, write_png
    from nexus_tpu.render import megakernel, wavefront

    t_load = time.perf_counter()
    scene = load_scene(args)
    if args.query is not None:
        print(json.dumps(query_pixel(scene, args.query[0], args.query[1])))
        return 0
    settings = RenderSettings(width=args.width, height=args.height,
                              path_length=args.bounces,
                              use_mis=not args.no_mis)
    mod = wavefront if args.renderer == "wavefront" else megakernel
    n_pix = args.width * args.height
    pixel_idx = jnp.arange(n_pix, dtype=jnp.int32)
    load_s = time.perf_counter() - t_load

    # --- Resume state (SURVEY.md §5.4: accumulation + counter) ---------
    acc = np.zeros((n_pix, 3), np.float32)
    done = 0
    if args.checkpoint and args.resume and Path(args.checkpoint).exists():
        ck = np.load(args.checkpoint)
        assert ck["acc"].shape == (n_pix, 3), "checkpoint resolution mismatch"
        acc = ck["acc"].astype(np.float32)
        done = int(ck["n_samples"])
        print(f"resumed at {done} spp from {args.checkpoint}")

    fn = jax.jit(lambda s, p, i: mod.render_pixels(s, settings, p, i))

    t_compile = time.perf_counter()
    if done < args.spp:
        fn(scene, pixel_idx,
           jnp.uint32(args.seed + done)).block_until_ready()
    compile_s = time.perf_counter() - t_compile

    sample_times = []
    for s in range(done, args.spp):
        t0 = time.perf_counter()
        r = np.asarray(fn(scene, pixel_idx, jnp.uint32(args.seed + s)))
        sample_times.append(time.perf_counter() - t0)
        # Running mean (AccumulateKernel, PathTracer.cu:489-492).
        acc += (r - acc) / (s + 1)
        if args.checkpoint:
            np.savez(args.checkpoint, acc=acc, n_samples=s + 1,
                     seed=args.seed)
        if args.progressive and ((s + 1) % args.progressive == 0
                                 or s + 1 == args.spp):
            write_png(args.out,
                      acc.reshape(args.height, args.width, 3),
                      exposure=args.exposure)
            dt = sample_times[-1]
            print(f"[{s + 1}/{args.spp} spp] {dt * 1e3:.0f} ms/sample "
                  f"-> {args.out}", flush=True)

    img = acc.reshape(args.height, args.width, 3)
    from nexus_tpu.core.debug import assert_finite

    assert_finite(img, "render output")
    write_png(args.out, img, exposure=args.exposure)
    if args.hdr_out:
        write_hdr(args.hdr_out, img)
    print(f"wrote {args.out} ({args.width}x{args.height} @ {args.spp} spp)")

    if args.metrics:
        # Honest ray accounting (megakernel.count_rays — actual queue
        # occupancy, SURVEY.md §8.6).
        counter = jax.jit(
            lambda s, p, i: megakernel.count_rays(s, settings, p, i))
        tr, sh = counter(scene, pixel_idx, jnp.uint32(args.seed))
        rays_per_sample = int(tr) + int(sh)
        dt = float(np.mean(sample_times)) if sample_times else 0.0
        metrics = {
            "resolution": [args.width, args.height],
            "spp": args.spp,
            "bounces": args.bounces,
            "renderer": args.renderer,
            "backend": jax.devices()[0].platform,
            "scene_load_s": round(load_s, 3),
            "compile_s": round(compile_s, 3),
            "ms_per_sample": round(dt * 1e3, 3),
            "rays_per_sample": rays_per_sample,
            "mrays_per_s": round(rays_per_sample / dt / 1e6, 3)
            if dt else None,
            "n_triangles": int(scene.tri_count),
            "n_lights": scene.n_lights,
        }
        Path(args.metrics).write_text(json.dumps(metrics, indent=1))
        print(f"metrics -> {args.metrics}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
