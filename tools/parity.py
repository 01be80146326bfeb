"""Reference-parity artifact generator (VERDICT r3 item #5).

Renders the two demo scenes SHIPPED IN the reference repo
(Nexus/assets/demo_scenes/cornell_box{,_sphere}.glb) at 24 spp —
the spp of the reference's published MIS comparison
(/root/reference/README.md:26-27) — with MIS and naive (BSDF-only)
sampling, with reference-parity flags ON (strict_fresnel_parity
reproduces the R_perp typo of Fresnel.cuh:28; conductor scenes are
avoided per SURVEY.md §8.1), and writes docs/parity/*.png plus
docs/parity.md with display-space PSNR numbers.

The reference's own published images are GitHub user-attachment URLs
(README.md:16-27) and this environment has no network egress, so a
pixel comparison against them is impossible here; the document records
the exact methodology so the comparison can be completed on any
machine with the reference binary or its README images.

PSNR convention (VERDICT r2 weak #4): computed on TONEMAPPED
display-space images (ACES + gamma 1/2.2, peak fixed at 1.0), not on
HDR with a data-dependent peak.

Usage: PYTHONPATH=. python tools/parity.py [--res 512] [--spp 24]
"""

import argparse
import json
import os
import sys
import time


def tonemap(img):
    import numpy as np

    # Exposure * ACES + gamma pack, the reference's display transform
    # (PathTracer.cu:48-62, Utils.h:51-54).
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = np.clip(img, 0.0, None)
    x = (x * (a * x + b)) / (x * (c * x + d) + e)
    return np.clip(x, 0.0, 1.0) ** (1.0 / 2.2)


def save_display(path, display_rgb):
    import numpy as np
    from PIL import Image

    Image.fromarray((np.clip(display_rgb, 0, 1) * 255).astype(
        np.uint8)).save(path)


def psnr_display(a, b):
    import numpy as np

    mse = float(np.mean((tonemap(a) - tonemap(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=24)
    ap.add_argument("--ref-spp", type=int, default=512,
                    help="spp of the converged self-reference")
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--out", default="docs/parity")
    args = ap.parse_args()

    from nexus_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.io.loader import add_model
    from nexus_tpu.render import wavefront
    from nexus_tpu.scene.scene import SceneBuilder

    os.makedirs(args.out, exist_ok=True)
    demo = "/root/reference/Nexus/assets/demo_scenes"
    scenes = {
        "cornell_box": f"{demo}/cornell_box/cornell_box.glb",
        "cornell_box_sphere":
            f"{demo}/cornell_box_sphere/cornell_box_sphere.glb",
    }

    rows = []
    renders = {}   # deferred readbacks (axon: readback kills dispatch)
    for name, path in scenes.items():
        b = SceneBuilder()
        add_model(b, path)
        b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                     hfov_deg=50.0, width=args.res, height=args.res)
        scene = b.build()
        for mode, use_mis in (("mis", True), ("naive", False)):
            st = RenderSettings(width=args.res, height=args.res,
                                path_length=args.bounces, use_mis=use_mis,
                                strict_fresnel_parity=True)
            t0 = time.perf_counter()
            img = wavefront.render(scene, st, n_samples=args.spp)
            img.block_until_ready()
            renders[(name, mode)] = (img, time.perf_counter() - t0)
        # Converged self-reference (MIS, high spp) — accumulated in
        # 32-spp pieces: a single multi-minute dispatch trips the
        # device watchdog on the tunneled TPU.
        st = RenderSettings(width=args.res, height=args.res,
                            path_length=args.bounces, use_mis=True,
                            strict_fresnel_parity=True)
        piece = 32
        acc = None
        for off in range(0, args.ref_spp, piece):
            img = wavefront.render(scene, st, n_samples=piece,
                                   sample_offset=off)
            acc = img if acc is None else acc + img
            acc.block_until_ready()
        renders[(name, "ref")] = (acc / (args.ref_spp // piece), 0.0)

    # All rendering done — now read back and write artifacts.
    for name in scenes:
        ref = np.asarray(renders[(name, "ref")][0])
        save_display(f"{args.out}/{name}_ref{args.ref_spp}spp.png",
                     tonemap(ref))
        rec = {"scene": name, "spp": args.spp, "res": args.res}
        for mode in ("mis", "naive"):
            img, dt = renders[(name, mode)]
            img = np.asarray(img)
            save_display(f"{args.out}/{name}_{mode}{args.spp}spp.png",
                         tonemap(img))
            rec[f"psnr_{mode}_db"] = round(psnr_display(img, ref), 2)
            rec[f"time_{mode}_s"] = round(dt, 1)
        rows.append(rec)
        print(json.dumps(rec))

    md = [
        "# Reference parity — MIS comparison artifact",
        "",
        "Reproduces the reference's published MIS-vs-naive comparison",
        "methodology (`/root/reference/README.md:26-27`: *\"Left:",
        "multiple importance sampling. Right: naive render (BSDF",
        "importance sampling). Image rendered at 24 spp.\"*) on the two",
        "demo scenes shipped in the reference repo, with",
        "`strict_fresnel_parity=True` (reproducing the reference's",
        "R_perp typo, `Nexus/src/Cuda/BSDF/Fresnel.cuh:28`) and no",
        "conductors (the reference's conductor kernel is disabled,",
        "SURVEY.md §8.1).",
        "",
        "The reference's own comparison images are GitHub",
        "user-attachment URLs (README.md:16-27); this environment has",
        "no network egress, so PSNR here is measured against a",
        f"converged {args.ref_spp}-spp MIS self-reference in DISPLAY",
        "space (ACES + gamma, peak 1.0 — the fixed-peak metric VERDICT",
        "r2 asked for). The 24-spp MIS render must be close to the",
        "converged image; the naive render at equal spp must be",
        "measurably worse — the same qualitative claim the reference's",
        "side-by-side makes.",
        "",
        "| scene | spp | PSNR (MIS) dB | PSNR (naive) dB | t(MIS) s |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(f"| {r['scene']} | {r['spp']} | {r['psnr_mis_db']} | "
                  f"{r['psnr_naive_db']} | {r['time_mis_s']} |")
    md += [
        "",
        "Images: `docs/parity/<scene>_{mis,naive}24spp.png` and the",
        f"converged `<scene>_ref{args.ref_spp}spp.png`.",
        "",
        "To complete the comparison against the reference binary on a",
        "CUDA machine: render the same .glb at 24 spp MIS (default",
        "camera), save a screenshot, and compare display-space PSNR",
        "> 40 dB (BASELINE.md:22).",
    ]
    open("docs/parity.md", "w").write("\n".join(md) + "\n")
    print("wrote docs/parity.md")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
