"""Regenerate the blessed golden renders (BASELINE.md quality gate).

Run from the repo root:  python tests/golden/generate.py

Goldens are 64x64 HDR renders at 24 spp with MIS (the reference's
README comparison point is 24 spp MIS, /root/reference/README.md:26-27)
on the CPU backend — the deterministic (pixel,sample)-keyed RNG makes
re-renders bit-identical on the same backend, and tests/test_golden.py
gates any regression at PSNR > 40 dB, loose enough for cross-backend
float differences (TPU vs CPU) and tight enough to catch estimator or
traversal changes.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

from nexus_tpu.core.config import RenderSettings  # noqa: E402
from nexus_tpu.io.loader import add_model  # noqa: E402
from nexus_tpu.render.megakernel import render  # noqa: E402
from nexus_tpu.scene.scene import SceneBuilder  # noqa: E402

SCENES = "/root/reference/Nexus/assets/demo_scenes"
SPP = 24
RES = 64
PATH_LENGTH = 5


def golden(name):
    b = SceneBuilder()
    add_model(b, f"{SCENES}/{name}/{name}.glb")
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=RES, height=RES)
    scene = b.build()
    st = RenderSettings(width=RES, height=RES, path_length=PATH_LENGTH,
                        use_mis=True)
    img = np.asarray(render(scene, st, n_samples=SPP), np.float32)
    assert np.isfinite(img).all()
    out = os.path.join(os.path.dirname(__file__), f"{name}.npy")
    np.save(out, img)
    print(f"{name}: mean {img.mean():.4f} max {img.max():.2f} -> {out}")


def golden_procedural(name, scene_fn, width, height, spp, bounces):
    """BASELINE configs 3-5 gates (VERDICT r3 next-step #5): small-res
    goldens over the procedural stand-in scenes so traversal/BSDF/
    texture/instancing regressions on the glass, instanced, and
    interior configs fail the default suite, not just Cornell."""
    scene = scene_fn()
    st = RenderSettings(width=width, height=height, path_length=bounces,
                        use_mis=True)
    img = np.asarray(render(scene, st, n_samples=spp), np.float32)
    assert np.isfinite(img).all()
    out = os.path.join(os.path.dirname(__file__), f"{name}.npy")
    np.save(out, img)
    print(f"{name}: mean {img.mean():.4f} max {img.max():.2f} -> {out}")


PROCEDURAL = {
    # name -> (scene_fn, w, h, spp, bounces); kept small so the default
    # suite re-renders them in seconds on CPU.
    "glass": (lambda: __import__("nexus_tpu.scenes", fromlist=["x"])
              .glass_scene(128, 128), 128, 128, 8, 6),
    "instanced": (lambda: __import__("nexus_tpu.scenes", fromlist=["x"])
                  .instanced_env_scene(160, 90, n_inst=9, subdiv=2),
                  160, 90, 8, 4),
    "interior": (lambda: __import__("nexus_tpu.scenes", fromlist=["x"])
                 .interior_scene(160, 90, target_tris=60_000),
                 160, 90, 4, 4),
}


if __name__ == "__main__":
    golden("cornell_box")
    golden("cornell_box_sphere")
    for name, (fn, w, h, spp, bounces) in PROCEDURAL.items():
        golden_procedural(name, fn, w, h, spp, bounces)
