"""PSNR gate against the blessed golden renders (BASELINE.md:22).

Goldens are 64x64 @ 24 spp MIS HDR renders (tests/golden/generate.py;
the reference's README comparison point is 24 spp MIS renders,
/root/reference/README.md:26-27). Re-renders on the same backend are
bit-identical (deterministic RNG), so the >40 dB gate's slack exists
for cross-backend float differences — any estimator, traversal, BSDF,
or sampling regression drops PSNR far below it.
"""

import os

import numpy as np
import pytest

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.io.loader import add_model
from nexus_tpu.render.megakernel import render
from nexus_tpu.scene.scene import SceneBuilder

SCENES = "/root/reference/Nexus/assets/demo_scenes"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def psnr(img, ref, peak=None):
    """PSNR in dB over HDR radiance; peak = golden max (HDR convention)."""
    mse = float(np.mean((img - ref) ** 2))
    if mse == 0.0:
        return np.inf
    peak = float(ref.max()) if peak is None else peak
    return 10.0 * np.log10(peak * peak / mse)


def _render(name):
    b = SceneBuilder()
    add_model(b, f"{SCENES}/{name}/{name}.glb")
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=64, height=64)
    st = RenderSettings(width=64, height=64, path_length=5, use_mis=True)
    return np.asarray(render(b.build(), st, n_samples=24))


@pytest.mark.parametrize("name", ["cornell_box", "cornell_box_sphere"])
def test_golden_psnr(name):
    ref = np.load(os.path.join(GOLDEN, f"{name}.npy"))
    img = _render(name)
    db = psnr(img, ref)
    assert db > 40.0, f"{name}: PSNR {db:.1f} dB < 40 dB gate"


def test_psnr_detects_regression():
    """The gate must actually fire: a 30% exposure error fails it (the
    HDR peak convention makes the dB scale generous — 5% ≈ 49 dB)."""
    ref = np.load(os.path.join(GOLDEN, "cornell_box.npy"))
    assert psnr(ref * 1.3, ref) < 40.0
    assert psnr(ref, ref) == np.inf
