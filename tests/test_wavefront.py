"""Wavefront integrator: must be sampling-identical to the megakernel.

The sorted-compaction pipeline (render/wavefront.py) permutes LANES,
never paths — per-pixel RNG state rides the permutation, so the two
integrators produce bit-identical images (verified on chip too)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.io.loader import add_model
from nexus_tpu.render import megakernel, wavefront
from nexus_tpu.scene.scene import SceneBuilder

GLB = ("/root/reference/Nexus/assets/demo_scenes/cornell_box/"
       "cornell_box.glb")


def _scene(w=24, h=24):
    b = SceneBuilder()
    add_model(b, GLB)
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=w, height=h)
    return b.build()


def test_matches_megakernel():
    scene = _scene()
    settings = RenderSettings(width=24, height=24, path_length=4)
    a = np.asarray(megakernel.render(scene, settings, n_samples=2))
    c = np.asarray(wavefront.render(scene, settings, n_samples=2))
    assert np.isfinite(c).all()
    np.testing.assert_allclose(c, a, rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # shard-equivalence also covered by test_dist
def test_pixel_subset_shardable():
    """render_pixels on a pixel shard matches the same rows of the full
    render (the dist contract, SURVEY.md §4 shard-equivalence)."""
    scene = _scene()
    settings = RenderSettings(width=24, height=24, path_length=3)
    full = np.asarray(wavefront.render_pixels(
        scene, settings, jnp.arange(24 * 24, dtype=jnp.int32),
        jnp.uint32(0)))
    part = np.asarray(wavefront.render_pixels(
        scene, settings, jnp.arange(100, 200, dtype=jnp.int32),
        jnp.uint32(0)))
    np.testing.assert_allclose(part, full[100:200], rtol=1e-5, atol=1e-6)


def test_matches_megakernel_deep_paths():
    """Equivalence at the reference's DEFAULT depth (path_length=10,
    RenderSettings.h:7) — the deep regime flips the compaction
    economics (docs/perf.md) and its first bench runs exposed the
    Beckmann-transpose gradient bug, so it gets its own gate: values
    identical between integrators AND the value+grad program finite."""
    scene = _scene()
    settings = RenderSettings(width=24, height=24, path_length=10)
    a = np.asarray(megakernel.render(scene, settings, n_samples=2))
    c = np.asarray(wavefront.render(scene, settings, n_samples=2))
    assert np.isfinite(c).all()
    np.testing.assert_allclose(c, a, rtol=1e-5, atol=1e-6)

    def loss(materials):
        img = wavefront.render_pixels(
            scene.replace(materials=materials), settings,
            jnp.arange(24 * 24, dtype=jnp.int32), jnp.uint32(0))
        return jnp.mean(jnp.clip(img, 0.0, 10.0))

    g = jax.grad(loss, allow_int=True)(scene.materials)
    for leaf in jax.tree_util.tree_leaves(g):
        if hasattr(leaf, "dtype") and leaf.dtype.kind == "f":
            assert bool(jnp.all(jnp.isfinite(leaf)))
