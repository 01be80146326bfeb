"""Incremental scene edits (scene/edit.py) vs full rebuilds.

The reference's edit path is invalidate -> full TLAS rebuild
(Scene.cpp:29-55); ours is a functional refit — these tests pin that a
refit-edited scene renders identically to a scene rebuilt from scratch
with the same parameters."""

import numpy as np
import jax.numpy as jnp
import pytest

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.render import megakernel
from nexus_tpu.scene import edit
from nexus_tpu.scene.scene import SceneBuilder
from nexus_tpu.scenes import blob_mesh


def _mat(s, tx, ty, tz):
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[1, 1] = m[2, 2] = s
    m[:3, 3] = (tx, ty, tz)
    return m


def _build(transform1):
    b = SceneBuilder()
    light = b.add_material(albedo=(0, 0, 0), emission=(1, 1, 0.9),
                           intensity=20.0)
    white = b.add_material(albedo=(0.7, 0.7, 0.7))
    red = b.add_material(albedo=(0.8, 0.2, 0.2))
    v, f = blob_mesh(2)
    asset = b.add_mesh_asset(v, f, name="blob")
    qv = np.array([[-3, 3, -3], [3, 3, -3], [3, 3, 3], [-3, 3, 3]],
                  np.float32)
    panel = b.add_mesh_asset(qv, np.array([[0, 2, 1], [0, 3, 2]]),
                             name="panel")
    b.add_instance(asset, white, _mat(1.0, -1.0, 0.0, 0.0))
    b.add_instance(asset, red, transform1)
    b.add_instance(panel, light, np.eye(4, dtype=np.float32))
    b.set_camera(position=(0.0, 1.0, 5.0), look_at=(0.0, 0.0, 0.0),
                 hfov_deg=55.0, width=32, height=32)
    return b


def _render(scene):
    st = RenderSettings(width=32, height=32, path_length=3)
    return np.asarray(megakernel.render(scene, st, n_samples=2))


@pytest.fixture(scope="module")
def base():
    return _build(_mat(0.8, 1.2, 0.0, 0.0)).build_instanced()


def test_set_transform_matches_rebuild(base):
    new_m = _mat(1.3, 1.8, 0.6, -0.4)
    edited = edit.set_transform(base, 1, new_m)
    rebuilt = _build(new_m).build_instanced()
    img_e = _render(edited)
    img_r = _render(rebuilt)
    # Identical geometry; blocked entry ORDER differs (no re-sort), so
    # results agree to traversal tie-breaking — in practice exactly.
    np.testing.assert_allclose(img_e, img_r, rtol=1e-5, atol=1e-5)
    # And it actually moved: differs from the original render.
    assert np.abs(img_e - _render(base)).max() > 1e-3


def test_set_transform_refits_tlas_bounds(base):
    new_m = _mat(2.0, 2.5, 1.0, 0.0)
    edited = edit.set_transform(base, 1, new_m)
    # Root bounds must contain the moved instance's world AABB.
    t = edited.tlas
    root_lo = np.asarray(t.bmin[0])
    root_hi = np.asarray(t.bmax[0])
    assert (root_hi >= np.array([2.5 + 2.0 * 0.9, 0, 0]) - 1e-3).all()
    assert (root_lo <= root_hi).all()


def test_set_material_swap(base):
    # Swap instance 1 red -> white (same emissive class: shape-stable).
    edited = edit.set_material(base, 1, 1)
    assert edited.n_lights == base.n_lights
    img = _render(edited)
    assert np.abs(img - _render(base)).max() > 1e-4


def test_set_material_emissive_registers_light(base):
    # Rebind instance 1 to the emissive material: light count grows
    # (Scene.cpp:142-176 auto-registration).
    edited = edit.set_material(base, 1, 0)
    assert edited.n_lights == base.n_lights + 1
    rebuilt_b = _build(_mat(0.8, 1.2, 0.0, 0.0))
    # Rebuild with instance 1 emissive for comparison.
    rebuilt_b._inst_records[1]["material_id"] = 0
    rebuilt = rebuilt_b.build_instanced()
    np.testing.assert_allclose(_render(edited), _render(rebuilt),
                               rtol=1e-5, atol=1e-5)


def _build_flat(blob_material):
    """Flat-scene twin of _build: same geometry via add_mesh."""
    b = SceneBuilder()
    b.add_material(albedo=(0, 0, 0), emission=(1, 1, 0.9),
                   intensity=20.0)
    b.add_material(albedo=(0.7, 0.7, 0.7))
    b.add_material(albedo=(0.8, 0.2, 0.2))
    v, f = blob_mesh(2)
    b.add_mesh(v, f, 1, _mat(1.0, -1.0, 0.0, 0.0))
    b.add_mesh(v, f, blob_material, _mat(0.8, 1.2, 0.0, 0.0))
    qv = np.array([[-3, 3, -3], [3, 3, -3], [3, 3, 3], [-3, 3, 3]],
                  np.float32)
    b.add_mesh(qv, np.array([[0, 2, 1], [0, 3, 2]]), 0)
    b.set_camera(position=(0.0, 1.0, 5.0), look_at=(0.0, 0.0, 0.0),
                 hfov_deg=55.0, width=32, height=32)
    return b.build()


def test_set_material_swap_flat():
    """FLAT scenes shade from tri_attr column 24 (view.fetch_attr), not
    tri_mat. Regression: set_material's flat branch rebound
    tri_mat/tri_meta only, so the renderer silently kept the old
    material."""
    base = _build_flat(2)
    edited = edit.set_material(base, 1, 1)        # red -> white
    rebuilt = _build_flat(1)
    img_e = _render(edited)
    np.testing.assert_allclose(img_e, _render(rebuilt),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(img_e - _render(base)).max() > 1e-4
