"""Scene-view dispatch + kernel-path parity on real scenes.

The HBM-resident kernel's unit parity lives in tests/test_trace_hbm.py;
these tests cover the PRODUCT path: SceneBuilder-built scenes routed
through scene/view.py, including the interpret-mode Pallas route that
the TPU backend takes (view._pallas_closest) vs the skip-link route the
CPU takes, for both flat and instanced scenes.
"""

import numpy as np
import jax.numpy as jnp

from nexus_tpu.kernels import trace_hbm as ktrace
from nexus_tpu.scene import view
from nexus_tpu.scene.camera import generate_rays
from nexus_tpu.scene.scene import SceneBuilder


def _cornell(instanced=False):
    from nexus_tpu.io.loader import add_model

    b = SceneBuilder()
    add_model(b, "/root/reference/Nexus/assets/demo_scenes/cornell_box/"
                 "cornell_box.glb")
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=24, height=24)
    return b.build()


def _instanced_scene():
    rng = np.random.default_rng(11)
    b = SceneBuilder()
    mid = b.add_material(albedo=(0.7, 0.7, 0.7))
    v = rng.uniform(-0.5, 0.5, (40, 3)).astype(np.float32)
    f = rng.integers(0, 40, (60, 3))
    mesh = b.add_mesh_asset(v, f, name="blob")
    for k in range(4):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [k - 1.5, 0.0, -2.0]
        b.add_instance(mesh, mid, m)
    b.set_camera(position=(0.0, 0.0, 2.0), look_at=(0.0, 0.0, -2.0),
                 width=24, height=24)
    return b.build_instanced()


def _camera_rays(scene):
    n = scene.camera.width * scene.camera.height
    pix = jnp.arange(n, dtype=jnp.int32)
    u = jnp.full((n, 4), 0.5, jnp.float32)
    ray = generate_rays(scene.camera, pix, u)
    return ray.origin, ray.direction


def test_view_dispatch_cpu_uses_links():
    """On CPU the scene view must NOT route to the Pallas kernel."""
    b = SceneBuilder()
    mid = b.add_material()
    tri = np.array([[-1, -1, -2], [1, -1, -2], [0, 1, -2]], np.float32)
    b.add_mesh(tri, np.array([[0, 1, 2]]), mid)
    s = b.build()
    assert s.blocked is not None
    assert not view._use_pallas(s)  # CPU backend in tests
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    it = view.closest_hit(s, o, d)
    np.testing.assert_allclose(np.asarray(it.t), [2.0], rtol=1e-5)


def test_pallas_route_matches_links_flat():
    """view._pallas_closest (the TPU route, interpret mode) ==
    view.closest_hit (the CPU skip-link route) on Cornell camera rays."""
    s = _cornell()
    o, d = _camera_rays(s)
    ref = view.closest_hit(s, o, d)
    got = view._pallas_closest(s, o, d, interpret=True)
    hit = np.asarray(ref.hit)
    assert (np.asarray(got.hit) == hit).all()
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(ref.t)[hit], rtol=1e-4, atol=1e-5)
    assert (np.asarray(got.tri_idx)[hit]
            == np.asarray(ref.tri_idx)[hit]).all()


def test_pallas_route_matches_links_instanced():
    s = _instanced_scene()
    assert s.is_instanced and s.blocked is not None and s.blocked.instanced
    o, d = _camera_rays(s)
    ref = view.closest_hit(s, o, d)
    got = view._pallas_closest(s, o, d, interpret=True)
    hit = np.asarray(ref.hit)
    assert (np.asarray(got.hit) == hit).all()
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(ref.t)[hit], rtol=1e-4, atol=1e-4)
    assert (np.asarray(got.tri_idx)[hit]
            == np.asarray(ref.tri_idx)[hit]).all()
    assert (np.asarray(got.inst_idx)[hit]
            == np.asarray(ref.inst_idx)[hit]).all()


def test_padding_is_inert():
    """Hits may only reference real triangles even when the count is
    not a CHUNK multiple (degenerate padding rejected by det=0)."""
    rng = np.random.default_rng(5)
    n_real = ktrace.CHUNK + 7
    c = rng.uniform(-1.5, 1.5, (n_real, 3)).astype(np.float32)
    v0 = c + rng.normal(0, 0.2, (n_real, 3)).astype(np.float32)
    v1 = c + rng.normal(0, 0.2, (n_real, 3)).astype(np.float32)
    v2 = c + rng.normal(0, 0.2, (n_real, 3)).astype(np.float32)
    from nexus_tpu.accel import bvh2
    bvh = bvh2.build(v0, v1, v2, leaf_size=3)
    bs = ktrace.build_blocked_flat(v0, v1, v2, bvh.tri_order)
    o_np = rng.uniform(-4, 4, (512, 3)).astype(np.float32)
    target = rng.uniform(-1.5, 1.5, (512, 3)).astype(np.float32)
    d = target - o_np
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o_np)
    t, tri, _ = ktrace.closest_hit_scene(bs, o, jnp.asarray(d),
                                         interpret=True)
    tri = np.asarray(tri)
    hit = tri >= 0
    assert hit.sum() > 30
    assert (tri[hit] < n_real).all()


def test_parked_rays_miss():
    """Rays parked at +1e30 (dead wavefront lanes) must report miss and
    must not poison their tile's conservative bounds."""
    s = _cornell()
    o, d = _camera_rays(s)
    n = o.shape[0]
    parked = (np.arange(n) % 3) == 0
    o_mixed = jnp.where(jnp.asarray(parked)[:, None], 1.0e30, o)
    ref = view.closest_hit(s, o, d)
    got = view._pallas_closest(s, o_mixed, d, interpret=True)
    live = ~parked & np.asarray(ref.hit)
    assert (~np.asarray(got.hit)[parked]).all()
    np.testing.assert_allclose(np.asarray(got.t)[live],
                               np.asarray(ref.t)[live],
                               rtol=1e-4, atol=1e-5)


import pytest


@pytest.mark.slow  # CWBVH traversal compile ~2min on CPU
def test_accel_bvh8_product_path():
    """build(accel="bvh8") routes view dispatch through the CWBVH
    traversal and renders identically to the default skip-link build
    (BVH8Traversal.cuh-analog serving the actual product)."""
    from nexus_tpu.io.loader import add_model

    def build(accel):
        b = SceneBuilder()
        add_model(b, "/root/reference/Nexus/assets/demo_scenes/"
                     "cornell_box/cornell_box.glb")
        b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                     hfov_deg=50.0, width=24, height=24)
        return b.build(accel=accel)

    s_links = build("links")
    s_bvh8 = build("bvh8")
    assert s_bvh8.bvh8 is not None
    o, d = _camera_rays(s_links)
    a = view.closest_hit(s_links, o, d)
    bb = view.closest_hit(s_bvh8, o, d)
    hit = np.asarray(a.hit)
    assert (np.asarray(bb.hit) == hit).all()
    np.testing.assert_allclose(np.asarray(bb.t)[hit],
                               np.asarray(a.t)[hit], rtol=1e-5)
    assert (np.asarray(bb.tri_idx)[hit] == np.asarray(a.tri_idx)[hit]).all()
    # Shadow rays too.
    occ_a = np.asarray(view.any_hit(s_links, o, d, 3.0))
    occ_b = np.asarray(view.any_hit(s_bvh8, o, d, 3.0))
    np.testing.assert_array_equal(occ_a, occ_b)

    # End-to-end render parity through the public API.
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.render.megakernel import render
    st = RenderSettings(width=24, height=24, path_length=3)
    img_l = np.asarray(render(s_links, st, n_samples=2))
    img_8 = np.asarray(render(s_bvh8, st, n_samples=2))
    np.testing.assert_allclose(img_l, img_8, rtol=1e-5, atol=1e-6)
