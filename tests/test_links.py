"""Stackless skip-link traversal equivalence vs the stack traversals.

The skip-link tables (accel/links.py) must reproduce exactly the hit
set of the ordered-stack traversals, which are themselves validated
against brute force (test_accel.py) and the flattened scene
(test_tlas.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nexus_tpu.accel import bvh2 as bvh2_mod
from nexus_tpu.accel import traverse2, traverse_links
from nexus_tpu.accel.traverse2 import device_arrays
from nexus_tpu.geom.types import MISS_DISTANCE

from test_tlas import _build_pair, _random_mesh


def _rays(rng, n_rays):
    o = rng.uniform(-5, 5, (n_rays, 3)).astype(np.float32)
    target = rng.uniform(-1.5, 1.5, (n_rays, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


@pytest.mark.parametrize("seed,n", [(0, 64), (1, 333)])
def test_flat_closest_matches_stack(seed, n):
    rng = np.random.default_rng(seed)
    v0, v1, v2 = _random_mesh(rng, n, scale=1.5)
    base = device_arrays(bvh2_mod.build(v0, v1, v2, leaf_size=3),
                         v0, v1, v2)
    lb = traverse_links.link_bvh2(base)
    o, d = _rays(rng, 256)

    a = traverse2.closest_hit(base, o, d)
    b = traverse_links.closest_hit(lb, o, d)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hit = np.asarray(a.hit)
    assert hit.sum() > 30
    np.testing.assert_allclose(np.asarray(b.t)[hit], np.asarray(a.t)[hit],
                               rtol=1e-4, atol=1e-5)
    # Same triangle except exact-tie cases.
    same_tri = np.asarray(a.tri_idx)[hit] == np.asarray(b.tri_idx)[hit]
    assert same_tri.mean() > 0.99


def test_flat_any_hit_matches_stack():
    rng = np.random.default_rng(7)
    v0, v1, v2 = _random_mesh(rng, 200, scale=1.5)
    base = device_arrays(bvh2_mod.build(v0, v1, v2, leaf_size=3),
                         v0, v1, v2)
    lb = traverse_links.link_bvh2(base)
    o, d = _rays(rng, 256)
    t_max = jnp.asarray(rng.uniform(0.5, 10.0, 256).astype(np.float32))

    a = np.asarray(traverse2.any_hit(base, o, d, t_max))
    b = np.asarray(traverse_links.any_hit(lb, o, d, t_max))
    np.testing.assert_array_equal(a, b)
    assert a.sum() > 20


@pytest.mark.parametrize("seed", [0, 2])
def test_tlas_closest_matches_stack(seed):
    tl, flat, rng = _build_pair(seed)
    lt = traverse_links.link_tlas(tl)
    o, d = _rays(rng, 256)

    a = traverse2.closest_hit(flat, o, d)
    b = traverse_links.closest_hit_tlas(lt, o, d)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hit = np.asarray(a.hit)
    assert hit.sum() > 20
    np.testing.assert_allclose(np.asarray(b.t)[hit], np.asarray(a.t)[hit],
                               rtol=1e-3, atol=1e-4)
    # World hit points agree with the flattened reference.
    on = np.asarray(o)[hit]
    dn = np.asarray(d)[hit]
    pa = on + dn * np.asarray(a.t)[hit][:, None]
    pb = on + dn * np.asarray(b.t)[hit][:, None]
    np.testing.assert_allclose(pa, pb, rtol=1e-3, atol=1e-3)


def test_tlas_any_hit_matches_flat(seed=4):
    tl, flat, rng = _build_pair(seed)
    lt = traverse_links.link_tlas(tl)
    o, d = _rays(rng, 256)
    t_max = rng.uniform(0.5, 12.0, 256).astype(np.float32)

    if_ = traverse2.closest_hit(flat, o, d)
    t_ref = np.asarray(if_.t)
    occ = np.asarray(traverse_links.any_hit_tlas(lt, o, d,
                                                 jnp.asarray(t_max)))
    margin = 1e-3 * np.maximum(t_ref, 1.0)
    assert occ[t_ref < t_max - margin].all()
    assert not occ[t_ref > t_max + margin].any()


def test_scene_builds_use_links():
    """Both builders attach link tables; renders stay correct
    (covered by test_tlas.py/test_render.py through scene/view)."""
    from nexus_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    mid = b.add_material()
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_mesh(tri, np.array([[0, 1, 2]]), mid)
    s = b.build()
    assert s.links_hit is not None and s.links_hit.shape[0] % 8 == 0

    b2 = SceneBuilder()
    mid2 = b2.add_material()
    a = b2.add_mesh_asset(tri, np.array([[0, 1, 2]]))
    b2.add_instance(a, mid2)
    s2 = b2.build_instanced()
    assert s2.links_hit is not None
