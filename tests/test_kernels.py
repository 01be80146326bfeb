"""Pallas trace kernel correctness (interpret mode on CPU).

The dense block-culled kernel (kernels/trace.py) must reproduce the
stack traversal's hit set exactly — same contract the real-chip run
showed (100% agreement on 65k rays); these tests keep it honest on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nexus_tpu.accel import bvh2 as bvh2_mod
from nexus_tpu.accel import traverse2
from nexus_tpu.accel.traverse2 import device_arrays
from nexus_tpu.kernels import trace as ktrace

from test_tlas import _random_mesh


def _scene(seed, n):
    rng = np.random.default_rng(seed)
    v0, v1, v2 = _random_mesh(rng, n, scale=1.5)
    bvh = bvh2_mod.build(v0, v1, v2, leaf_size=3)
    base = device_arrays(bvh, v0, v1, v2)
    bt = ktrace.block_triangles(v0, v1, v2, order=bvh.tri_order)
    return base, bt, rng


def _rays(rng, n_rays):
    o = rng.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    target = rng.uniform(-1.5, 1.5, (n_rays, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


@pytest.mark.parametrize("seed,n", [(0, 100), (1, 300)])
def test_closest_matches_stack(seed, n):
    base, bt, rng = _scene(seed, n)
    o, d = _rays(rng, 640)
    t, slot = ktrace.closest_hit_blocks(bt, o, d, interpret=True)
    tri = np.where(np.asarray(slot) >= 0,
                   np.asarray(bt.to_global)[np.maximum(np.asarray(slot), 0)],
                   -1)
    ref = traverse2.closest_hit(base, o, d)
    hit_ref = np.asarray(ref.hit)
    np.testing.assert_array_equal(tri >= 0, hit_ref)
    assert hit_ref.sum() > 50
    np.testing.assert_allclose(np.asarray(t)[hit_ref],
                               np.asarray(ref.t)[hit_ref],
                               rtol=1e-4, atol=1e-5)
    assert (tri[hit_ref] == np.asarray(ref.tri_idx)[hit_ref]).mean() > 0.99


def test_any_hit_matches_stack():
    base, bt, rng = _scene(3, 200)
    o, d = _rays(rng, 640)
    t_max = jnp.asarray(rng.uniform(0.5, 10.0, 640).astype(np.float32))
    a = np.asarray(traverse2.any_hit(base, o, d, t_max))
    b = np.asarray(ktrace.any_hit_blocks(bt, o, d, t_max, interpret=True))
    np.testing.assert_array_equal(a, b)
    assert a.sum() > 30


def test_padding_is_inert():
    """Degenerate padding triangles must never be hit (n not a multiple
    of CHUNK exercises the padded tail)."""
    base, bt, rng = _scene(5, ktrace.CHUNK + 7)
    o, d = _rays(rng, 512)
    t, slot = ktrace.closest_hit_blocks(bt, o, d, interpret=True)
    slot = np.asarray(slot)
    n_real = ktrace.CHUNK + 7
    # Hits may only reference real triangles.
    blocked_real = np.asarray(bt.to_global)
    assert (slot < bt.n_blocks * ktrace.CHUNK).all()
    hit = slot >= 0
    tri = blocked_real[np.maximum(slot, 0)]
    assert (tri[hit] < n_real).all() and (tri[hit] >= 0).all()


def test_view_dispatch_cpu_uses_links():
    """On CPU the scene view must NOT route to the Pallas kernel."""
    from nexus_tpu.scene import view
    from nexus_tpu.scene.scene import SceneBuilder

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
