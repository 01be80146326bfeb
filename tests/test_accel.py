"""BVH build + traversal tests: builder invariants, traversal vs brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.accel import bvh2, traverse2
from nexus_tpu.geom import triangle
from nexus_tpu.geom.types import MISS_DISTANCE


def _random_tris(n, seed=0, spread=4.0):
    rs = np.random.RandomState(seed)
    center = rs.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d1 = rs.normal(0, 0.4, (n, 3)).astype(np.float32)
    d2 = rs.normal(0, 0.4, (n, 3)).astype(np.float32)
    return center, center + d1, center + d2


def _brute_force(o, d, v0, v1, v2):
    valid, t, u, v = triangle.intersect(
        o[:, None, :], d[:, None, :], v0[None], v1[None], v2[None])
    ti = jnp.argmin(t, axis=1)
    r = jnp.arange(o.shape[0])
    return t[r, ti], jnp.where(t[r, ti] < MISS_DISTANCE, ti, -1)


class TestBVH2Builder:
    def test_invariants(self):
        v0, v1, v2 = _random_tris(500, seed=1)
        bvh = bvh2.build(v0, v1, v2, leaf_size=4)
        # tri_order is a permutation
        assert sorted(bvh.tri_order.tolist()) == list(range(500))
        # every leaf's triangles are inside the leaf box (with epsilon)
        tmin = np.minimum(np.minimum(v0, v1), v2)
        tmax = np.maximum(np.maximum(v0, v1), v2)
        for i in range(bvh.node_count):
            if bvh.count[i] > 0:
                ids = bvh.tri_order[
                    bvh.left_first[i]:bvh.left_first[i] + bvh.count[i]]
                assert (tmin[ids] >= bvh.bmin[i] - 1e-4).all()
                assert (tmax[ids] <= bvh.bmax[i] + 1e-4).all()
        # children contained in parents
        for i in range(bvh.node_count):
            if bvh.count[i] == 0:
                li = bvh.left_first[i]
                for c in (li, li + 1):
                    assert (bvh.bmin[c] >= bvh.bmin[i] - 1e-4).all()
                    assert (bvh.bmax[c] <= bvh.bmax[i] + 1e-4).all()

    def test_leaf_one_mode(self):
        v0, v1, v2 = _random_tris(64, seed=2)
        bvh = bvh2.build(v0, v1, v2, force_leaf_one=True)
        leaf_counts = bvh.count[bvh.count > 0]
        assert (leaf_counts == 1).all()
        assert leaf_counts.sum() == 64

    def test_identical_centroids(self):
        # All triangles at the same spot: SplitNodeInHalf fallback path.
        v0 = np.zeros((8, 3), np.float32)
        v1 = np.full((8, 3), 0.5, np.float32)
        v2 = np.asarray([[0, 1, 0]] * 8, np.float32)
        bvh = bvh2.build(v0, v1, v2, leaf_size=2)
        assert sorted(bvh.tri_order.tolist()) == list(range(8))


class TestTraversal:
    @pytest.mark.parametrize("n_tris,seed", [(37, 3), (500, 4)])
    def test_closest_hit_matches_brute_force(self, n_tris, seed):
        v0, v1, v2 = _random_tris(n_tris, seed=seed)
        bvh = bvh2.build(v0, v1, v2, leaf_size=4)
        arrays = traverse2.device_arrays(bvh, v0, v1, v2)

        rs = np.random.RandomState(seed + 100)
        o = rs.uniform(-6, 6, (128, 3)).astype(np.float32)
        d = rs.normal(size=(128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        isect = traverse2.closest_hit(arrays, jnp.asarray(o), jnp.asarray(d))
        t_ref, ti_ref = _brute_force(
            jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))

        np.testing.assert_allclose(np.asarray(isect.t), np.asarray(t_ref),
                                   rtol=1e-5)
        hit = np.asarray(t_ref) < 1e29
        # Same triangle (could differ on exact ties; none expected w/ random data)
        np.testing.assert_array_equal(
            np.asarray(isect.tri_idx)[hit], np.asarray(ti_ref)[hit])

    def test_any_hit(self):
        v0, v1, v2 = _random_tris(200, seed=5)
        bvh = bvh2.build(v0, v1, v2, leaf_size=4)
        arrays = traverse2.device_arrays(bvh, v0, v1, v2)

        rs = np.random.RandomState(6)
        o = rs.uniform(-6, 6, (128, 3)).astype(np.float32)
        d = rs.normal(size=(128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        t_ref, _ = _brute_force(jnp.asarray(o), jnp.asarray(d),
                                jnp.asarray(v0), jnp.asarray(v1),
                                jnp.asarray(v2))
        occ = traverse2.any_hit(arrays, jnp.asarray(o), jnp.asarray(d),
                                t_max=10.0)
        expected = np.asarray(t_ref) < 10.0
        np.testing.assert_array_equal(np.asarray(occ), expected)

    def test_t_max_zero_disables(self):
        v0, v1, v2 = _random_tris(16, seed=7)
        bvh = bvh2.build(v0, v1, v2)
        arrays = traverse2.device_arrays(bvh, v0, v1, v2)
        o = jnp.zeros((4, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 3))
        occ = traverse2.any_hit(arrays, o, d, t_max=jnp.zeros(4))
        assert not np.asarray(occ).any()
