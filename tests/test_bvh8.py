"""CWBVH builder invariants + traversal equivalence with BVH2."""

import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.accel import bvh2, bvh8, traverse2, traverse8


def _soup(n, seed):
    rs = np.random.RandomState(seed)
    c = rs.uniform(-4, 4, (n, 3)).astype(np.float32)
    return (c, c + rs.normal(0, .3, (n, 3)).astype(np.float32),
            c + rs.normal(0, .3, (n, 3)).astype(np.float32))


class TestBuilder:
    @pytest.mark.parametrize("n,seed", [(7, 0), (100, 1), (2000, 2)])
    def test_invariants(self, n, seed):
        v0, v1, v2 = _soup(n, seed)
        tree = bvh8.build(v0, v1, v2)
        bvh8.validate(tree, v0, v1, v2)
        # Leaf runs hold 1..P_MAX triangles.
        cnt = tree.child_tri_count[~tree.child_is_internal
                                   & (tree.child_offset >= 0)]
        assert cnt.min() >= 1 and cnt.max() <= bvh8.P_MAX
        # Node compression vs the BVH2 it came from.
        assert tree.node_count < 2 * n

    def test_identical_centroids(self):
        v0 = np.zeros((16, 3), np.float32)
        v1 = np.full((16, 3), 0.5, np.float32)
        v2 = np.asarray([[0, 1, 0]] * 16, np.float32)
        tree = bvh8.build(v0, v1, v2)
        assert sorted(tree.tri_idx.tolist()) == list(range(16))


class TestTraversalEquivalence:
    @pytest.mark.parametrize("n,seed", [
        (37, 3), pytest.param(2000, 4, marks=pytest.mark.slow)])
    def test_closest_matches_bvh2(self, n, seed):
        v0, v1, v2 = _soup(n, seed)
        a2 = traverse2.device_arrays(bvh2.build(v0, v1, v2), v0, v1, v2)
        a8 = traverse8.device_arrays(bvh8.build(v0, v1, v2), v0, v1, v2)
        rs = np.random.RandomState(seed + 9)
        o = jnp.asarray(rs.uniform(-6, 6, (256, 3)), jnp.float32)
        d = rs.normal(size=(256, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        i2 = traverse2.closest_hit(a2, o, d)
        i8 = traverse8.closest_hit(a8, o, d)
        h2 = np.asarray(i2.t) < 1e29
        h8 = np.asarray(i8.t) < 1e29
        np.testing.assert_array_equal(h2, h8)
        np.testing.assert_array_equal(np.asarray(i2.tri_idx)[h2],
                                      np.asarray(i8.tri_idx)[h8])
        np.testing.assert_allclose(np.asarray(i2.t)[h2],
                                   np.asarray(i8.t)[h8], rtol=1e-5)

    def test_any_hit_matches(self):
        v0, v1, v2 = _soup(500, 7)
        a2 = traverse2.device_arrays(bvh2.build(v0, v1, v2), v0, v1, v2)
        a8 = traverse8.device_arrays(bvh8.build(v0, v1, v2), v0, v1, v2)
        rs = np.random.RandomState(11)
        o = jnp.asarray(rs.uniform(-6, 6, (256, 3)), jnp.float32)
        d = rs.normal(size=(256, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        occ2 = traverse2.any_hit(a2, o, d, t_max=4.0)
        occ8 = traverse8.any_hit(a8, o, d, t_max=4.0)
        np.testing.assert_array_equal(np.asarray(occ2), np.asarray(occ8))
