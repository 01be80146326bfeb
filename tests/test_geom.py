"""Geometry tests: Möller–Trumbore vs analytic, AABB slab test."""

import jax.numpy as jnp
import numpy as np

from nexus_tpu.geom import MISS_DISTANCE, aabb, triangle


class TestTriangle:
    V0 = jnp.asarray([0.0, 0.0, 0.0])
    V1 = jnp.asarray([1.0, 0.0, 0.0])
    V2 = jnp.asarray([0.0, 1.0, 0.0])

    def test_hit_center(self):
        o = jnp.asarray([0.25, 0.25, 1.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        valid, t, u, v = triangle.intersect(o, d, self.V0, self.V1, self.V2)
        assert bool(valid)
        np.testing.assert_allclose(float(t), 1.0, atol=1e-6)
        np.testing.assert_allclose([float(u), float(v)], [0.25, 0.25], atol=1e-6)

    def test_miss_outside(self):
        o = jnp.asarray([2.0, 2.0, 1.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        valid, t, _, _ = triangle.intersect(o, d, self.V0, self.V1, self.V2)
        assert not bool(valid)
        assert float(t) == float(np.float32(MISS_DISTANCE))

    def test_behind_origin(self):
        o = jnp.asarray([0.25, 0.25, -1.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        valid, _, _, _ = triangle.intersect(o, d, self.V0, self.V1, self.V2)
        assert not bool(valid)

    def test_no_backface_culling(self):
        o = jnp.asarray([0.25, 0.25, -1.0])
        d = jnp.asarray([0.0, 0.0, 1.0])
        valid, t, _, _ = triangle.intersect(o, d, self.V0, self.V1, self.V2)
        assert bool(valid)
        np.testing.assert_allclose(float(t), 1.0, atol=1e-6)

    def test_parallel_ray(self):
        o = jnp.asarray([0.25, 0.25, 1.0])
        d = jnp.asarray([1.0, 0.0, 0.0])
        valid, _, _, _ = triangle.intersect(o, d, self.V0, self.V1, self.V2)
        assert not bool(valid)

    def test_t_max_rejects(self):
        o = jnp.asarray([0.25, 0.25, 1.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        valid, _, _, _ = triangle.intersect(o, d, self.V0, self.V1, self.V2,
                                            t_max=0.5)
        assert not bool(valid)

    def test_batched(self):
        o = jnp.stack([jnp.asarray([0.25, 0.25, 1.0]),
                       jnp.asarray([5.0, 5.0, 1.0])])
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (2, 3))
        valid, t, u, v = triangle.intersect(o, d, self.V0, self.V1, self.V2)
        assert bool(valid[0]) and not bool(valid[1])

    def test_area_normal(self):
        a = triangle.area(self.V0, self.V1, self.V2)
        np.testing.assert_allclose(float(a), 0.5, atol=1e-6)
        n = triangle.geometric_normal(self.V0, self.V1, self.V2)
        np.testing.assert_allclose(np.asarray(n), [0.0, 0.0, 1.0], atol=1e-6)


class TestAABB:
    def test_hit(self):
        o = jnp.asarray([-2.0, 0.5, 0.5])
        d = jnp.asarray([1.0, 0.0, 0.0])
        t = aabb.intersect(o, 1.0 / d, jnp.zeros(3), jnp.ones(3))
        np.testing.assert_allclose(float(t), 2.0, atol=1e-6)

    def test_miss(self):
        o = jnp.asarray([-2.0, 2.5, 0.5])
        d = jnp.asarray([1.0, 0.0, 0.0])
        t = aabb.intersect(o, 1.0 / d, jnp.zeros(3), jnp.ones(3))
        assert float(t) == float(np.float32(MISS_DISTANCE))

    def test_inside_box(self):
        o = jnp.asarray([0.5, 0.5, 0.5])
        d = jnp.asarray([1.0, 0.0, 0.0])
        t = aabb.intersect(o, 1.0 / d, jnp.zeros(3), jnp.ones(3))
        # tmin < 0 but tmax > 0 → hit reported at tmin (negative entry).
        assert float(t) < float(np.float32(MISS_DISTANCE))

    def test_behind(self):
        o = jnp.asarray([2.5, 0.5, 0.5])
        d = jnp.asarray([1.0, 0.0, 0.0])
        t = aabb.intersect(o, 1.0 / d, jnp.zeros(3), jnp.ones(3))
        assert float(t) == float(np.float32(MISS_DISTANCE))

    def test_half_area(self):
        a = aabb.half_area(jnp.zeros(3), jnp.asarray([2.0, 3.0, 4.0]))
        np.testing.assert_allclose(float(a), 2 * 3 + 3 * 4 + 4 * 2, atol=1e-6)
