"""Unit tests: core math, RNG, sampling, tonemap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.core import math as nmath
from nexus_tpu.core import rng, sampling, tonemap


class TestRng:
    def test_deterministic(self):
        s = rng.init_state(jnp.arange(16), 3)
        s2 = rng.init_state(jnp.arange(16), 3)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))

    def test_distinct_streams(self):
        s_a = rng.init_state(jnp.arange(128), 0)
        s_b = rng.init_state(jnp.arange(128), 1)
        assert np.mean(np.asarray(s_a) == np.asarray(s_b)) < 0.01

    def test_uniform_range_and_mean(self):
        state = rng.init_state(jnp.arange(4096), 0)
        total = 0.0
        for _ in range(8):
            state, u = rng.rand(state)
            u = np.asarray(u)
            assert np.all(u >= 0.0) and np.all(u < 1.0)
            total += u.mean()
        assert abs(total / 8 - 0.5) < 0.01

    def test_shard_invariance(self):
        """Splitting the pixel batch must not change any pixel's stream."""
        full = rng.init_state(jnp.arange(64), 7)
        _, u_full = rng.rand(full)
        lo = rng.init_state(jnp.arange(32), 7)
        _, u_lo = rng.rand(lo)
        np.testing.assert_array_equal(np.asarray(u_full)[:32], np.asarray(u_lo))


class TestFrames:
    def test_rotation_to_z_maps_n_to_z(self):
        key = jax.random.PRNGKey(0)
        n = jax.random.normal(key, (256, 3))
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        local = nmath.rotate(nmath.rotation_to_z(n), n)
        np.testing.assert_allclose(np.asarray(local[..., 2]), 1.0, atol=1e-5)

    def test_roundtrip(self):
        key = jax.random.PRNGKey(1)
        n = jax.random.normal(key, (64, 3))
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        v = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
        back = nmath.to_world_frame(n, nmath.to_local_frame(n, v))
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_antipodal_direction(self):
        n = jnp.asarray([[0.0, 0.0, -1.0]])
        local = nmath.rotate(nmath.rotation_to_z(n), n)
        np.testing.assert_allclose(np.asarray(local), [[0.0, 0.0, 1.0]], atol=1e-6)


class TestOffsetRay:
    def test_moves_off_surface(self):
        p = jnp.asarray([[1.0, -2.0, 0.001], [100.0, 0.5, -3.0]])
        n = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        q = nmath.offset_ray(p, n)
        d = np.asarray(q - p)
        assert np.all(np.abs(d) < 1e-2)
        # Offset along +n has positive component.
        assert np.asarray(jnp.sum((q - p) * n, axis=-1)).min() > 0.0


class TestSampling:
    def test_cosine_hemisphere_stats(self):
        state = rng.init_state(jnp.arange(1 << 16), 0)
        state, u1, u2 = rng.rand2(state)
        d = sampling.cosine_hemisphere(u1, u2)
        d = np.asarray(d)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        assert np.all(d[:, 2] >= 0.0)
        # E[cos theta] = 2/3 for pdf = cos/pi.
        assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01

    def test_unit_disk(self):
        state = rng.init_state(jnp.arange(1 << 14), 1)
        state, u1, u2 = rng.rand2(state)
        p = np.asarray(sampling.unit_disk(u1, u2))
        r = np.linalg.norm(p, axis=-1)
        assert np.all(r <= 1.0 + 1e-6)
        # E[r] = 2/3 for a uniform disk.
        assert abs(r.mean() - 2.0 / 3.0) < 0.01

    def test_uniform_triangle_inside(self):
        state = rng.init_state(jnp.arange(4096), 2)
        state, u1, u2 = rng.rand2(state)
        uv = np.asarray(sampling.uniform_triangle(u1, u2))
        assert np.all(uv >= 0.0)
        assert np.all(uv.sum(-1) <= 1.0 + 1e-6)

    def test_power_heuristic(self):
        w = sampling.power_heuristic(jnp.asarray(2.0), jnp.asarray(1.0))
        assert abs(float(w) - 4.0 / 5.0) < 1e-6
        w1 = sampling.power_heuristic(jnp.asarray(3.0), jnp.asarray(1.0))
        w2 = sampling.power_heuristic(jnp.asarray(1.0), jnp.asarray(3.0))
        assert abs(float(w1 + w2) - 1.0) < 1e-6


class TestTonemap:
    def test_range(self):
        x = jnp.asarray([[0.0, 0.5, 1.0], [10.0, 100.0, 0.01]])
        y = np.asarray(tonemap.to_display(x))
        assert np.all(y >= 0.0) and np.all(y <= 1.0)

    def test_monotonic(self):
        x = jnp.linspace(0.0, 4.0, 64)
        y = np.asarray(tonemap.aces_tonemap(x))
        assert np.all(np.diff(y) >= -1e-6)


def test_zorder_is_permutation_and_local():
    """core/zorder.py: valid permutation, square-ish tiles, exact inverse."""
    import numpy as np

    from nexus_tpu.core.zorder import zorder_pixels

    for w, h in ((64, 64), (160, 90)):
        perm = zorder_pixels(w, h)
        assert sorted(perm.tolist()) == list(range(w * h))
        inv = np.empty_like(perm)
        inv[perm] = np.arange(w * h, dtype=np.int32)
        assert (perm[inv] == np.arange(w * h)).all()
        # locality: a 64-lane tile of the 64x64 enumeration spans an
        # 8x8 pixel block, not a scanline
        tile = perm[:64] if w == 64 else None
        if tile is not None:
            xs, ys = tile % w, tile // w
            assert xs.max() - xs.min() <= 8 and ys.max() - ys.min() <= 8
