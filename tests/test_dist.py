"""Multi-device sharding correctness on the 8-virtual-CPU-device mesh
(conftest.py forces --xla_force_host_platform_device_count=8).

The RNG is keyed on (pixel, sample) (core/rng.py), so the sharded
render must be BIT-identical to the single-device render however the
pixel axis is partitioned — SURVEY.md §4 shard-equivalence. Gradient
data-parallelism: jax.grad through the sharded forward must psum to the
same parameter grads as the unsharded pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.dist import sharding
from nexus_tpu.io.loader import add_model
from nexus_tpu.render import megakernel
from nexus_tpu.scene.scene import SceneBuilder

CORNELL = "/root/reference/Nexus/assets/demo_scenes/cornell_box/cornell_box.glb"


def _scene(width, height):
    b = SceneBuilder()
    add_model(b, CORNELL)
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=width, height=height)
    return b.build()


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 devices"
    return sharding.make_mesh()


class TestShardedRender:
    def test_bit_identical_to_single_device(self, mesh):
        s = _scene(32, 32)
        st = RenderSettings(width=32, height=32, path_length=3)
        ref = np.asarray(megakernel.render(s, st, n_samples=2))
        got = np.asarray(sharding.render_sharded(s, st, n_samples=2,
                                                 mesh=mesh))
        np.testing.assert_array_equal(ref, got)

    def test_non_divisible_pixel_count(self, mesh):
        """24*9 = 216 pixels on 8 devices: exercises the pad path."""
        s = _scene(24, 9)
        st = RenderSettings(width=24, height=9, path_length=2)
        ref = np.asarray(megakernel.render(s, st, n_samples=1))
        got = np.asarray(sharding.render_sharded(s, st, n_samples=1,
                                                 mesh=mesh))
        np.testing.assert_array_equal(ref, got)

    def test_output_is_sharded(self, mesh):
        """The accumulated image must stay sharded until readback (no
        implicit full gather onto one device)."""
        s = _scene(32, 32)
        st = RenderSettings(width=32, height=32, path_length=2)
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_pix = 32 * 32
        pixel_sharding = NamedSharding(mesh, P(sharding.RAY_AXIS))
        pix = jax.device_put(jnp.arange(n_pix, dtype=jnp.int32),
                             pixel_sharding)
        scene_r = jax.device_put(s, NamedSharding(mesh, P()))
        out = jax.jit(
            lambda sc, p: megakernel.render_pixels(sc, st, p,
                                                   jnp.uint32(0)),
            out_shardings=pixel_sharding)(scene_r, pix)
        assert len(out.sharding.device_set) == 8


class TestShardedGrads:
    def test_train_step_matches_unsharded(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = _scene(8, 8)
        st = RenderSettings(width=8, height=8, path_length=2)
        n_pix = 8 * 8
        pix = jnp.arange(n_pix, dtype=jnp.int32)
        target = jnp.zeros((n_pix, 3), jnp.float32)

        # Unsharded reference step.
        ref_scene, ref_loss = jax.jit(
            lambda sc: sharding.train_step(sc, st, pix, target, 0))(s)

        # Sharded: same step with pixel_idx/target split over the mesh.
        pix_sh = jax.device_put(pix, NamedSharding(mesh, P(sharding.RAY_AXIS)))
        tgt_sh = jax.device_put(target,
                                NamedSharding(mesh, P(sharding.RAY_AXIS)))
        s_repl = jax.device_put(s, NamedSharding(mesh, P()))
        got_scene, got_loss = jax.jit(
            lambda sc, p, t: sharding.train_step(sc, st, p, t, 0))(
                s_repl, pix_sh, tgt_sh)

        np.testing.assert_allclose(float(ref_loss), float(got_loss),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got_scene.materials.albedo),
            np.asarray(ref_scene.materials.albedo), rtol=1e-5, atol=1e-7)

    @pytest.mark.slow  # weaker property than grad parity; compile-heavy
    def test_loss_decreases(self, mesh):
        """Three sharded steps on a bright-target loss must reduce it."""
        s = _scene(16, 16)
        st = RenderSettings(width=16, height=16, path_length=2)
        n_pix = 16 * 16
        pix = jnp.arange(n_pix, dtype=jnp.int32)
        target = jnp.full((n_pix, 3), 0.5, jnp.float32)
        step = jax.jit(lambda sc, k: sharding.train_step(
            sc, st, pix, target, k, lr=0.2))
        losses = []
        for k in range(3):
            s, loss = step(s, k)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
