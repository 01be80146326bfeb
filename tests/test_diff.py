"""Gradient correctness: AD vs central finite differences.

The BASELINE metric (pixel-grad allclose for materials, textures,
lights, camera). Loss = mean of a clipped multi-sample Cornell render —
smooth in the parameters except for a measure-zero set of discrete
boundary crossings (see diff/fd.py docstring), so FD and AD agree to a
few percent at modest sample counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # FD sweeps: minutes each; AD smoke
# coverage for the default selection lives in test_render (albedo grad)
# and test_dist (sharded train_step).

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.diff.fd import fd_check
from nexus_tpu.io.loader import add_model
from nexus_tpu.render.megakernel import render_pixels
from nexus_tpu.scene.scene import SceneBuilder

CORNELL = "/root/reference/Nexus/assets/demo_scenes/cornell_box/cornell_box.glb"
# RR disabled (rr_start_bounce >= path_length): its survival decisions
# flip under FD perturbation, adding O(1) jumps that need far more
# samples to average out. AD remains correct with RR on (detached-p
# estimator, megakernel.py); FD comparison is just cleaner without it.
SETTINGS = RenderSettings(width=24, height=24, path_length=3,
                          rr_start_bounce=99)


@pytest.fixture(scope="module")
def scene():
    b = SceneBuilder()
    add_model(b, CORNELL)
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=24, height=24)
    return b.build()


def _render_loss(s, n_samples=4):
    pix = jnp.arange(24 * 24, dtype=jnp.int32)
    acc = 0.0
    for k in range(n_samples):
        acc = acc + jnp.mean(jnp.clip(
            render_pixels(s, SETTINGS, pix, jnp.uint32(k)), 0.0, 4.0))
    return acc / n_samples


class TestFiniteDifference:
    def test_albedo_scale(self, scene):
        @jax.jit
        def loss(scale):
            s = scene.replace(materials=scene.materials.replace(
                albedo=scene.materials.albedo * scale))
            return _render_loss(s)

        ad, fd, rel = fd_check(loss, 1.0, eps=2e-3)
        assert rel < 0.05, (ad, fd, rel)

    def test_emission_intensity(self, scene):
        @jax.jit
        def loss(scale):
            s = scene.replace(materials=scene.materials.replace(
                intensity=scene.materials.intensity * scale))
            return _render_loss(s)

        ad, fd, rel = fd_check(loss, 1.0, eps=2e-3)
        assert rel < 0.05, (ad, fd, rel)

    def test_camera_position(self):
        """Camera grads on an edge-free target (smooth textured quad).

        Interior-point AD cannot see silhouette/triangle-swap boundary
        terms (edge sampling / reparameterization is future work), so the
        FD comparison uses a scene whose radiance is C0 in camera motion:
        one large quad with a bilinear texture gradient.
        """
        b = SceneBuilder()
        tex = np.zeros((8, 8, 4), np.float32)
        tex[..., 3] = 1.0
        tex[..., 0] = np.linspace(0.1, 0.9, 8)[None, :]
        tex[..., 1] = np.linspace(0.9, 0.1, 8)[:, None]
        tid = b.add_texture(tex)
        m = b.add_material(albedo=(1, 1, 1), diffuse_map=tid)
        quad_v = np.asarray([[-8, -8, 0], [8, -8, 0], [8, 8, 0],
                             [-8, 8, 0]], np.float32)
        b.add_mesh(quad_v, np.asarray([[0, 1, 2], [0, 2, 3]]), m,
                   uvs=np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]],
                                  np.float32))
        b.background_color = (1.0, 1.0, 1.0)
        b.set_camera(position=(0, 0, 4), look_at=(0, 0, 0),
                     width=24, height=24, hfov_deg=40.0)
        sc = b.build()

        @jax.jit
        def loss(dx):
            cam = sc.camera
            offset = jnp.asarray([1.0, 0.0, 0.0]) * dx
            cam2 = cam.replace(position=cam.position + offset,
                               lower_left=cam.lower_left + offset)
            return _render_loss(sc.replace(camera=cam2))

        ad, fd, rel = fd_check(loss, 0.0, eps=2e-3)
        assert rel < 0.08, (ad, fd, rel)

    def test_roughness(self, scene):
        @jax.jit
        def loss(r):
            s = scene.replace(materials=scene.materials.replace(
                roughness=jnp.clip(scene.materials.roughness * r, 0.0, 1.0)))
            return _render_loss(s)

        ad, fd, rel = fd_check(loss, 0.9, eps=2e-3)
        # Roughness gradients pass through microfacet sampling
        # reparameterization; tolerance looser.
        assert rel < 0.15, (ad, fd, rel)

    def test_texture_texel_gradient(self):
        b = SceneBuilder()
        tex = np.full((2, 2, 4), 0.5, np.float32)
        tid = b.add_texture(tex)
        m = b.add_material(albedo=(1, 1, 1), diffuse_map=tid)
        quad_v = np.asarray([[-2, -2, 0], [2, -2, 0], [2, 2, 0],
                             [-2, 2, 0]], np.float32)
        b.add_mesh(quad_v, np.asarray([[0, 1, 2], [0, 2, 3]]), m,
                   uvs=np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]],
                                  np.float32))
        b.background_color = (1.0, 1.0, 1.0)
        b.set_camera(position=(0, 0, 3), look_at=(0, 0, 0),
                     width=24, height=24)
        sc = b.build()

        @jax.jit
        def loss(scale):
            # Scale RGB only: scaling alpha would move the pass-through
            # decision boundary (a discrete jump FD sees but AD, by the
            # detach convention, does not).
            s = sc.replace(textures=sc.textures.replace(
                data=sc.textures.data.at[..., :3].mul(scale)))
            return _render_loss(s)

        ad, fd, rel = fd_check(loss, 1.0, eps=2e-3)
        assert rel < 0.05, (ad, fd, rel)

    def test_env_map_gradient(self, scene):
        s_env = None
        b = SceneBuilder()
        add_model(b, CORNELL)
        b.set_env_map(np.full((4, 8, 3), 0.5, np.float32))
        b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                     hfov_deg=50.0, width=24, height=24)
        s_env = b.build()

        @jax.jit
        def loss(scale):
            s = s_env.replace(env_map=s_env.env_map * scale)
            return _render_loss(s)

        ad, fd, rel = fd_check(loss, 1.0, eps=2e-3)
        assert rel < 0.05, (ad, fd, rel)

