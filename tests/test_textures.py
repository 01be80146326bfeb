"""Texture atlas, equirect env sampling, HDR IO, textured rendering."""

import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.scene import textures


def _checker(n=4):
    img = np.zeros((n, n, 4), np.float32)
    img[..., 3] = 1.0
    for y in range(n):
        for x in range(n):
            img[y, x, :3] = (x + y) % 2
    return img


class TestAtlas:
    def test_texel_center_exact(self):
        atlas = textures.build_atlas([_checker(4)])
        # Texel centers: uv = (x+0.5)/4 → exact texel values.
        uv = jnp.asarray([[0.125, 0.125], [0.375, 0.125]])
        c = textures.sample(atlas, jnp.zeros(2, jnp.int32), uv)
        np.testing.assert_allclose(np.asarray(c[:, 0]), [0.0, 1.0], atol=1e-6)

    def test_bilinear_midpoint(self):
        atlas = textures.build_atlas([_checker(2)])
        # Halfway between 4 texels (0,1 / 1,0) → 0.5.
        c = textures.sample(atlas, jnp.zeros(1, jnp.int32),
                            jnp.asarray([[0.5, 0.5]]))
        np.testing.assert_allclose(float(c[0, 0]), 0.5, atol=1e-6)

    def test_wrap(self):
        atlas = textures.build_atlas([_checker(4)])
        a = textures.sample(atlas, jnp.zeros(1, jnp.int32),
                            jnp.asarray([[0.125, 0.125]]))
        b = textures.sample(atlas, jnp.zeros(1, jnp.int32),
                            jnp.asarray([[1.125, -0.875]]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_no_texture_white(self):
        atlas = textures.build_atlas([_checker(2)])
        c = textures.sample(atlas, jnp.asarray([-1]),
                            jnp.asarray([[0.3, 0.7]]))
        np.testing.assert_array_equal(np.asarray(c), 1.0)

    def test_mixed_sizes(self):
        big = np.full((8, 8, 4), 0.25, np.float32)
        small = np.full((2, 2, 4), 0.75, np.float32)
        atlas = textures.build_atlas([big, small])
        c = textures.sample(atlas, jnp.asarray([0, 1]),
                            jnp.asarray([[0.5, 0.5], [0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(c[:, 0]), [0.25, 0.75],
                                   atol=1e-6)

    def test_gradient_flows_to_texels(self):
        atlas = textures.build_atlas([_checker(4)])

        def loss(data):
            a = atlas.replace(data=data)
            c = textures.sample(a, jnp.zeros(1, jnp.int32),
                                jnp.asarray([[0.3, 0.6]]))
            return jnp.sum(c)

        g = jax.grad(loss)(atlas.data)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0.0


class TestEquirect:
    def test_directions(self):
        h, w = 8, 16
        env = np.zeros((h, w, 3), np.float32)
        env[0, :] = (1, 0, 0)        # v=0 → +y pole
        env[-1, :] = (0, 1, 0)       # v=1 → -y pole
        e = jnp.asarray(env)
        up = textures.sample_equirect(e, jnp.asarray([0.0, 1.0, 0.0]))
        down = textures.sample_equirect(e, jnp.asarray([0.0, -1.0, 0.0]))
        assert float(up[0]) > 0.9 and float(up[1]) < 0.1
        assert float(down[1]) > 0.9 and float(down[0]) < 0.1

    def test_u_mapping(self):
        # theta = atan2(z, x): -x direction → theta=pi → u=1 (wraps to 0).
        h, w = 4, 8
        env = np.zeros((h, w, 3), np.float32)
        env[:, 0] = (1, 1, 1)
        e = jnp.asarray(env)
        c = textures.sample_equirect(e, jnp.asarray([-1.0, 0.0, 0.0]))
        assert float(c[0]) > 0.4   # lands on/next to column 0 after wrap


class TestHdrIO:
    def test_roundtrip(self, tmp_path):
        from nexus_tpu.io.hdr import read_hdr, write_hdr_rgbe

        rs = np.random.RandomState(0)
        img = (rs.uniform(0, 1, (6, 9, 3)).astype(np.float32)) ** 2 * 50.0
        p = tmp_path / "t.hdr"
        write_hdr_rgbe(p, img)
        back = read_hdr(p)
        assert back.shape == img.shape
        # RGBE quantization error scales with the pixel's MAX component
        # (shared exponent): unit = 2^ceil(log2(maxc))/256, |err| <= unit/2.
        max_c = img.max(axis=-1, keepdims=True)
        unit = 2.0 ** np.ceil(np.log2(max_c)) / 256.0
        assert (np.abs(back - img) <= unit + 1e-4).all()

    def test_env_render(self):
        """Miss rays must return the env radiance (true HDR > 1)."""
        import jax.numpy as jnp

        from nexus_tpu.core.config import RenderSettings
        from nexus_tpu.render.megakernel import render_pixels
        from nexus_tpu.scene.scene import SceneBuilder

        b = SceneBuilder()
        m = b.add_material()
        b.add_mesh(np.asarray([[10, 10, 10], [11, 10, 10], [10, 11, 10]],
                              np.float32),
                   np.asarray([[0, 1, 2]]), m)  # far away, never hit
        env = np.full((4, 8, 3), 3.5, np.float32)   # HDR value > 1
        b.set_env_map(env)
        b.set_camera(position=(0, 0, 0), look_at=(0, 0, -1),
                     width=4, height=4)
        scene = b.build()
        img = render_pixels(scene, RenderSettings(width=4, height=4,
                                                  path_length=2),
                            jnp.arange(16, dtype=jnp.int32), jnp.uint32(0))
        np.testing.assert_allclose(np.asarray(img), 3.5, atol=1e-5)


class TestTexturedRender:
    def _scene(self, alpha=1.0):
        from nexus_tpu.scene.scene import SceneBuilder

        b = SceneBuilder()
        tex = np.zeros((2, 2, 4), np.float32)
        tex[..., :3] = [[[1, 0, 0], [1, 0, 0]], [[1, 0, 0], [1, 0, 0]]]
        tex[..., 3] = alpha
        tid = b.add_texture(tex)
        m = b.add_material(albedo=(0.0, 1.0, 0.0), diffuse_map=tid,
                           mtype=0)
        quad_v = np.asarray([[-2, -2, 0], [2, -2, 0], [2, 2, 0],
                             [-2, 2, 0]], np.float32)
        quad_f = np.asarray([[0, 1, 2], [0, 2, 3]])
        quad_uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        b.add_mesh(quad_v, quad_f, m, uvs=quad_uv)
        b.background_color = (0.0, 0.0, 1.0)
        b.set_camera(position=(0, 0, 3), look_at=(0, 0, 0), width=8,
                     height=8)
        return b.build()

    def _render(self, scene):
        import jax.numpy as jnp

        from nexus_tpu.core.config import RenderSettings
        from nexus_tpu.render.megakernel import render_pixels

        return np.asarray(render_pixels(
            scene, RenderSettings(width=8, height=8, path_length=2),
            jnp.arange(64, dtype=jnp.int32), jnp.uint32(0))).reshape(8, 8, 3)

    def test_albedo_replaced_by_texture(self):
        img = self._render(self._scene(alpha=1.0))
        # Textured red quad lit by blue background: bounce light is
        # red*blue = 0 in green; green albedo must NOT appear.
        assert img[..., 1].max() < 1e-4

    def test_alpha_zero_passes_through(self):
        img = self._render(self._scene(alpha=0.0))
        # Fully transparent texture: rays pass through to the background.
        np.testing.assert_allclose(img[..., 2], 1.0, atol=1e-5)
        assert img[..., 0].max() < 1e-5


class TestAtlasPacking:
    def test_mixed_sizes_cost_sum_not_max(self):
        """One 1024px texture among 256px ones must not inflate every
        slot to 1024 (the old padded layout cost max-dims x count)."""
        from nexus_tpu.scene.textures import build_atlas

        images = [np.ones((1024, 1024, 4), np.float32)] + [
            np.full((256, 256, 4), i / 8.0, np.float32) for i in range(8)]
        atlas = build_atlas(images)
        total = atlas.data.shape[0] * atlas.data.shape[1]
        area = sum(im.shape[0] * im.shape[1] for im in images)
        padded = 9 * 1024 * 1024
        assert total < area * 2, (total, area)
        assert total < padded / 4

    def test_packed_sampling_exact(self):
        """Center-texel samples from every packed texture return that
        texture's own content (no bleed across rects)."""
        import jax.numpy as jnp

        from nexus_tpu.scene.textures import build_atlas, sample

        rng = np.random.default_rng(0)
        images = [np.full((h, w, 4), v, np.float32)
                  for v, (h, w) in enumerate([(64, 64), (16, 128),
                                              (128, 16), (1, 1), (33, 7)])]
        atlas = build_atlas(images)
        for i in range(len(images)):
            got = np.asarray(sample(atlas, jnp.int32(i),
                                    jnp.asarray([0.5, 0.5], jnp.float32)))
            np.testing.assert_allclose(got, float(i), atol=1e-6)
