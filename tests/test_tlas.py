"""TLAS/BLAS instancing: traversal equivalence + instanced rendering.

Mirrors the reference's two-level traversal semantics
(Nexus/src/Cuda/BVH/BVH8Traversal.cuh:234-267 instance transition;
BVHInstance transforms, BVHInstance.cpp:4-29) — validated against the
flattened single-BVH2 path, which is itself validated against brute
force in test_accel.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nexus_tpu.accel import tlas as tlas_mod
from nexus_tpu.accel import traverse2, traverse_tlas
from nexus_tpu.accel import bvh2 as bvh2_mod
from nexus_tpu.accel.traverse2 import device_arrays
from nexus_tpu.geom.types import MISS_DISTANCE


def _random_mesh(rng, n_tris, scale=1.0):
    base = rng.uniform(-1, 1, (n_tris, 1, 3))
    offs = rng.uniform(-0.3, 0.3, (n_tris, 3, 3))
    tris = (base + offs) * scale
    return tris[:, 0].astype(np.float32), tris[:, 1].astype(np.float32), \
        tris[:, 2].astype(np.float32)


def _random_transform(rng, scale_ok=True):
    angle = rng.uniform(0, 2 * np.pi)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    c, s = np.cos(angle), np.sin(angle)
    k = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    r = np.eye(3) + s * k + (1 - c) * (k @ k)
    if scale_ok:
        r = r @ np.diag(rng.uniform(0.5, 2.0, 3))
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r
    m[:3, 3] = rng.uniform(-2, 2, 3)
    return m


def _build_pair(seed, n_meshes=3, n_inst=6, tris_per=24):
    """The same instanced scene as (TLASArrays, flattened BVH2Arrays)."""
    rng = np.random.default_rng(seed)
    blases, meshes = [], []
    for _ in range(n_meshes):
        v0, v1, v2 = _random_mesh(rng, tris_per)
        meshes.append((v0, v1, v2))
        blases.append(tlas_mod.build_blas(v0, v1, v2, leaf_size=2))
    inst_blas = [int(rng.integers(0, n_meshes)) for _ in range(n_inst)]
    transforms = [_random_transform(rng) for _ in range(n_inst)]
    tl = tlas_mod.build_tlas(blases, inst_blas, transforms,
                             material_ids=[0] * n_inst)

    # Flatten: transform every instance's triangles to world space.
    w0, w1, w2 = [], [], []
    for b, m in zip(inst_blas, transforms):
        v0, v1, v2 = meshes[b]
        for dst, src in ((w0, v0), (w1, v1), (w2, v2)):
            dst.append(src @ m[:3, :3].T + m[:3, 3])
    w0 = np.concatenate(w0).astype(np.float32)
    w1 = np.concatenate(w1).astype(np.float32)
    w2 = np.concatenate(w2).astype(np.float32)
    flat = device_arrays(bvh2_mod.build(w0, w1, w2, leaf_size=2),
                         w0, w1, w2)
    return tl, flat, rng


@pytest.mark.parametrize("seed", [0, 1])
def test_closest_matches_flattened(seed):
    tl, flat, rng = _build_pair(seed)
    n_rays = 128
    o = rng.uniform(-5, 5, (n_rays, 3)).astype(np.float32)
    target = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)

    it = traverse_tlas.closest_hit(tl, jnp.asarray(o), jnp.asarray(d))
    if_ = traverse2.closest_hit(flat, jnp.asarray(o), jnp.asarray(d))

    hit_t = np.asarray(it.t)
    hit_f = np.asarray(if_.t)
    miss_t = hit_t >= MISS_DISTANCE
    miss_f = hit_f >= MISS_DISTANCE
    np.testing.assert_array_equal(miss_t, miss_f)
    both = ~miss_t
    assert both.sum() >= 20, "test scene should produce hits"
    np.testing.assert_allclose(hit_t[both], hit_f[both], rtol=1e-3,
                               atol=1e-4)
    # Same world hit POINTS (triangle ids live in different index spaces).
    pt = o[both] + d[both] * hit_t[both, None]
    pf = o[both] + d[both] * hit_f[both, None]
    np.testing.assert_allclose(pt, pf, rtol=1e-3, atol=1e-3)


def test_any_hit_matches_flattened(seed=3):
    tl, flat, rng = _build_pair(seed)
    n_rays = 128
    o = rng.uniform(-5, 5, (n_rays, 3)).astype(np.float32)
    target = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = (target - o)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)
    t_max = rng.uniform(0.5, 12.0, n_rays).astype(np.float32)

    # Resolve boundary sensitivity: compare against the flattened
    # CLOSEST hit (strictly inside / strictly outside t_max).
    if_ = traverse2.closest_hit(flat, jnp.asarray(o), jnp.asarray(d))
    t_ref = np.asarray(if_.t)
    occ = np.asarray(traverse_tlas.any_hit(tl, jnp.asarray(o),
                                           jnp.asarray(d),
                                           jnp.asarray(t_max)))
    margin = 1e-3 * np.maximum(t_ref, 1.0)
    definite_hit = t_ref < t_max - margin
    definite_miss = t_ref > t_max + margin
    assert occ[definite_hit].all()
    assert not occ[definite_miss].any()


def test_instanced_render_matches_flat():
    """Cornell box loaded both ways renders the same image."""
    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.io.loader import add_model, add_model_instanced
    from nexus_tpu.render.megakernel import render
    from nexus_tpu.scene.scene import SceneBuilder

    glb = ("/root/reference/Nexus/assets/demo_scenes/cornell_box/"
           "cornell_box.glb")
    cam = dict(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
               hfov_deg=50.0, width=24, height=24)

    bf = SceneBuilder()
    add_model(bf, glb)
    bf.set_camera(**cam)
    flat_scene = bf.build()

    bi = SceneBuilder()
    add_model_instanced(bi, glb)
    bi.set_camera(**cam)
    inst_scene = bi.build_instanced()
    assert inst_scene.is_instanced and inst_scene.n_lights >= 1

    settings = RenderSettings(width=24, height=24, path_length=3)
    img_flat = np.asarray(render(flat_scene, settings, n_samples=2))
    img_inst = np.asarray(render(inst_scene, settings, n_samples=2))
    assert np.isfinite(img_inst).all()
    # Same RNG keying (pixel, sample) + same geometry → same paths.
    np.testing.assert_allclose(img_inst, img_flat, rtol=1e-3, atol=1e-3)


def test_shared_blas_instances():
    """Two instances of one asset: hits land where each was placed,
    normals follow invT^T under non-uniform scale."""
    from nexus_tpu.scene.scene import SceneBuilder
    from nexus_tpu.scene import view

    b = SceneBuilder()
    mid = b.add_material(albedo=(0.5, 0.5, 0.5))
    # Unit quad in the XY plane at z=0 (two triangles).
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    asset = b.add_mesh_asset(verts, faces, name="quad")

    t1 = np.eye(4, dtype=np.float32)
    t1[:3, 3] = (0, 0, -1.0)
    t2 = np.eye(4, dtype=np.float32)
    t2[:3, :3] = np.diag([3.0, 0.25, 1.0])  # non-uniform scale
    t2[:3, 3] = (0, 0, -5.0)
    b.add_instance(asset, mid, t1)
    b.add_instance(asset, mid, t2)
    scene = b.build_instanced()

    o = jnp.asarray([[0.0, 0.0, 2.0], [2.0, 0.0, 2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    it = traverse_tlas.closest_hit(scene.tlas, o, d)
    t = np.asarray(it.t)
    inst = np.asarray(it.inst_idx)
    # Ray 0 hits the near quad (t=3); ray 1 misses it (x=2 > 1) but hits
    # the x-scaled far instance (t=7).
    np.testing.assert_allclose(t, [3.0, 7.0], rtol=1e-5)
    np.testing.assert_array_equal(inst, [0, 1])
    # Normal transform: quad normal +z stays +z for both instances and
    # unit length after normalization in the view helper.
    n0, _, _ = view.tri_world_normals(scene, it.tri_idx, it.inst_idx)
    n0 = np.asarray(n0 / jnp.linalg.norm(n0, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.abs(n0[:, 2]), 1.0, atol=1e-6)
