"""Deterministic procedural geometry + scene builders for benchmarks.

Scale/feature stand-ins for the BASELINE configs (see package
docstring). All generators are seeded and pure-numpy on the host; the
scenes they build go through the exact same SceneBuilder/loader paths a
user's assets would (OBJ+MTL file round-trip for config 2, instanced
assets + textures + HDR env for config 4).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from nexus_tpu.scene.scene import SceneBuilder


# ---------------------------------------------------------------- geometry

def icosphere(subdiv: int) -> tuple[np.ndarray, np.ndarray]:
    """Unit icosphere: 20 * 4**subdiv triangles. Returns (V,3), (F,3)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        np.int64)
    for _ in range(subdiv):
        # Midpoint subdivision with shared-edge dedup via a dict.
        cache: dict = {}
        new_faces = []
        verts_list = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = verts_list[a] + verts_list[b]
                m /= np.linalg.norm(m)
                cache[key] = len(verts_list)
                verts_list.append(m)
            return cache[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, np.int64)
    return verts.astype(np.float32), faces


def _fbm_displace(verts: np.ndarray, amp: float = 0.18,
                  seed: int = 7) -> np.ndarray:
    """Smooth sum-of-sines displacement along the normal direction —
    turns the sphere into an organic blob (bunny-scale surface detail)
    without any noise-library dependency."""
    rng = np.random.default_rng(seed)
    v = verts.astype(np.float64)
    d = np.zeros(v.shape[0])
    for octave in range(4):
        freq = 1.6 * (2.0 ** octave)
        k = rng.normal(size=(3, 3))
        phase = rng.uniform(0, 2 * np.pi, 3)
        for j in range(3):
            d += (amp / (2.0 ** octave)
                  * np.sin(freq * (v @ k[j]) + phase[j]) / 3.0)
    out = v * (1.0 + d)[:, None]
    return out.astype(np.float32)


def blob_mesh(subdiv: int, amp: float = 0.18,
              seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Displaced icosphere: the deterministic 'bunny' stand-in.
    subdiv=6 → 81,920 tris (Stanford bunny is 69,451)."""
    v, f = icosphere(subdiv)
    return _fbm_displace(v, amp, seed), f


def sphere_uv(verts: np.ndarray) -> np.ndarray:
    """Equirectangular UVs from vertex directions."""
    d = verts / np.maximum(np.linalg.norm(verts, axis=1, keepdims=True),
                           1e-12)
    u = (np.arctan2(d[:, 2], d[:, 0]) + np.pi) / (2 * np.pi)
    v = (np.arcsin(np.clip(d[:, 1], -1, 1)) + np.pi / 2) / np.pi
    return np.stack([u, v], axis=1).astype(np.float32)


# ---------------------------------------------------------------- textures

def checker_texture(n: int = 256, c0=(0.9, 0.9, 0.9),
                    c1=(0.2, 0.3, 0.8), tiles: int = 8) -> np.ndarray:
    """(n, n, 4) float32 RGBA checkerboard (linear color)."""
    ij = np.arange(n) * tiles // n
    mask = (ij[:, None] + ij[None, :]) % 2
    img = np.where(mask[..., None], np.asarray(c1, np.float32),
                   np.asarray(c0, np.float32))
    return np.concatenate([img, np.ones((n, n, 1), np.float32)],
                          axis=-1).astype(np.float32)


def procedural_sky(h: int = 256, w: int = 512,
                   sun_dir=(0.35, 0.65, 0.4),
                   sun_radiance: float = 80.0) -> np.ndarray:
    """(h, w, 3) float32 HDR equirect sky: horizon-to-zenith gradient +
    a bright sun disk (true HDR values — exercises env-map MIS-free
    background sampling with radiance ≫ 1)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # Inverse of textures.sample_equirect mapping.
    theta = (xs + 0.5) / w * 2 * np.pi - np.pi
    phi = np.pi / 2 - (ys + 0.5) / h * np.pi
    d = np.stack([np.cos(phi) * np.cos(theta), np.sin(phi),
                  np.cos(phi) * np.sin(theta)], axis=-1)
    sd = np.asarray(sun_dir, np.float64)
    sd /= np.linalg.norm(sd)
    cos = np.clip(d @ sd, -1.0, 1.0)
    t = np.clip(d[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    sky = (1 - t) * np.array([0.35, 0.30, 0.25]) \
        + t * np.array([0.25, 0.45, 0.95])
    sun = np.where(cos > 0.9995, sun_radiance, 0.0)[..., None] \
        * np.array([1.0, 0.95, 0.85])
    return (sky + sun).astype(np.float32)


# ---------------------------------------------------------------- OBJ round-trip

def write_blob_obj(path: str | Path, subdiv: int = 6) -> Path:
    """Write the blob as OBJ+MTL (plastic body + emissive panel) so
    config 2 exercises the real OBJ/MTL loader path, not an in-memory
    shortcut."""
    path = Path(path)
    v, f = blob_mesh(subdiv)
    mtl = path.with_suffix(".mtl")
    mtl.write_text(
        "newmtl body\nKd 0.75 0.71 0.68\nNs 60\n\n"
        "newmtl panel\nKd 0 0 0\nKe 12 11 10\n")
    lines = [f"mtllib {mtl.name}"]
    lines += [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in v]
    # Emissive ceiling panel above the blob.
    n0 = v.shape[0]
    for x, y, z in [(-0.7, 2.2, -0.7), (0.7, 2.2, -0.7),
                    (0.7, 2.2, 0.7), (-0.7, 2.2, 0.7)]:
        lines.append(f"v {x} {y} {z}")
    lines.append("usemtl body")
    lines += [f"f {a + 1} {b + 1} {c + 1}" for a, b, c in f]
    lines.append("usemtl panel")
    lines.append(f"f {n0 + 1} {n0 + 2} {n0 + 3}")
    lines.append(f"f {n0 + 1} {n0 + 3} {n0 + 4}")
    path.write_text("\n".join(lines) + "\n")
    return path


# ---------------------------------------------------------------- scenes

def bunny_scene(tmpdir: str | Path, width: int = 256, height: int = 256,
                subdiv: int = 6):
    """BASELINE config 2 stand-in: ~82k-tri OBJ blob, diffuse/plastic +
    NEE area light, loaded through the OBJ+MTL path."""
    from nexus_tpu.io.loader import add_model

    obj = write_blob_obj(Path(tmpdir) / "blob.obj", subdiv)
    b = SceneBuilder()
    add_model(b, obj)
    b.set_camera(position=(0.0, 0.6, 3.2), look_at=(0.0, 0.0, 0.0),
                 hfov_deg=45.0, width=width, height=height)
    return b.build()


def glass_scene(width: int = 256, height: int = 256):
    """BASELINE config 3: the shipped glass cornell_box_sphere
    (dielectric ior 2.5 sphere + rough plastic walls, MIS)."""
    from nexus_tpu.io.loader import add_model

    b = SceneBuilder()
    add_model(b, "/root/reference/Nexus/assets/demo_scenes/"
                 "cornell_box_sphere/cornell_box_sphere.glb")
    b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                 hfov_deg=50.0, width=width, height=height)
    return b.build()


def instanced_env_scene(width: int = 1280, height: int = 720,
                        n_inst: int = 25, subdiv: int = 4):
    """BASELINE config 4 stand-in: a grid of instanced textured blobs
    under a procedural HDR sky (TLAS/BLAS + textures + env map, 720p)."""
    b = SceneBuilder()
    tex = b.add_texture(checker_texture(256))
    mats = [
        b.add_material(albedo=(1.0, 1.0, 1.0), diffuse_map=tex),
        b.add_material(mtype=3),                      # conductor
        b.add_material(mtype=2, albedo=(0.8, 0.3, 0.2), roughness=0.4),
    ]
    v, f = blob_mesh(subdiv)
    uv = sphere_uv(v)
    asset = b.add_mesh_asset(v, f, uvs=uv, name="blob")
    side = int(np.ceil(np.sqrt(n_inst)))
    rng = np.random.default_rng(3)
    for i in range(n_inst):
        gx, gz = i % side, i // side
        m = np.eye(4, dtype=np.float32)
        s = 0.35 + 0.25 * rng.random()
        m[0, 0] = m[1, 1] = m[2, 2] = s
        m[:3, 3] = [1.6 * (gx - (side - 1) / 2), s,
                    1.6 * (gz - (side - 1) / 2)]
        b.add_instance(asset, mats[i % len(mats)], m)
    # Ground plane asset.
    g = 0.5 * side * 1.6 + 2
    gv = np.array([[-g, 0, -g], [g, 0, -g], [g, 0, g], [-g, 0, g]],
                  np.float32)
    gf = np.array([[0, 1, 2], [0, 2, 3]])
    guv = np.array([[0, 0], [8, 0], [8, 8], [0, 8]], np.float32)
    ground = b.add_mesh_asset(gv, gf, uvs=guv, name="ground")
    b.add_instance(ground, mats[0], np.eye(4, dtype=np.float32))
    b.set_env_map(procedural_sky())
    b.set_camera(position=(0.0, 2.5, 0.5 * side * 1.6 + 3.0),
                 look_at=(0.0, 0.5, 0.0), hfov_deg=60.0,
                 width=width, height=height)
    return b.build_instanced()


def interior_scene(width: int = 1920, height: int = 1080,
                   target_tris: int = 1_000_000):
    """BASELINE config 5 stand-in: a closed room filled with displaced
    blobs totalling ~target_tris triangles, one area light (flat build —
    the wavefront 1080p multi-chip config)."""
    b = SceneBuilder()
    white = b.add_material(albedo=(0.73, 0.73, 0.73))
    accent = b.add_material(mtype=2, albedo=(0.65, 0.25, 0.2),
                            roughness=0.3)
    light = b.add_material(albedo=(0, 0, 0), emission=(1, 0.95, 0.85),
                           intensity=40.0)

    # Room: 5 quads (open front), 10 tris.
    R, H = 6.0, 4.0
    q = np.array([
        [-R, 0, -R], [R, 0, -R], [R, 0, R], [-R, 0, R],          # floor
        [-R, H, -R], [R, H, -R], [R, H, R], [-R, H, R]], np.float32)
    quads = [(0, 1, 2, 3), (4, 7, 6, 5), (0, 4, 5, 1), (1, 5, 6, 2),
             (3, 2, 6, 7)]
    faces = []
    for a, c, d, e in quads:
        faces += [[a, c, d], [a, d, e]]
    b.add_mesh(q, np.asarray(faces), white)
    # Ceiling light patch.
    lv = np.array([[-1.5, H - 0.01, -1.5], [1.5, H - 0.01, -1.5],
                   [1.5, H - 0.01, 1.5], [-1.5, H - 0.01, 1.5]],
                  np.float32)
    b.add_mesh(lv, np.array([[0, 2, 1], [0, 3, 2]]), light)

    # Fill with blobs until the budget is spent. subdiv 5 = 20480 tris.
    per = 20 * 4 ** 5
    n_obj = max((target_tris - 18) // per, 1)
    rng = np.random.default_rng(11)
    side = int(np.ceil(np.sqrt(n_obj)))
    for i in range(n_obj):
        v, f = blob_mesh(5, amp=0.22, seed=100 + i)
        s = 0.35 + 0.3 * rng.random()
        gx, gz = i % side, i // side
        pos = np.array([
            (gx + 0.5) / side * 2 * (R - 0.8) - (R - 0.8),
            s + 0.02,
            (gz + 0.5) / side * 2 * (R - 0.8) - (R - 0.8)])
        b.add_mesh(v * s + pos.astype(np.float32), f,
                   accent if i % 4 == 0 else white)
    b.set_camera(position=(0.0, 2.2, R - 0.4),
                 look_at=(0.0, 1.0, 0.0), hfov_deg=70.0,
                 width=width, height=height)
    return b.build()
