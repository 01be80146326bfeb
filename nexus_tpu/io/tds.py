"""Autodesk 3DS (.3ds) reader — chunked binary static meshes + materials.

The reference reads .3ds through Assimp (/root/reference/README.md:38,
Nexus/src/Assets/OBJLoader.cpp:219); this is a dependency-free parser
for the classic 3D Studio chunk format:

  0x4D4D main → 0x3D3D editor →
    0x4000 named object → 0x4100 trimesh →
      0x4110 vertex list  (u16 count, count×3 f32)
      0x4120 face list    (u16 count, count×4 u16: a b c flags) with
             0x4130 per-material face groups (asciiz name, u16 n, n×u16)
      0x4140 mapping coords (u16 count, count×2 f32)
    0xAFFF material → 0xA000 name, 0xA020 diffuse (color subchunk
      0x0010 f32 rgb / 0x0011 u8 rgb / 0x0012-0x0013 gamma variants),
      0xA040 shininess / 0xA050 transparency (percent subchunks 0x0030
      u16 / 0x0031 f32), 0xA200 texture map → 0xA300 filename.

Every chunk is (u16 id, u32 length-incl-header) little-endian; unknown
chunks are skipped by length, so files with keyframer data (0xB000),
lights, or cameras load their geometry cleanly. 3DS stores meshes in a
Z-up world; coordinates are converted to the renderer's Y-up
((x, y, z) → (x, z, -y)) — a proper rotation (det = +1), so face
winding is preserved as-is, no index rewind needed. The
per-mesh 0x4160 local-axis chunk is pivot metadata (vertices are stored
already transformed) and is ignored, which matches how flat importers
treat it. 3DS has no normals — the scene builder's geometric-normal
fallback covers that (scene/scene.py add_mesh).
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class TdsMaterial:
    name: str
    diffuse: tuple = (0.8, 0.8, 0.8)
    shininess: float | None = None       # 0-1 (3DS stores percent)
    opacity: float = 1.0
    map_kd: str | None = None


@dataclasses.dataclass
class TdsMesh:
    positions: np.ndarray                # (V, 3) float32, Y-up
    faces: np.ndarray                    # (F, 3) int64
    uvs: np.ndarray | None               # (V, 2) float32
    face_material: np.ndarray | None     # (F,) int32 into materials, -1
    name: str


def _cstr(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("latin-1"), end + 1


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_end) inside [pos, end)."""
    while pos + 6 <= end:
        cid, length = struct.unpack_from("<HI", buf, pos)
        if length < 6 or pos + length > end:
            break                          # malformed tail: stop cleanly
        yield cid, pos + 6, pos + length
        pos += length


def _color(buf: bytes, pos: int, end: int) -> tuple:
    for cid, s, e in _chunks(buf, pos, end):
        if cid in (0x0010, 0x0013):        # f32 rgb (linear / gamma)
            return struct.unpack_from("<3f", buf, s)
        if cid in (0x0011, 0x0012):        # u8 rgb
            r, g, b = struct.unpack_from("<3B", buf, s)
            return (r / 255.0, g / 255.0, b / 255.0)
    return (0.8, 0.8, 0.8)


def _percent(buf: bytes, pos: int, end: int) -> float:
    for cid, s, e in _chunks(buf, pos, end):
        if cid == 0x0030:
            return struct.unpack_from("<H", buf, s)[0] / 100.0
        if cid == 0x0031:
            return struct.unpack_from("<f", buf, s)[0] / 100.0
    return 0.0


def _material(buf: bytes, pos: int, end: int) -> TdsMaterial:
    mat = TdsMaterial(name="material")
    for cid, s, e in _chunks(buf, pos, end):
        if cid == 0xA000:
            mat.name, _ = _cstr(buf, s)
        elif cid == 0xA020:
            mat.diffuse = tuple(float(c) for c in _color(buf, s, e))
        elif cid == 0xA040:
            mat.shininess = _percent(buf, s, e)
        elif cid == 0xA050:
            mat.opacity = 1.0 - _percent(buf, s, e)
        elif cid == 0xA200:
            for c2, s2, e2 in _chunks(buf, s, e):
                if c2 == 0xA300:
                    mat.map_kd, _ = _cstr(buf, s2)
    return mat


def _trimesh(buf: bytes, pos: int, end: int, name: str,
             mat_index: dict[str, int]) -> TdsMesh | None:
    verts = faces = uvs = None
    groups: list[tuple[str, np.ndarray]] = []
    for cid, s, e in _chunks(buf, pos, end):
        if cid == 0x4110:
            (n,) = struct.unpack_from("<H", buf, s)
            verts = np.frombuffer(buf, "<f4", n * 3, s + 2).reshape(n, 3)
        elif cid == 0x4120:
            (n,) = struct.unpack_from("<H", buf, s)
            raw = np.frombuffer(buf, "<u2", n * 4, s + 2).reshape(n, 4)
            faces = raw[:, :3].astype(np.int64)
            gpos = s + 2 + n * 8
            for c2, s2, e2 in _chunks(buf, gpos, e):
                if c2 == 0x4130:
                    mname, p2 = _cstr(buf, s2)
                    (fn,) = struct.unpack_from("<H", buf, p2)
                    ids = np.frombuffer(buf, "<u2", fn, p2 + 2)
                    groups.append((mname, ids.astype(np.int64)))
        elif cid == 0x4140:
            (n,) = struct.unpack_from("<H", buf, s)
            uvs = np.frombuffer(buf, "<f4", n * 2, s + 2).reshape(n, 2)
    if verts is None or faces is None or len(faces) == 0:
        return None
    # Z-up → Y-up; the reflection-free rotation keeps face winding.
    pos_yup = np.stack([verts[:, 0], verts[:, 2], -verts[:, 1]],
                       axis=1).astype(np.float32)
    fm = np.full(len(faces), -1, np.int32)
    for mname, ids in groups:
        if mname in mat_index:
            fm[ids[ids < len(faces)]] = mat_index[mname]
    return TdsMesh(positions=pos_yup, faces=faces,
                   uvs=uvs.astype(np.float32) if uvs is not None else None,
                   face_material=fm if len(groups) else None, name=name)


def load(path: str | Path) -> tuple[list[TdsMesh], list[TdsMaterial]]:
    """Parse a .3ds file → (meshes, materials)."""
    buf = Path(path).read_bytes()
    if len(buf) < 6 or struct.unpack_from("<H", buf, 0)[0] != 0x4D4D:
        raise ValueError(f"{Path(path).name}: not a 3DS file "
                         "(missing 0x4D4D main chunk)")
    meshes: list[TdsMesh] = []
    materials: list[TdsMaterial] = []
    mat_index: dict[str, int] = {}
    # Two passes so material groups resolve regardless of chunk order.
    for pass_mats in (True, False):
        for cid, s, e in _chunks(buf, 0, len(buf)):
            if cid != 0x4D4D:
                continue
            for c2, s2, e2 in _chunks(buf, s, e):
                if c2 != 0x3D3D:
                    continue
                for c3, s3, e3 in _chunks(buf, s2, e2):
                    if pass_mats and c3 == 0xAFFF:
                        m = _material(buf, s3, e3)
                        if m.name not in mat_index:
                            mat_index[m.name] = len(materials)
                            materials.append(m)
                    elif not pass_mats and c3 == 0x4000:
                        name, p = _cstr(buf, s3)
                        for c4, s4, e4 in _chunks(buf, p, e3):
                            if c4 == 0x4100:
                                m = _trimesh(buf, s4, e4, name, mat_index)
                                if m is not None:
                                    meshes.append(m)
    return meshes, materials
