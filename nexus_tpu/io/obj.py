"""Wavefront OBJ + MTL loader (positions / normals / texcoords / faces /
materials).

Covers the subset the benchmarks need (e.g. Stanford bunny — BASELINE
config 2) plus authored OBJ scenes: v / vn / vt / f records with fan
triangulation, `mtllib`/`usemtl` material groups, and an MTL parser for
the fields the reference's Assimp import consumes
(Nexus/src/Assets/OBJLoader.cpp:71-163): Kd, Ke, d/Tr, Ni, Ns, illum,
map_Kd, map_Ke. The reference delegates parsing to Assimp
(OBJLoader.cpp:219, aiProcess_Triangulate); here it is a
dependency-free parser.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class ObjMaterial:
    """Raw MTL record (untranslated — conversion heuristics live in
    io/loader.py so they sit next to the other format conversions)."""
    name: str
    kd: tuple = (0.8, 0.8, 0.8)         # diffuse color
    ke: tuple = (0.0, 0.0, 0.0)         # emissive color
    ni: float = 1.45                    # index of refraction
    ns: float | None = None             # shininess (None = unspecified)
    d: float = 1.0                      # opacity (Tr = 1 - d)
    illum: int = 2                      # illumination model
    map_kd: str | None = None           # diffuse texture path
    map_ke: str | None = None           # emissive texture path


@dataclasses.dataclass
class ObjMesh:
    positions: np.ndarray          # (V, 3)
    faces: np.ndarray              # (F, 3) indices into positions
    normals: np.ndarray | None     # (V, 3) aligned with positions
    uvs: np.ndarray | None         # (V, 2)
    face_material: np.ndarray | None = None  # (F,) index into materials
    materials: list[ObjMaterial] = dataclasses.field(default_factory=list)


def _parse_mtl(path: Path) -> list[ObjMaterial]:
    """Parse one .mtl file into raw records (missing file → empty)."""
    mats: list[ObjMaterial] = []
    if not path.exists():
        return mats
    cur: ObjMaterial | None = None
    for line in path.read_text(errors="replace").splitlines():
        toks = line.split()
        if not toks or toks[0].startswith("#"):
            continue
        key = toks[0]
        try:
            if key == "newmtl":
                cur = ObjMaterial(name=" ".join(toks[1:]) or "unnamed")
                mats.append(cur)
            elif cur is None:
                continue
            elif key == "Kd":
                cur.kd = tuple(float(v) for v in toks[1:4])
            elif key == "Ke":
                cur.ke = tuple(float(v) for v in toks[1:4])
            elif key == "Ni":
                cur.ni = float(toks[1])
            elif key == "Ns":
                cur.ns = float(toks[1])
            elif key == "d":
                cur.d = float(toks[1])
            elif key == "Tr":                      # Tr = 1 - d
                cur.d = 1.0 - float(toks[1])
            elif key == "illum":
                cur.illum = int(float(toks[1]))
            elif key == "map_Kd":
                cur.map_kd = toks[-1]
            elif key == "map_Ke":
                cur.map_ke = toks[-1]
        except (ValueError, IndexError):
            continue                                # tolerate malformed lines
    return mats


def load(path: str | Path) -> ObjMesh:
    path = Path(path)
    positions, normals, uvs = [], [], []
    # OBJ indexes v/vt/vn independently; we re-index to a single vertex
    # stream keyed by the (v, vt, vn) triple.
    vert_map: dict = {}
    out_pos, out_n, out_uv, faces = [], [], [], []
    face_mat: list[int] = []
    has_n = has_uv = False
    materials: list[ObjMaterial] = []
    mat_index: dict[str, int] = {}
    cur_mat = -1                       # -1 = no usemtl seen (default mat)

    def vertex(token: str) -> int:
        nonlocal has_n, has_uv
        if token in vert_map:
            return vert_map[token]
        parts = token.split("/")
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(positions) + vi
        ti = ni = None
        if len(parts) > 1 and parts[1]:
            ti = int(parts[1]); ti = ti - 1 if ti > 0 else len(uvs) + ti
        if len(parts) > 2 and parts[2]:
            ni = int(parts[2]); ni = ni - 1 if ni > 0 else len(normals) + ni
        idx = len(out_pos)
        out_pos.append(positions[vi])
        out_uv.append(uvs[ti] if ti is not None else (0.0, 0.0))
        out_n.append(normals[ni] if ni is not None else (0.0, 0.0, 0.0))
        if ti is not None:
            has_uv = True
        if ni is not None:
            has_n = True
        vert_map[token] = idx
        return idx

    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                positions.append(tuple(map(float, line.split()[1:4])))
            elif line.startswith("vn "):
                normals.append(tuple(map(float, line.split()[1:4])))
            elif line.startswith("vt "):
                uvs.append(tuple(map(float, line.split()[1:3])))
            elif line.startswith("mtllib"):
                lib = " ".join(line.split()[1:])
                for m in _parse_mtl(path.parent / lib):
                    if m.name not in mat_index:
                        mat_index[m.name] = len(materials)
                        materials.append(m)
            elif line.startswith("usemtl"):
                name = " ".join(line.split()[1:])
                cur_mat = mat_index.get(name, -1)
            elif line.startswith("f "):
                toks = line.split()[1:]
                ids = [vertex(t) for t in toks]
                for k in range(1, len(ids) - 1):     # fan triangulation
                    faces.append((ids[0], ids[k], ids[k + 1]))
                    face_mat.append(cur_mat)

    return ObjMesh(
        positions=np.asarray(out_pos, np.float32),
        faces=np.asarray(faces, np.int64),
        normals=np.asarray(out_n, np.float32) if has_n else None,
        uvs=np.asarray(out_uv, np.float32) if has_uv else None,
        face_material=np.asarray(face_mat, np.int32),
        materials=materials)
