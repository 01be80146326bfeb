"""Minimal Wavefront OBJ loader (positions / normals / texcoords / faces).

Covers the subset the benchmarks need (e.g. Stanford bunny — BASELINE
config 2): v / vn / vt / f records with triangulation of polygon faces
(fan). The reference delegates this to Assimp (OBJLoader.cpp:219,
aiProcess_Triangulate); here it is a dependency-free parser.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class ObjMesh:
    positions: np.ndarray          # (V, 3)
    faces: np.ndarray              # (F, 3) indices into positions
    normals: np.ndarray | None     # (V, 3) aligned with positions
    uvs: np.ndarray | None         # (V, 2)


def load(path: str | Path) -> ObjMesh:
    positions, normals, uvs = [], [], []
    # OBJ indexes v/vt/vn independently; we re-index to a single vertex
    # stream keyed by the (v, vt, vn) triple.
    vert_map: dict = {}
    out_pos, out_n, out_uv, faces = [], [], [], []
    has_n = has_uv = False

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
            elif line.startswith("f "):
                toks = line.split()[1:]
                ids = [vertex(t) for t in toks]
                for k in range(1, len(ids) - 1):     # fan triangulation
                    faces.append((ids[0], ids[k], ids[k + 1]))

    return ObjMesh(
        positions=np.asarray(out_pos, np.float32),
        faces=np.asarray(faces, np.int64),
        normals=np.asarray(out_n, np.float32) if has_n else None,
        uvs=np.asarray(out_uv, np.float32) if has_uv else None)
