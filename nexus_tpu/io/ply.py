"""Stanford PLY loader (ascii + binary little/big endian).

The reference imports ply through Assimp (OBJLoader.cpp:219 uses the
same importer for every format; README.md:38 lists supported models).
This is a dependency-free parser covering the mesh subset: vertex
x/y/z (+nx/ny/nz, s/t or u/v) properties and face vertex_indices
lists, with fan triangulation of polygons.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


@dataclasses.dataclass
class PlyMesh:
    positions: np.ndarray          # (V, 3) float32
    faces: np.ndarray              # (F, 3) int64
    normals: np.ndarray | None     # (V, 3)
    uvs: np.ndarray | None         # (V, 2)


@dataclasses.dataclass
class _Element:
    name: str
    count: int
    props: list    # (name, dtype) or (name, "list", count_dtype, item_dtype)


def _parse_header(f):
    line = f.readline().decode("ascii", "replace").strip()
    if line != "ply":
        raise ValueError("not a PLY file")
    fmt = None
    elements: list[_Element] = []
    while True:
        line = f.readline().decode("ascii", "replace").strip()
        if not line or line.startswith("comment") or line.startswith("obj_info"):
            continue
        toks = line.split()
        if toks[0] == "format":
            fmt = toks[1]
        elif toks[0] == "element":
            elements.append(_Element(toks[1], int(toks[2]), []))
        elif toks[0] == "property":
            if toks[1] == "list":
                elements[-1].props.append(
                    (toks[4], "list", _DTYPES[toks[2]], _DTYPES[toks[3]]))
            else:
                elements[-1].props.append((toks[2], _DTYPES[toks[1]]))
        elif toks[0] == "end_header":
            break
    return fmt, elements


def _read_ascii(f, el):
    rows = []
    for _ in range(el.count):
        rows.append(f.readline().split())
    return rows


def load(path: str | Path) -> PlyMesh:
    with open(path, "rb") as f:
        fmt, elements = _parse_header(f)
        data: dict[str, dict] = {}
        for el in elements:
            if fmt == "ascii":
                rows = _read_ascii(f, el)
                cols: dict[str, list] = {p[0]: [] for p in el.props}
                for row in rows:
                    i = 0
                    for p in el.props:
                        if len(p) == 4:                  # list property
                            n = int(row[i]); i += 1
                            cols[p[0]].append(
                                [float(v) for v in row[i:i + n]])
                            i += n
                        else:
                            cols[p[0]].append(float(row[i])); i += 1
                data[el.name] = cols
            else:
                endian = "<" if "little" in fmt else ">"
                if all(len(p) == 2 for p in el.props):   # fixed stride
                    dt = np.dtype([(p[0], endian + p[1]) for p in el.props])
                    arr = np.frombuffer(f.read(dt.itemsize * el.count),
                                        dtype=dt, count=el.count)
                    data[el.name] = {p[0]: arr[p[0]] for p in el.props}
                else:                                    # has list props
                    cols = {p[0]: [] for p in el.props}
                    for _ in range(el.count):
                        for p in el.props:
                            if len(p) == 4:
                                cdt = np.dtype(endian + p[2])
                                n = int(np.frombuffer(f.read(cdt.itemsize),
                                                      cdt)[0])
                                idt = np.dtype(endian + p[3])
                                cols[p[0]].append(np.frombuffer(
                                    f.read(idt.itemsize * n), idt, n))
                            else:
                                idt = np.dtype(endian + p[1])
                                cols[p[0]].append(np.frombuffer(
                                    f.read(idt.itemsize), idt)[0])
                    data[el.name] = cols

    v = data["vertex"]
    positions = np.stack([np.asarray(v[c], np.float32)
                          for c in ("x", "y", "z")], axis=1)
    normals = None
    if all(c in v for c in ("nx", "ny", "nz")):
        normals = np.stack([np.asarray(v[c], np.float32)
                            for c in ("nx", "ny", "nz")], axis=1)
    uvs = None
    for ucol, vcol in (("s", "t"), ("u", "v"),
                       ("texture_u", "texture_v")):
        if ucol in v and vcol in v:
            uvs = np.stack([np.asarray(v[ucol], np.float32),
                            np.asarray(v[vcol], np.float32)], axis=1)
            break

    faces = []
    fcol = None
    fel = data.get("face", {})
    for name in ("vertex_indices", "vertex_index"):
        if name in fel:
            fcol = fel[name]
            break
    if fcol is not None:
        for poly in fcol:
            ids = [int(x) for x in poly]
            for k in range(1, len(ids) - 1):             # fan triangulation
                faces.append((ids[0], ids[k], ids[k + 1]))
    return PlyMesh(positions=positions,
                   faces=np.asarray(faces, np.int64).reshape(-1, 3),
                   normals=normals, uvs=uvs)
