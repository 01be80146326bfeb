"""Minimal binary-FBX static-mesh reader.

Closes the last importer-breadth gap vs the reference, which reads
fbx through Assimp (/root/reference/README.md:38,
Nexus/src/Assets/OBJLoader.cpp:219): this build links no native
importer, so here is a from-scratch parser for the documented parts of
the Kaydara binary FBX container (versions 7100-7700):

  - node-record tree (32-bit offsets < 7500, 64-bit >= 7500), typed
    properties incl. zlib-compressed arrays;
  - Objects/Geometry: control points, polygon-vertex indices (negative
    index = ~i marks polygon end; polygons are fan-triangulated),
    LayerElementNormal / LayerElementUV with ByPolygonVertex (Direct /
    IndexToDirect) and ByControlPoint mappings;
  - Objects/Model local TRS (Lcl Translation / Rotation / Scaling,
    euler XYZ) + OO Connections, composed through the model parent
    chain into one world transform per geometry.

Deliberately out of scope (documented): materials/textures (geometries
get the caller's default material), animation, units (coordinates are
imported in file units), non-XYZ rotation orders, ASCII FBX — the
fail-fast path in io/loader.py still points at glTF conversion for
files beyond this subset.
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from pathlib import Path

import numpy as np

_MAGIC = b"Kaydara FBX Binary  \x00\x1a\x00"


@dataclasses.dataclass
class FbxMesh:
    """One geometry instance, world-transformed attributes per vertex."""
    positions: np.ndarray          # (V, 3) float32 (file units)
    faces: np.ndarray              # (F, 3) int64
    normals: np.ndarray | None     # (V, 3) float32
    uvs: np.ndarray | None         # (V, 2) float32
    transform: np.ndarray          # (4, 4) float32 model->world
    name: str


class _Node:
    __slots__ = ("name", "props", "children")

    def __init__(self, name, props, children):
        self.name = name
        self.props = props
        self.children = children

    def child(self, name):
        for c in self.children:
            if c.name == name:
                return c
        return None

    def all(self, name):
        return [c for c in self.children if c.name == name]


_ARRAY_DTYPES = {b"f": np.float32, b"d": np.float64,
                 b"i": np.int32, b"l": np.int64}
_SCALARS = {b"Y": ("<h", 2), b"C": ("<B", 1), b"I": ("<i", 4),
            b"F": ("<f", 4), b"D": ("<d", 8), b"L": ("<q", 8)}


def _read_prop(buf, pos):
    t = buf[pos:pos + 1]
    pos += 1
    if t in _SCALARS:
        fmt, sz = _SCALARS[t]
        (v,) = struct.unpack_from(fmt, buf, pos)
        return (bool(v) if t == b"C" else v), pos + sz
    if t in _ARRAY_DTYPES:
        n, enc, clen = struct.unpack_from("<III", buf, pos)
        pos += 12
        raw = bytes(buf[pos:pos + clen])
        pos += clen
        if enc == 1:
            raw = zlib.decompress(raw)
        return np.frombuffer(raw, _ARRAY_DTYPES[t], count=n), pos
    if t in (b"S", b"R"):
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        raw = bytes(buf[pos:pos + n])
        pos += n
        return (raw.decode("utf-8", "replace") if t == b"S" else raw), pos
    raise ValueError(f"unknown FBX property type {t!r} at {pos - 1}")


def _read_node(buf, pos, wide):
    """One node record; returns (node | None, next_pos). None = the
    null sentinel that terminates a child list."""
    if wide:
        end, nprops, _plen = struct.unpack_from("<QQQ", buf, pos)
        pos += 24
    else:
        end, nprops, _plen = struct.unpack_from("<III", buf, pos)
        pos += 12
    nlen = buf[pos]
    pos += 1
    name = bytes(buf[pos:pos + nlen]).decode("ascii", "replace")
    pos += nlen
    if end == 0 and nprops == 0 and nlen == 0:
        return None, pos
    props = []
    for _ in range(nprops):
        v, pos = _read_prop(buf, pos)
        props.append(v)
    children = []
    while pos < end:
        child, pos = _read_node(buf, pos, wide)
        if child is None:
            break
        children.append(child)
    return _Node(name, props, children), end


def _parse(buf):
    if bytes(buf[:len(_MAGIC)]) != _MAGIC:
        raise ValueError("not a binary FBX file (ASCII FBX and other "
                         "containers are unsupported — convert to glTF)")
    (version,) = struct.unpack_from("<I", buf, len(_MAGIC))
    wide = version >= 7500
    pos = len(_MAGIC) + 4
    roots = []
    while pos < len(buf):
        node, pos = _read_node(buf, pos, wide)
        if node is None:   # footer begins after the top-level null rec
            break
        roots.append(node)
    return _Node("", [], roots), version


def _euler_xyz(rx, ry, rz):
    rx, ry, rz = np.deg2rad([rx, ry, rz])
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return mz @ my @ mx      # eEulerXYZ: X applied first


def _model_local(model: _Node) -> np.ndarray:
    t = np.zeros(3)
    r = np.zeros(3)
    s = np.ones(3)
    p70 = model.child("Properties70")
    for p in (p70.all("P") if p70 else []):
        key = p.props[0] if p.props else ""
        vals = [v for v in p.props[4:7] if isinstance(v, (int, float))]
        if len(vals) != 3:
            continue
        if key == "Lcl Translation":
            t = np.array(vals, np.float64)
        elif key == "Lcl Rotation":
            r = np.array(vals, np.float64)
        elif key == "Lcl Scaling":
            s = np.array(vals, np.float64)
    m = np.eye(4)
    m[:3, :3] = _euler_xyz(*r) * s
    m[:3, 3] = t
    return m


def _layer_values(layer: _Node, data_name, index_name, pvi_corners,
                  ncomp):
    """LayerElement* -> per-CORNER (len(pvi_corners), ncomp) values, or
    per-CONTROL-POINT array (flagged by the second return)."""
    data = layer.child(data_name)
    if data is None or not len(data.props):
        return None, False
    vals = np.asarray(data.props[0], np.float64).reshape(-1, ncomp)
    mapping = (layer.child("MappingInformationType") or
               _Node("", [""], [])).props[0]
    ref = (layer.child("ReferenceInformationType") or
           _Node("", ["Direct"], [])).props[0]
    if ref == "IndexToDirect":
        idx_node = layer.child(index_name)
        if idx_node is not None and len(idx_node.props):
            vals = vals[np.asarray(idx_node.props[0], np.int64)]
    if mapping in ("ByPolygonVertex", "ByPolygon"):
        if mapping == "ByPolygon":
            return None, False    # unsupported granularity: skip attr
        return vals[pvi_corners], False
    if mapping in ("ByVertice", "ByVertex", "ByControlPoint"):
        return vals, True
    return None, False


def _triangulate(pvi):
    """PolygonVertexIndex -> (tri control-point ids (F,3),
    tri corner positions in pvi (F,3))."""
    tris, corners = [], []
    poly, poly_c = [], []
    for c, idx in enumerate(pvi):
        last = idx < 0
        poly.append(~int(idx) if last else int(idx))
        poly_c.append(c)
        if last:
            for k in range(1, len(poly) - 1):
                tris.append((poly[0], poly[k], poly[k + 1]))
                corners.append((poly_c[0], poly_c[k], poly_c[k + 1]))
            poly, poly_c = [], []
    return (np.asarray(tris, np.int64).reshape(-1, 3),
            np.asarray(corners, np.int64).reshape(-1, 3))


def load(path: str | Path) -> list[FbxMesh]:
    """Parse a binary FBX file into a list of world-placed meshes."""
    buf = memoryview(Path(path).read_bytes())
    root, _version = _parse(buf)
    objects = root.child("Objects")
    if objects is None:
        return []

    # Connections: child id -> parent id ("OO" object-object links).
    parents: dict[int, list[int]] = {}
    conns = root.child("Connections")
    for c in (conns.all("C") if conns else []):
        if len(c.props) >= 3 and c.props[0] == "OO":
            parents.setdefault(int(c.props[1]), []).append(int(c.props[2]))

    models: dict[int, _Node] = {}
    for m in objects.all("Model"):
        if m.props and isinstance(m.props[0], int):
            models[int(m.props[0])] = m

    def world_of(model_id, depth=0):
        if depth > 64 or model_id not in models:
            return np.eye(4)
        local = _model_local(models[model_id])
        for pid in parents.get(model_id, []):
            if pid in models:
                return world_of(pid, depth + 1) @ local
        return local

    meshes = []
    for g in objects.all("Geometry"):
        verts_n = g.child("Vertices")
        pvi_n = g.child("PolygonVertexIndex")
        if verts_n is None or pvi_n is None:
            continue
        cps = np.asarray(verts_n.props[0], np.float64).reshape(-1, 3)
        pvi = np.asarray(pvi_n.props[0], np.int64)
        tris, tri_corners = _triangulate(pvi)

        flat_corners = tri_corners.reshape(-1)
        nrm = uv = None
        nrm_per_cp = uv_per_cp = False
        ln = g.child("LayerElementNormal")
        if ln is not None:
            nrm, nrm_per_cp = _layer_values(
                ln, "Normals", "NormalsIndex", flat_corners, 3)
        lu = g.child("LayerElementUV")
        if lu is not None:
            uv, uv_per_cp = _layer_values(
                lu, "UV", "UVIndex", flat_corners, 2)

        gid = int(g.props[0]) if g.props and isinstance(g.props[0], int) \
            else -1
        name = ""
        if len(g.props) > 1 and isinstance(g.props[1], str):
            name = g.props[1].split("\x00")[0]
        xf = np.eye(4)
        for pid in parents.get(gid, []):
            if pid in models:
                xf = world_of(pid)
                nm = models[pid].props   # prefer the MODEL's name (the
                #                          user-visible node name)
                if len(nm) > 1 and isinstance(nm[1], str) \
                        and nm[1].split("\x00")[0]:
                    name = nm[1].split("\x00")[0]
                break

        percorner = ((nrm is not None and not nrm_per_cp)
                     or (uv is not None and not uv_per_cp))
        if percorner:
            # Per-corner attributes: expand to unindexed triangles so
            # every vertex carries its own normal/uv.
            pos = cps[tris.reshape(-1)]
            faces = np.arange(pos.shape[0], dtype=np.int64).reshape(-1, 3)
            if nrm is not None and nrm_per_cp:
                nrm = nrm[tris.reshape(-1)]
            if uv is not None and uv_per_cp:
                uv = uv[tris.reshape(-1)]
        else:
            pos, faces = cps, tris
        meshes.append(FbxMesh(
            positions=np.ascontiguousarray(pos, np.float32).reshape(-1, 3),
            faces=faces,
            normals=(None if nrm is None else
                     np.ascontiguousarray(nrm, np.float32).reshape(-1, 3)),
            uvs=(None if uv is None else
                 np.ascontiguousarray(uv, np.float32).reshape(-1, 2)),
            transform=xf.astype(np.float32),
            name=name or f"geometry{gid}"))
    return meshes
