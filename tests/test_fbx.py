"""Binary-FBX importer (io/fbx.py): round-trip against a minimal
in-test FBX writer (no .fbx assets exist in this environment, so the
test constructs spec-conformant binary files: node records with 32- and
64-bit offsets, typed properties, zlib-compressed arrays, polygon
triangulation, ByPolygonVertex/ByControlPoint attribute mappings, and
model transforms through OO connections)."""

import struct
import zlib

import numpy as np
import pytest

from nexus_tpu.io import fbx

MAGIC = b"Kaydara FBX Binary  \x00\x1a\x00"


def _prop(v, compress=False):
    if isinstance(v, str):
        b = v.encode()
        return b"S" + struct.pack("<I", len(b)) + b
    if isinstance(v, bool):
        return b"C" + struct.pack("<B", int(v))
    if isinstance(v, int):
        return b"L" + struct.pack("<q", v)
    if isinstance(v, float):
        return b"D" + struct.pack("<d", v)
    if isinstance(v, np.ndarray):
        code = {np.dtype(np.float64): b"d", np.dtype(np.float32): b"f",
                np.dtype(np.int32): b"i", np.dtype(np.int64): b"l"}[v.dtype]
        raw = v.tobytes()
        data = zlib.compress(raw) if compress else raw
        return code + struct.pack("<III", v.size, 1 if compress else 0,
                                  len(data)) + data
    raise TypeError(type(v))


def _ser(node, offset, wide, compress):
    name, props, children = node
    pb = b"".join(_prop(p, compress) for p in props)
    hsz = (24 if wide else 12) + 1 + len(name)
    child_bytes = b""
    if children:
        off = offset + hsz + len(pb)
        for c in children:
            cb = _ser(c, off, wide, compress)
            child_bytes += cb
            off += len(cb)
        child_bytes += b"\x00" * (25 if wide else 13)
    end = offset + hsz + len(pb) + len(child_bytes)
    hdr = struct.pack("<QQQ" if wide else "<III",
                      end, len(props), len(pb))
    hdr += bytes([len(name)]) + name.encode()
    return hdr + pb + child_bytes


def write_fbx(path, roots, version=7400, compress=False):
    wide = version >= 7500
    out = MAGIC + struct.pack("<I", version)
    off = len(out)
    for r in roots:
        b = _ser(r, off, wide, compress)
        out += b
        off += len(b)
    out += b"\x00" * (25 if wide else 13)   # top-level terminator
    path.write_bytes(out)


def _cube_fbx(tmp_path, version=7400, compress=False,
              normals_mapping="ByPolygonVertex", with_uv=True,
              name="cube.fbx"):
    """One cube of 6 quads, translated by (1, 2, 3) via its Model."""
    cp = np.array([[x, y, z] for z in (-1, 1) for y in (-1, 1)
                   for x in (-1, 1)], np.float64)  # 8 control points
    # Outward-wound quads + their face normals (what real exporters
    # write: flat-shaded cubes carry per-corner FACE normals).
    quads = [((0, 2, 3, 1), (0, 0, -1)), ((4, 5, 7, 6), (0, 0, 1)),
             ((0, 1, 5, 4), (0, -1, 0)), ((2, 6, 7, 3), (0, 1, 0)),
             ((0, 4, 6, 2), (-1, 0, 0)), ((1, 3, 7, 5), (1, 0, 0))]
    pvi = []
    face_n = []
    for q, fn in quads:
        pvi += [q[0], q[1], q[2], ~q[3]]
        face_n += [fn] * 4
    pvi = np.asarray(pvi, np.int32)
    if normals_mapping == "ByPolygonVertex":
        nrm = np.asarray(face_n, np.float64)
        nrm_children = [("Normals", [nrm.reshape(-1)], []),
                        ("MappingInformationType", ["ByPolygonVertex"], []),
                        ("ReferenceInformationType", ["Direct"], [])]
    else:   # ByControlPoint
        nrm = cp / np.linalg.norm(cp, axis=1, keepdims=True)
        nrm_children = [("Normals", [nrm.reshape(-1)], []),
                        ("MappingInformationType", ["ByControlPoint"], []),
                        ("ReferenceInformationType", ["Direct"], [])]
    geo_children = [("Vertices", [cp.reshape(-1)], []),
                    ("PolygonVertexIndex", [pvi], []),
                    ("LayerElementNormal", [0], nrm_children)]
    if with_uv:
        uv_vals = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0],
                            [0.0, 1.0]], np.float64)
        uv_idx = np.asarray(list(range(4)) * 6, np.int32)
        geo_children.append(("LayerElementUV", [0], [
            ("UV", [uv_vals.reshape(-1)], []),
            ("UVIndex", [uv_idx], []),
            ("MappingInformationType", ["ByPolygonVertex"], []),
            ("ReferenceInformationType", ["IndexToDirect"], [])]))
    objects = ("Objects", [], [
        ("Geometry", [1001, "cubegeo\x00\x01Geometry", "Mesh"],
         geo_children),
        ("Model", [2001, "cube\x00\x01Model", "Mesh"], [
            ("Properties70", [], [
                ("P", ["Lcl Translation", "Lcl Translation", "", "A",
                       1.0, 2.0, 3.0], []),
                ("P", ["Lcl Scaling", "Lcl Scaling", "", "A",
                       2.0, 2.0, 2.0], []),
            ])]),
    ])
    conns = ("Connections", [], [
        ("C", ["OO", 1001, 2001], []),     # geometry -> model
        ("C", ["OO", 2001, 0], []),        # model -> root
    ])
    p = tmp_path / name
    write_fbx(p, [objects, conns], version=version, compress=compress)
    return p, cp


@pytest.mark.parametrize("version,compress",
                         [(7400, False), (7400, True), (7500, True)])
def test_cube_roundtrip(tmp_path, version, compress):
    p, cp = _cube_fbx(tmp_path, version=version, compress=compress)
    meshes = fbx.load(p)
    assert len(meshes) == 1
    m = meshes[0]
    assert m.faces.shape == (12, 3)          # 6 quads fan-triangulated
    assert m.name == "cube"
    # ByPolygonVertex normals force per-corner expansion: 24 quad
    # corners -> 36 triangle corners.
    assert m.positions.shape == (36, 3)
    assert m.normals.shape == (36, 3)
    assert m.uvs.shape == (36, 2)
    # Transform: scale 2 then translate (1,2,3).
    xf = m.transform
    np.testing.assert_allclose(xf[:3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(xf[:3, :3], np.eye(3) * 2, atol=1e-6)
    # All positions are cube control points.
    d = np.abs(m.positions[:, None, :] - cp[None]).sum(-1).min(1)
    assert d.max() < 1e-6


def test_bycontrolpoint_keeps_indexing(tmp_path):
    p, cp = _cube_fbx(tmp_path, normals_mapping="ByControlPoint",
                      with_uv=False)
    m = fbx.load(p)[0]
    assert m.positions.shape == (8, 3)       # indexed, not expanded
    assert m.faces.shape == (12, 3)
    assert m.normals.shape == (8, 3)
    np.testing.assert_allclose(
        np.linalg.norm(m.normals, axis=1), 1.0, atol=1e-5)


def test_loader_integration(tmp_path):
    from nexus_tpu.io.loader import add_model
    from nexus_tpu.scene.scene import SceneBuilder

    p, _cp = _cube_fbx(tmp_path)
    b = SceneBuilder()
    ids = add_model(b, p)
    assert len(ids) == 1
    b.set_camera(position=(1, 2, 12), look_at=(1, 2, 3), hfov_deg=45,
                 width=16, height=16)
    scene = b.build()
    assert scene.tri_count == 12
    # World verts carry the model transform: center == translation.
    v = np.concatenate([np.asarray(scene.bvh.v0),
                        np.asarray(scene.bvh.v1),
                        np.asarray(scene.bvh.v2)])
    np.testing.assert_allclose(v.mean(axis=0), [1, 2, 3], atol=1e-5)
    assert v.min(axis=0).tolist() == [-1.0, 0.0, 1.0]  # +-2 around T


def test_fail_fast_message_lists_supported_formats(tmp_path):
    """The unsupported-format error names the supported set and the
    conversion path (VERDICT r4 #9)."""
    from nexus_tpu.io.loader import add_model
    from nexus_tpu.scene.scene import SceneBuilder

    bad = tmp_path / "model.blend"
    bad.write_bytes(b"whatever")
    with pytest.raises(ValueError) as e:
        add_model(SceneBuilder(), bad)
    msg = str(e.value)
    for tok in (".glb", ".obj", ".ply", ".fbx", "glTF"):
        assert tok in msg


def test_ascii_fbx_fails_fast(tmp_path):
    p = tmp_path / "a.fbx"
    p.write_bytes(b"; FBX 7.4.0 project file\nFBXHeaderExtension: {}\n")
    with pytest.raises(ValueError, match="binary FBX"):
        fbx.load(p)
