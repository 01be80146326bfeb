"""GLB / glTF 2.0 loader (from scratch: json + struct + numpy).

Replaces the reference's Assimp import path
(Nexus/src/Assets/OBJLoader.cpp:213-239) for glTF/GLB scenes — the format
its demo assets ship in. No third-party glTF library (none is available
in this environment); the subset implemented covers what the renderer
consumes: buffer views w/ strides, accessors (f32/u8/u16/u32 scalars &
vecs), mesh primitives (POSITION/NORMAL/TEXCOORD_0 + indices), node
hierarchies with TRS or matrix transforms, materials, embedded images.

Material conversion mirrors CreateMaterialsFromAiScene
(Nexus/src/Assets/OBJLoader.cpp:71-163):
  - default type PLASTIC, albedo = base color          (cpp:79-83)
  - transmissionFactor > 0 → DIELECTRIC                (cpp:97-102)
  - ior from KHR_materials_ior, default 1.45           (cpp:104-106)
  - emissive color × KHR_materials_emissive_strength   (cpp:85-91)
  - roughness: we read glTF roughnessFactor directly instead of the
    reference's shininess→roughness roundtrip (cpp:108-113) — same
    quantity, minus assimp's lossy conversion.
  - metallicFactor > 0.5 → CONDUCTOR (our addition: the reference's
    conductor path is disabled, SURVEY.md §8.1, so assimp demoting
    metals to plastic was harmless there).
"""

from __future__ import annotations

import dataclasses
import json
import struct
from pathlib import Path

import numpy as np

from nexus_tpu.scene.materials import CONDUCTOR, DIELECTRIC, PLASTIC

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_SIZES = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
               "MAT4": 16}


@dataclasses.dataclass
class GltfPrimitive:
    positions: np.ndarray          # (V, 3) f32
    faces: np.ndarray              # (F, 3) int64
    normals: np.ndarray | None     # (V, 3) f32
    uvs: np.ndarray | None         # (V, 2) f32
    material: int                  # index into GltfScene.materials


@dataclasses.dataclass
class GltfMaterial:
    name: str
    mtype: int
    albedo: tuple
    roughness: float
    ior: float
    emission: tuple
    intensity: float
    opacity: float
    base_color_image: int = -1     # index into GltfScene.images
    emissive_image: int = -1


@dataclasses.dataclass
class GltfInstance:
    """A flattened scene-graph node: world transform + mesh primitives."""
    name: str
    transform: np.ndarray          # (4, 4) world matrix
    primitives: list


@dataclasses.dataclass
class GltfScene:
    materials: list
    instances: list
    images: list                   # raw encoded bytes (PNG/JPEG) per image


def _parse_glb(data: bytes):
    magic, version, _length = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67, "not a GLB file"
    assert version == 2, f"unsupported GLB version {version}"
    offset = 12
    doc, binary = None, b""
    while offset < len(data):
        clen, ctype = struct.unpack_from("<II", data, offset)
        chunk = data[offset + 8:offset + 8 + clen]
        if ctype == 0x4E4F534A:        # 'JSON'
            doc = json.loads(chunk)
        elif ctype == 0x004E4942:      # 'BIN\0'
            binary = chunk
        offset += 8 + clen
    assert doc is not None, "GLB missing JSON chunk"
    return doc, binary


def _read_accessor(doc, buffers, idx) -> np.ndarray:
    acc = doc["accessors"][idx]
    n = acc["count"]
    ncomp = _TYPE_SIZES[acc["type"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    itemsize = np.dtype(dtype).itemsize * ncomp

    if "bufferView" not in acc:
        out = np.zeros((n, ncomp), dtype)
    else:
        bv = doc["bufferViews"][acc["bufferView"]]
        buf = buffers[bv.get("buffer", 0)]
        start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
        stride = bv.get("byteStride", itemsize)
        if stride == itemsize:
            out = np.frombuffer(buf, dtype, count=n * ncomp,
                                offset=start).reshape(n, ncomp)
        else:
            raw = np.frombuffer(buf, np.uint8)
            rows = np.lib.stride_tricks.as_strided(
                raw[start:], shape=(n, itemsize), strides=(stride, 1))
            out = rows.copy().view(dtype).reshape(n, ncomp)
    if acc.get("normalized") and dtype != np.float32:
        out = out.astype(np.float32) / np.iinfo(dtype).max
    return out.squeeze(-1) if acc["type"] == "SCALAR" else out


def _node_matrix(node) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m[:3, :3] = np.diag(np.asarray(node["scale"], np.float32))
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r = np.asarray([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ], np.float32)
        m[:3, :3] = r @ m[:3, :3]
    if "translation" in node:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def _convert_material(gm: dict, idx: int) -> GltfMaterial:
    pbr = gm.get("pbrMetallicRoughness", {})
    ext = gm.get("extensions", {})
    base = pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0])
    rough = float(pbr.get("roughnessFactor", 1.0))
    metallic = float(pbr.get("metallicFactor", 0.0))
    transmission = float(
        ext.get("KHR_materials_transmission", {}).get("transmissionFactor", 0.0))
    ior = float(ext.get("KHR_materials_ior", {}).get("ior", 1.45))
    strength = float(
        ext.get("KHR_materials_emissive_strength", {}).get("emissiveStrength", 1.0))
    emissive = [c * strength for c in gm.get("emissiveFactor", [0, 0, 0])]

    mtype = PLASTIC
    if transmission > 0.0:
        mtype = DIELECTRIC
    elif metallic > 0.5:
        mtype = CONDUCTOR

    base_img = pbr.get("baseColorTexture", {}).get("index", -1)
    emis_img = gm.get("emissiveTexture", {}).get("index", -1)
    return GltfMaterial(
        name=gm.get("name", f"material_{idx}"), mtype=mtype,
        albedo=tuple(base[:3]), roughness=rough, ior=ior,
        emission=(emissive[0], emissive[1], emissive[2]),
        intensity=1.0, opacity=float(base[3]) if len(base) > 3 else 1.0,
        base_color_image=base_img, emissive_image=emis_img)


def load(path: str | Path) -> GltfScene:
    """Load a .glb or .gltf file into a flattened GltfScene."""
    path = Path(path)
    raw = path.read_bytes()
    if path.suffix.lower() == ".glb" or raw[:4] == b"glTF":
        doc, binary = _parse_glb(raw)
        buffers = [binary]
    else:
        doc = json.loads(raw)
        buffers = []
        for b in doc.get("buffers", []):
            uri = b["uri"]
            if uri.startswith("data:"):
                import base64
                buffers.append(base64.b64decode(uri.split(",", 1)[1]))
            else:
                buffers.append((path.parent / uri).read_bytes())

    materials = [_convert_material(m, i)
                 for i, m in enumerate(doc.get("materials", []))]
    if not materials:
        materials = [GltfMaterial("default", PLASTIC, (0.8, 0.8, 0.8),
                                  0.5, 1.45, (0, 0, 0), 1.0, 1.0)]

    # Texture index → image index indirection; store raw encoded bytes.
    images = []
    for img in doc.get("images", []):
        if "bufferView" in img:
            bv = doc["bufferViews"][img["bufferView"]]
            start = bv.get("byteOffset", 0)
            images.append(buffers[bv.get("buffer", 0)]
                          [start:start + bv["byteLength"]])
        else:
            images.append((path.parent / img["uri"]).read_bytes())
    tex_to_img = [t.get("source", -1) for t in doc.get("textures", [])]
    for m in materials:
        m.base_color_image = tex_to_img[m.base_color_image] \
            if 0 <= m.base_color_image < len(tex_to_img) else -1
        m.emissive_image = tex_to_img[m.emissive_image] \
            if 0 <= m.emissive_image < len(tex_to_img) else -1

    meshes = []
    for mesh in doc.get("meshes", []):
        prims = []
        for prim in mesh["primitives"]:
            if prim.get("mode", 4) != 4:       # triangles only
                continue
            attrs = prim["attributes"]
            pos = _read_accessor(doc, buffers, attrs["POSITION"]) \
                .astype(np.float32)
            if "indices" in prim:
                idx = _read_accessor(doc, buffers, prim["indices"]) \
                    .astype(np.int64)
            else:
                idx = np.arange(pos.shape[0], dtype=np.int64)
            faces = idx.reshape(-1, 3)
            normals = _read_accessor(doc, buffers, attrs["NORMAL"]) \
                .astype(np.float32) if "NORMAL" in attrs else None
            uvs = _read_accessor(doc, buffers, attrs["TEXCOORD_0"]) \
                .astype(np.float32) if "TEXCOORD_0" in attrs else None
            prims.append(GltfPrimitive(
                positions=pos, faces=faces, normals=normals, uvs=uvs,
                material=prim.get("material", 0)))
        meshes.append((mesh.get("name", "mesh"), prims))

    # Flatten the node hierarchy into world-space instances
    # (CreateMeshInstancesFromNode analog, OBJLoader.cpp:182-210).
    instances = []
    nodes = doc.get("nodes", [])

    def walk(node_idx, parent_m):
        node = nodes[node_idx]
        m = parent_m @ _node_matrix(node)
        if "mesh" in node:
            name, prims = meshes[node["mesh"]]
            instances.append(GltfInstance(
                name=node.get("name", name), transform=m, primitives=prims))
        for child in node.get("children", []):
            walk(child, m)

    scene_idx = doc.get("scene", 0)
    scenes = doc.get("scenes", [{}])
    for root in scenes[scene_idx].get("nodes", range(len(nodes))):
        walk(root, np.eye(4, dtype=np.float32))
    if not instances and meshes:
        for name, prims in meshes:
            instances.append(GltfInstance(
                name=name, transform=np.eye(4, dtype=np.float32),
                primitives=prims))

    return GltfScene(materials=materials, instances=instances, images=images)
