"""COLLADA (.dae) scene reader — geometry, node transforms, materials.

The reference reads .dae through Assimp (/root/reference/README.md:38,
Nexus/src/Assets/OBJLoader.cpp:219 `aiImportFile` with
aiProcess_Triangulate); this build links no native importer, so here is
a dependency-free parser (stdlib `xml.etree`) for the COLLADA 1.4/1.5
subset a static-scene renderer consumes:

  - `library_geometries`: `<mesh>` sources (float_array + accessor
    stride), `<vertices>` indirection, and `<triangles>` / `<polylist>`
    / `<polygons>` primitives with per-input index offsets (VERTEX /
    NORMAL / TEXCOORD); polygons are fan-triangulated and corners are
    re-indexed to a single vertex stream keyed by the index tuple
    (same strategy as io/obj.py);
  - `library_visual_scenes`: recursive `<node>` hierarchy composing
    `<matrix>` / `<translate>` / `<rotate>` (axis-angle, degrees) /
    `<scale>` in DOCUMENT ORDER (the COLLADA composition rule),
    `<instance_geometry>` with `bind_material` symbol→target maps, and
    `<instance_node>` re-instancing of `library_nodes` subtrees;
  - `library_materials` → `library_effects` profile_COMMON:
    lambert/phong/blinn/constant columns (diffuse, emission,
    index_of_refraction, transparency incl. the RGB_ZERO inversion
    rule, shininess) plus the diffuse-texture chain
    texture→sampler2D→surface→`library_images` init_from;
  - `<asset>` `<unit meter=…>` scaling and `<up_axis>` (X_UP / Y_UP /
    Z_UP) conversion into the renderer's Y-up convention.

Deliberately out of scope (documented, fail-soft): animation, skinning
(`library_controllers` — a controller instance falls back to its bind
geometry when present), lights/cameras, multi-<technique> effects
beyond COMMON. Files beyond the subset still load their geometry; the
io/loader.py fail-fast message points at glTF conversion for anything
else.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class DaeMaterial:
    """Raw COMMON-profile effect record (conversion heuristics live in
    io/loader.py next to the other formats')."""
    name: str
    diffuse: tuple = (0.8, 0.8, 0.8)
    emission: tuple = (0.0, 0.0, 0.0)
    ior: float = 1.45
    opacity: float = 1.0                 # 1 = opaque (A_ONE convention)
    shininess: float | None = None       # phong exponent (None = unset)
    map_kd: str | None = None            # diffuse texture file reference


@dataclasses.dataclass
class DaeMesh:
    """One placed geometry: world transform + re-indexed attributes."""
    positions: np.ndarray                # (V, 3) float32 (meters)
    faces: np.ndarray                    # (F, 3) int64
    normals: np.ndarray | None           # (V, 3) float32
    uvs: np.ndarray | None               # (V, 2) float32
    transform: np.ndarray                # (4, 4) float32 model→world
    material: int                        # index into materials, -1 none
    name: str


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _floats(text: str | None) -> np.ndarray:
    toks = (text or "").split()
    return np.array(toks, np.float64) if toks else np.zeros(0, np.float64)


def _ints(text: str | None) -> np.ndarray:
    toks = (text or "").split()
    return np.array(toks, np.int64) if toks else np.zeros(0, np.int64)


def _ref(url: str | None) -> str:
    return (url or "").lstrip("#")


class _Doc:
    """Id-indexed element forest with namespace-free tags."""

    def __init__(self, root):
        for el in root.iter():
            el.tag = _local(el.tag)
        self.root = root
        self.by_id = {el.get("id"): el
                      for el in root.iter() if el.get("id")}

    def find(self, el, *path):
        for name in path:
            if el is None:
                return None
            el = next((c for c in el if c.tag == name), None)
        return el

    def all(self, el, name):
        return [c for c in el if c.tag == name] if el is not None else []


def _source_array(doc: _Doc, source_el) -> np.ndarray:
    """<source> → (count, stride) float array via its accessor."""
    arr_el = doc.find(source_el, "float_array")
    data = _floats(arr_el.text if arr_el is not None else "")
    acc = doc.find(source_el, "technique_common", "accessor")
    if acc is None:
        return data.reshape(-1, 3)
    stride = int(acc.get("stride", "1"))
    count = int(acc.get("count", str(len(data) // max(stride, 1))))
    offset = int(acc.get("offset", "0"))
    return data[offset:offset + count * stride].reshape(count, stride)


def _up_axis_matrix(up: str) -> np.ndarray:
    m = np.eye(4, dtype=np.float64)
    if up == "Z_UP":       # (x, y, z) → (x, z, -y)
        m[:3, :3] = [[1, 0, 0], [0, 0, 1], [0, -1, 0]]
    elif up == "X_UP":     # (x, y, z) → (-y, x, z)
        m[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
    return m


def _node_local(doc: _Doc, node) -> np.ndarray:
    """Compose the node's transform elements in document order
    (COLLADA 1.4 §4-<node>: elements post-multiply left to right)."""
    m = np.eye(4, dtype=np.float64)
    for el in node:
        if el.tag == "matrix":
            v = _floats(el.text)
            if v.size == 16:
                m = m @ v.reshape(4, 4)          # row-major in the file
        elif el.tag == "translate":
            v = _floats(el.text)
            t = np.eye(4)
            t[:3, 3] = v[:3] if v.size >= 3 else 0.0
            m = m @ t
        elif el.tag == "rotate":
            v = _floats(el.text)
            if v.size >= 4 and abs(v[3]) > 1e-12:
                axis = v[:3]
                n = np.linalg.norm(axis)
                if n > 0:
                    x, y, z = axis / n
                    a = np.deg2rad(v[3])
                    c, s = np.cos(a), np.sin(a)
                    C = 1 - c
                    r = np.eye(4)
                    r[:3, :3] = [
                        [c + x * x * C, x * y * C - z * s, x * z * C + y * s],
                        [y * x * C + z * s, c + y * y * C, y * z * C - x * s],
                        [z * x * C - y * s, z * y * C + x * s, c + z * z * C]]
                    m = m @ r
        elif el.tag == "scale":
            v = _floats(el.text)
            sc = np.eye(4)
            for k in range(min(3, v.size)):
                sc[k, k] = v[k]
            m = m @ sc
    return m


def _effect_material(doc: _Doc, effect, name: str) -> DaeMaterial:
    mat = DaeMaterial(name=name)
    profile = doc.find(effect, "profile_COMMON")
    if profile is None:
        return mat
    # newparam chains for the texture lookup: sampler sid → surface sid
    # → image id (1.4); 1.5 allows texture → image id directly.
    sampler_src: dict[str, str] = {}
    surface_img: dict[str, str] = {}
    for np_el in doc.all(profile, "newparam"):
        sid = np_el.get("sid", "")
        samp = doc.find(np_el, "sampler2D", "source")
        if samp is not None and samp.text:
            sampler_src[sid] = samp.text.strip()
        surf = doc.find(np_el, "surface", "init_from")
        if surf is not None and surf.text:
            surface_img[sid] = surf.text.strip()

    def image_file(image_id: str) -> str | None:
        img = doc.by_id.get(image_id)
        init = doc.find(img, "init_from") if img is not None else None
        if init is None:
            return None
        # 1.5 wraps the path in <ref>
        ref = doc.find(init, "ref")
        text = (ref.text if ref is not None else init.text) or ""
        text = text.strip()
        for prefix in ("file://", "file:"):
            if text.startswith(prefix):
                text = text[len(prefix):]
        return text or None

    tech = doc.find(profile, "technique")
    shader = None
    for kind in ("lambert", "phong", "blinn", "constant"):
        shader = doc.find(tech, kind)
        if shader is not None:
            break
    if shader is None:
        return mat

    def color_of(col_name, default):
        el = doc.find(shader, col_name)
        c = doc.find(el, "color")
        if c is not None:
            v = _floats(c.text)
            if v.size >= 3:
                return tuple(float(x) for x in v[:3])
        t = doc.find(el, "texture")
        if t is not None and col_name == "diffuse":
            tex = t.get("texture", "")
            img = sampler_src.get(tex, tex)        # sampler → surface
            img = surface_img.get(img, img)        # surface → image id
            mat.map_kd = image_file(img)
        return default

    mat.diffuse = color_of("diffuse", mat.diffuse)
    mat.emission = color_of("emission", mat.emission)
    ior_el = doc.find(shader, "index_of_refraction", "float")
    if ior_el is not None and ior_el.text:
        mat.ior = float(ior_el.text)
    shin = doc.find(shader, "shininess", "float")
    if shin is not None and shin.text:
        mat.shininess = float(shin.text)
    # transparency = <transparency> scalar against the <transparent>
    # opaque mode: A_ONE (default) → opacity = value; RGB_ZERO inverts
    # (COLLADA 1.4.1 §7, the classic exporter pitfall).
    tr = doc.find(shader, "transparency", "float")
    if tr is not None and tr.text:
        val = float(tr.text)
        trans_el = doc.find(shader, "transparent")
        opaque = (trans_el.get("opaque", "A_ONE")
                  if trans_el is not None else "A_ONE")
        mat.opacity = 1.0 - val if opaque == "RGB_ZERO" else val
    return mat


def _mesh_primitives(doc: _Doc, geom, sym_to_mat: dict[str, int]):
    """geometry → [(positions, faces, normals, uvs, material)] with
    corners re-indexed to one vertex stream per primitive group."""
    mesh = doc.find(geom, "mesh")
    if mesh is None:
        return []
    sources = {el.get("id"): el for el in doc.all(mesh, "source")}
    vertices_el = doc.find(mesh, "vertices")
    vert_pos_src = None
    if vertices_el is not None:
        for inp in doc.all(vertices_el, "input"):
            if inp.get("semantic") == "POSITION":
                vert_pos_src = _ref(inp.get("source"))
    out = []
    for prim in mesh:
        if prim.tag not in ("triangles", "polylist", "polygons"):
            continue
        inputs = []           # (offset, semantic, source_id)
        max_off = 0
        for inp in doc.all(prim, "input"):
            off = int(inp.get("offset", "0"))
            sem = inp.get("semantic")
            src = _ref(inp.get("source"))
            # Every input's offset counts toward the <p> stride, even
            # inputs we drop (extra TEXCOORD sets, COLOR, TANGENT...) —
            # skipping one before this line would misparse the whole
            # index stream.
            max_off = max(max_off, off)
            if sem == "VERTEX":
                src = vert_pos_src or src
                sem = "POSITION"
            if sem not in ("POSITION", "NORMAL", "TEXCOORD"):
                continue
            # First TEXCOORD set only.
            if sem == "TEXCOORD" and any(s == "TEXCOORD"
                                         for _, s, _ in inputs):
                continue
            inputs.append((off, sem, src))
        stride = max_off + 1
        if prim.tag == "polygons":
            polys = [_ints(p.text) for p in doc.all(prim, "p")]
            idx = (np.concatenate(polys) if polys
                   else np.zeros(0, np.int64))
            vcount = np.array([len(p) // stride for p in polys], np.int64)
        else:
            p_el = doc.find(prim, "p")
            idx = _ints(p_el.text if p_el is not None else "")
            if prim.tag == "polylist":
                vc_el = doc.find(prim, "vcount")
                vcount = _ints(vc_el.text if vc_el is not None else "")
            else:
                vcount = np.full(idx.size // (3 * stride), 3, np.int64)
        if idx.size == 0:
            continue
        corners = idx.reshape(-1, stride)
        # Fan-triangulate: polygon with v corners → v-2 triangles.
        tri_corner = []
        base = 0
        for vc in vcount:
            vc = int(vc)
            for k in range(1, vc - 1):
                tri_corner.append((base, base + k, base + k + 1))
            base += vc
        tri_corner = np.asarray(tri_corner, np.int64)
        if tri_corner.size == 0:
            continue
        # Re-index unique corner tuples into one vertex stream.
        used = corners[tri_corner.reshape(-1)]
        uniq, inverse = np.unique(used, axis=0, return_inverse=True)
        faces = inverse.reshape(-1, 3)
        pos = nrm = uv = None
        for off, sem, src in inputs:
            src_el = sources.get(src)
            if src_el is None:
                continue
            data = _source_array(doc, src_el)
            if len(data) == 0:   # declared input, empty <float_array>:
                continue         # skip the attribute, keep the geometry
            sel = np.clip(uniq[:, off], 0, len(data) - 1)
            if sem == "POSITION":
                pos = data[sel][:, :3].astype(np.float32)
            elif sem == "NORMAL":
                nrm = data[sel][:, :3].astype(np.float32)
            elif sem == "TEXCOORD":
                uv = data[sel][:, :2].astype(np.float32)
        if pos is None:
            continue
        mat = sym_to_mat.get(prim.get("material", ""), -1)
        out.append((pos, faces.astype(np.int64), nrm, uv, mat))
    return out


def load(path: str | Path):
    """Parse a .dae file.

    Returns (meshes, materials): meshes are world-placed `DaeMesh`
    records (one per (node, primitive) pair, like the reference's
    one-instance-per-node import, OBJLoader.cpp:213-239), materials the
    document's `DaeMaterial` list indexed by `DaeMesh.material`.
    """
    import xml.etree.ElementTree as ET

    path = Path(path)
    doc = _Doc(ET.parse(str(path)).getroot())
    root = doc.root

    # ---- asset: unit scale + up axis ----------------------------------
    asset = doc.find(root, "asset")
    unit = doc.find(asset, "unit")
    meter = float(unit.get("meter", "1.0")) if unit is not None else 1.0
    up_el = doc.find(asset, "up_axis")
    up = (up_el.text or "Y_UP").strip() if up_el is not None else "Y_UP"
    world_fix = _up_axis_matrix(up)
    world_fix[:3, :3] *= meter

    # ---- materials ----------------------------------------------------
    materials: list[DaeMaterial] = []
    mat_index: dict[str, int] = {}     # material id → index
    lib_m = doc.find(root, "library_materials")
    for m in doc.all(lib_m, "material"):
        fx_ref = doc.find(m, "instance_effect")
        effect = doc.by_id.get(_ref(fx_ref.get("url"))
                               if fx_ref is not None else "")
        name = m.get("name") or m.get("id") or "material"
        rec = (_effect_material(doc, effect, name)
               if effect is not None else DaeMaterial(name=name))
        mat_index[m.get("id", name)] = len(materials)
        materials.append(rec)

    # ---- visual scene walk --------------------------------------------
    meshes: list[DaeMesh] = []

    def instance_geometry(ig, world, node_name):
        geom = doc.by_id.get(_ref(ig.get("url")))
        if geom is None:
            return
        sym_to_mat: dict[str, int] = {}
        bm = doc.find(ig, "bind_material", "technique_common")
        for im in doc.all(bm, "instance_material"):
            target = _ref(im.get("target"))
            if target in mat_index:
                sym_to_mat[im.get("symbol", "")] = mat_index[target]
        for k, (pos, faces, nrm, uv, mat) in enumerate(
                _mesh_primitives(doc, geom, sym_to_mat)):
            meshes.append(DaeMesh(
                positions=pos, faces=faces, normals=nrm, uvs=uv,
                transform=world.astype(np.float32), material=mat,
                name=f"{node_name}/{k}"))

    def walk(node, parent_world, depth=0):
        if depth > 64:                     # instance_node cycle guard
            return
        world = parent_world @ _node_local(doc, node)
        name = node.get("name") or node.get("id") or "node"
        for el in node:
            if el.tag == "instance_geometry":
                instance_geometry(el, world, name)
            elif el.tag == "instance_controller":
                # Skinning unsupported: fall back to the bind geometry.
                skin = doc.by_id.get(_ref(el.get("url")))
                src = doc.find(skin, "skin") if skin is not None else None
                if src is not None:
                    fake = type(el)("instance_geometry",
                                    {"url": src.get("source", "")})
                    fake.extend(list(el))
                    instance_geometry(fake, world, name)
            elif el.tag == "instance_node":
                target = doc.by_id.get(_ref(el.get("url")))
                if target is not None:
                    walk(target, world, depth + 1)
            elif el.tag == "node":
                walk(el, world, depth)

    scene_el = doc.find(root, "scene", "instance_visual_scene")
    vscene = (doc.by_id.get(_ref(scene_el.get("url")))
              if scene_el is not None else None)
    if vscene is None:
        lib_vs = doc.find(root, "library_visual_scenes")
        vss = doc.all(lib_vs, "visual_scene")
        vscene = vss[0] if vss else None
    if vscene is not None:
        for node in doc.all(vscene, "node"):
            walk(node, world_fix)
    else:
        # No scene graph: place every geometry at the origin.
        lib_g = doc.find(root, "library_geometries")
        for geom in doc.all(lib_g, "geometry"):
            for k, (pos, faces, nrm, uv, mat) in enumerate(
                    _mesh_primitives(doc, geom, {})):
                meshes.append(DaeMesh(
                    positions=pos, faces=faces, normals=nrm, uvs=uv,
                    transform=world_fix.astype(np.float32), material=mat,
                    name=f"{geom.get('id', 'geometry')}/{k}"))
    return meshes, materials
