"""Model-file → SceneBuilder glue.

The analog of Scene::CreateMeshInstanceFromFile
(Nexus/src/Scene/Scene.cpp:83-91): parse a model file, register its
materials and mesh instances into a SceneBuilder. Supported: .glb/.gltf
(io/gltf.py) and .obj (io/obj.py). Per-instance primitives keep their own
materials, matching one-BVH-per-mesh + per-node instances
(OBJLoader.cpp:213-239) — here flattened to world space (tier-1 scene).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from nexus_tpu.scene.scene import SceneBuilder


def add_model(builder: SceneBuilder, path: str | Path) -> list[int]:
    """Load a model file into `builder`. Returns created instance ids."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".glb", ".gltf"):
        return _add_gltf(builder, path)
    if suffix == ".obj":
        return _add_obj(builder, path)
    if suffix == ".ply":
        return _add_ply(builder, path)
    if suffix == ".fbx":
        return _add_fbx(builder, path)
    if suffix == ".dae":
        return _add_dae(builder, path)
    if suffix == ".3ds":
        return _add_3ds(builder, path)
    raise ValueError(
        f"unsupported model format {suffix!r}: supported are .glb/.gltf, "
        f".obj (+.mtl), .ply, .fbx (binary, static meshes — io/fbx.py), "
        f".dae (COLLADA — io/dae.py), .3ds (io/tds.py). "
        f"The reference reads further formats (e.g. .blend) via assimp, "
        f"which this build does not link — convert to glTF "
        f"(e.g. `assimp export {path.name} {path.stem}.glb`).")


def _add_fbx(builder: SceneBuilder, path: Path) -> list[int]:
    """Binary FBX static meshes (io/fbx.py). FBX materials are not
    mapped (the subset doc there); each geometry gets one default
    material — assign via the editor/material API afterwards."""
    from nexus_tpu.io import fbx

    meshes = fbx.load(path)
    if not meshes:
        raise ValueError(f"{path.name}: no triangle geometry found")
    mat_id = builder.add_material()
    return [builder.add_mesh(
        vertices=m.positions, faces=m.faces, material_id=mat_id,
        transform=m.transform, normals=m.normals, uvs=m.uvs,
        name=m.name or f"{path.stem}/{k}")
        for k, m in enumerate(meshes)]


def _add_dae(builder: SceneBuilder, path: Path) -> list[int]:
    """COLLADA scenes (io/dae.py): world-placed nodes with materials
    converted by the same heuristics as MTL (the reference funnels both
    through Assimp's common material model, OBJLoader.cpp:71-163):
    default PLASTIC, DIELECTRIC when the effect is transmissive
    (opacity < 1 with a refractive IOR), roughness from the phong
    exponent via the same clamp(1 - sqrt(Ns)/31.62278) mapping."""
    from nexus_tpu.io import dae
    from nexus_tpu.scene.materials import DIELECTRIC, PLASTIC

    meshes, materials = dae.load(path)
    if not meshes:
        raise ValueError(f"{path.name}: no triangle geometry found")

    def tex(rel):
        if not rel:
            return -1
        p = path.parent / rel
        if not p.exists():
            return -1
        return builder.add_texture(_decode_image_srgb(p.read_bytes()))

    mat_ids = []
    for m in materials:
        ns = 20.0 if m.shininess is None else m.shininess
        roughness = float(np.clip(
            1.0 - np.sqrt(max(ns, 0.0)) / 31.62278, 0.0, 1.0))
        mtype = (DIELECTRIC if (m.opacity < 1.0 and m.ior > 1.0)
                 else PLASTIC)
        mat_ids.append(builder.add_material(
            mtype=mtype, albedo=m.diffuse, emission=m.emission,
            intensity=1.0, opacity=m.opacity, ior=m.ior,
            roughness=roughness, diffuse_map=tex(m.map_kd)))
    default_id = None
    inst_ids = []
    for mesh in meshes:
        if mesh.material >= 0:
            mat_id = mat_ids[mesh.material]
        else:
            if default_id is None:
                default_id = builder.add_material()
            mat_id = default_id
        inst_ids.append(builder.add_mesh(
            vertices=mesh.positions, faces=mesh.faces, material_id=mat_id,
            transform=mesh.transform, normals=mesh.normals, uvs=mesh.uvs,
            name=mesh.name))
    return inst_ids


def _add_3ds(builder: SceneBuilder, path: Path) -> list[int]:
    """3DS meshes (io/tds.py): per-material face groups split into
    instances (same shape as the OBJ usemtl path); shininess percent →
    roughness = 1 - percent (3DS shininess is already 0-1)."""
    from nexus_tpu.io import tds
    from nexus_tpu.scene.materials import PLASTIC

    meshes, materials = tds.load(path)
    if not meshes:
        raise ValueError(f"{path.name}: no triangle geometry found")

    def tex(rel):
        if not rel:
            return -1
        p = path.parent / rel
        if not p.exists():
            return -1
        return builder.add_texture(_decode_image_srgb(p.read_bytes()))

    mat_ids = []
    for m in materials:
        rough = 1.0 if m.shininess is None else float(
            np.clip(1.0 - m.shininess, 0.0, 1.0))
        mat_ids.append(builder.add_material(
            mtype=PLASTIC, albedo=m.diffuse, opacity=m.opacity,
            roughness=rough, diffuse_map=tex(m.map_kd)))
    default_id = None
    inst_ids = []
    for mesh in meshes:
        fm = mesh.face_material
        if fm is None or len(mat_ids) == 0 or (fm < 0).all():
            if default_id is None:
                default_id = builder.add_material()
            inst_ids.append(builder.add_mesh(
                vertices=mesh.positions, faces=mesh.faces,
                material_id=default_id, uvs=mesh.uvs, name=mesh.name))
            continue
        for k, g in enumerate(np.unique(fm)):
            faces = mesh.faces[fm == g]
            if g < 0:
                if default_id is None:
                    default_id = builder.add_material()
                mat_id = default_id
            else:
                mat_id = mat_ids[g]
            inst_ids.append(builder.add_mesh(
                vertices=mesh.positions, faces=faces, material_id=mat_id,
                uvs=mesh.uvs, name=f"{mesh.name}/{k}"))
    return inst_ids


def _add_ply(builder: SceneBuilder, path: Path) -> list[int]:
    from nexus_tpu.io import ply

    mesh = ply.load(path)
    mat_id = builder.add_material()   # PLY carries no materials
    return [builder.add_mesh(
        vertices=mesh.positions, faces=mesh.faces, material_id=mat_id,
        normals=mesh.normals, uvs=mesh.uvs, name=path.stem)]


def _decode_image_srgb(raw: bytes) -> np.ndarray:
    """Decode PNG/JPEG bytes → (H, W, 4) float32, sRGB→linear RGB.

    Matches the texture read path (Texture.cpp:30: sRGB hardware decode,
    normalized float); alpha stays linear.
    """
    import io as _io

    from PIL import Image

    img = np.array(Image.open(_io.BytesIO(raw)).convert("RGBA"),
                   np.float32) / 255.0
    img[..., :3] = np.power(img[..., :3], 2.2)
    return img


def _add_gltf(builder: SceneBuilder, path: Path) -> list[int]:
    from nexus_tpu.io import gltf

    doc = gltf.load(path)
    # Decode + register only the images that materials reference.
    img_tex_id: dict[int, int] = {}

    def tex_id(image_idx: int) -> int:
        if image_idx < 0:
            return -1
        if image_idx not in img_tex_id:
            img_tex_id[image_idx] = builder.add_texture(
                _decode_image_srgb(doc.images[image_idx]))
        return img_tex_id[image_idx]

    mat_ids = []
    for m in doc.materials:
        mat_ids.append(builder.add_material(
            mtype=m.mtype, albedo=m.albedo, roughness=m.roughness,
            ior=m.ior, emission=m.emission, intensity=m.intensity,
            opacity=m.opacity,
            diffuse_map=tex_id(m.base_color_image),
            emissive_map=tex_id(m.emissive_image)))
    inst_ids = []
    for inst in doc.instances:
        for k, prim in enumerate(inst.primitives):
            inst_ids.append(builder.add_mesh(
                vertices=prim.positions, faces=prim.faces,
                material_id=mat_ids[prim.material],
                transform=inst.transform, normals=prim.normals,
                uvs=prim.uvs, name=f"{inst.name}/{k}"))
    return inst_ids


def add_model_instanced(builder: SceneBuilder, path: str | Path) -> list[int]:
    """Load a model as shared mesh ASSETS + placed INSTANCES.

    The TLAS/BLAS path (Scene::CreateMeshInstanceFromFile +
    AssetManager::CreateBVH, Scene.cpp:83-91, AssetManager.cpp:23-37):
    nodes referencing the same mesh share one BLAS; each node becomes a
    BVHInstance with its own transform. Use builder.build_instanced().
    Returns created instance ids.
    """
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".glb", ".gltf"):
        from nexus_tpu.io import gltf

        doc = gltf.load(path)
        img_tex_id: dict[int, int] = {}

        def tex_id(image_idx: int) -> int:
            if image_idx < 0:
                return -1
            if image_idx not in img_tex_id:
                img_tex_id[image_idx] = builder.add_texture(
                    _decode_image_srgb(doc.images[image_idx]))
            return img_tex_id[image_idx]

        mat_ids = []
        for m in doc.materials:
            mat_ids.append(builder.add_material(
                mtype=m.mtype, albedo=m.albedo, roughness=m.roughness,
                ior=m.ior, emission=m.emission, intensity=m.intensity,
                opacity=m.opacity,
                diffuse_map=tex_id(m.base_color_image),
                emissive_map=tex_id(m.emissive_image)))
        # One asset per UNIQUE primitive (nodes sharing a mesh share its
        # primitive objects — dedupe by identity).
        asset_of_prim: dict[int, int] = {}
        inst_ids = []
        for inst in doc.instances:
            for k, prim in enumerate(inst.primitives):
                if id(prim) not in asset_of_prim:
                    asset_of_prim[id(prim)] = builder.add_mesh_asset(
                        vertices=prim.positions, faces=prim.faces,
                        normals=prim.normals, uvs=prim.uvs,
                        name=f"{inst.name}/{k}")
                inst_ids.append(builder.add_instance(
                    asset_of_prim[id(prim)],
                    material_id=mat_ids[prim.material],
                    transform=inst.transform,
                    name=f"{inst.name}/{k}"))
        return inst_ids
    if suffix == ".obj":
        from nexus_tpu.io import obj

        mesh = obj.load(path)
        inst_ids = []
        for k, (faces, mat_id) in enumerate(
                _obj_material_groups(builder, mesh, path)):
            asset = builder.add_mesh_asset(
                vertices=mesh.positions, faces=faces,
                normals=mesh.normals, uvs=mesh.uvs,
                name=f"{path.stem}/{k}")
            inst_ids.append(builder.add_instance(
                asset, material_id=mat_id, name=f"{path.stem}/{k}"))
        return inst_ids
    raise ValueError(f"unsupported model format: {suffix}")


def load_env_map(builder: SceneBuilder, path: str | Path,
                 parity_ldr: bool = False):
    """Load an environment map into the scene (Scene::AddHDRMap analog).

    .hdr files decode as true float RGBE radiance. parity_ldr reproduces
    the reference's quirk of pushing .hdr through the 8-bit sRGB loader
    (Scene.cpp:95 → IMGLoader.cpp:17, SURVEY.md §8.3) — clamped
    highlights — for comparisons against reference renders. LDR formats
    (png/jpg) are sRGB-decoded to linear.
    """
    path = Path(path)
    if path.suffix.lower() == ".hdr" and not parity_ldr:
        from nexus_tpu.io.hdr import read_hdr

        builder.set_env_map(read_hdr(path))
        return
    if path.suffix.lower() == ".hdr":
        # LDR-parity: decode real HDR, then clamp+quantize like an 8-bit
        # sRGB texture would have stored it.
        from nexus_tpu.io.hdr import read_hdr

        rgb = np.clip(read_hdr(path), 0.0, 1.0)
        srgb = np.round(np.power(rgb, 1.0 / 2.2) * 255.0) / 255.0
        builder.set_env_map(np.power(srgb, 2.2).astype(np.float32))
        return
    raw = path.read_bytes()
    builder.set_env_map(_decode_image_srgb(raw)[..., :3])


def _convert_obj_material(builder: SceneBuilder, m, obj_dir: Path) -> int:
    """MTL record → scene material with the reference's conversion
    heuristics (OBJLoader.cpp:71-163): default PLASTIC, albedo=Kd,
    emission=Ke, opacity=d, ior=Ni (default 1.45), roughness =
    clamp(1 - sqrt(Ns)/31.62278, 0, 1) with Ns defaulting to 20 when
    unspecified, map_Kd/map_Ke textures. The reference flips PLASTIC →
    DIELECTRIC on a positive Assimp transmission factor (plain MTL has
    none); the OBJ-native analog is the refractive illum models 4/6/7/9.
    """
    from nexus_tpu.scene.materials import DIELECTRIC, PLASTIC

    ns = 20.0 if m.ns is None else m.ns
    roughness = float(np.clip(1.0 - np.sqrt(max(ns, 0.0)) / 31.62278,
                              0.0, 1.0))
    mtype = DIELECTRIC if m.illum in (4, 6, 7, 9) else PLASTIC

    def tex(rel):
        if not rel:
            return -1
        p = obj_dir / rel
        if not p.exists():
            return -1
        return builder.add_texture(_decode_image_srgb(p.read_bytes()))

    return builder.add_material(
        mtype=mtype, albedo=m.kd, emission=m.ke, intensity=1.0,
        opacity=m.d, ior=m.ni, roughness=roughness,
        diffuse_map=tex(m.map_kd), emissive_map=tex(m.map_ke))


def _obj_material_groups(builder: SceneBuilder, mesh, path: Path):
    """Map MTL records to scene materials and split faces by material.
    Yields (faces, material_id) per group; faces with no usemtl get the
    default material (OBJLoader.cpp:79)."""
    mat_ids = [_convert_obj_material(builder, m, path.parent)
               for m in mesh.materials]
    fm = mesh.face_material
    if fm is None or len(mat_ids) == 0 or (fm < 0).all():
        yield mesh.faces, builder.add_material()
        return
    default_id = None
    for g in np.unique(fm):
        faces = mesh.faces[fm == g]
        if g < 0:
            if default_id is None:
                default_id = builder.add_material()
            yield faces, default_id
        else:
            yield faces, mat_ids[g]


def _add_obj(builder: SceneBuilder, path: Path) -> list[int]:
    from nexus_tpu.io import obj

    mesh = obj.load(path)
    return [builder.add_mesh(
        vertices=mesh.positions, faces=faces, material_id=mat_id,
        normals=mesh.normals, uvs=mesh.uvs, name=f"{path.stem}/{k}")
        for k, (faces, mat_id) in enumerate(
            _obj_material_groups(builder, mesh, path))]
