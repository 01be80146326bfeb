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
    raise ValueError(f"unsupported model format: {suffix}")


def _add_gltf(builder: SceneBuilder, path: Path) -> list[int]:
    from nexus_tpu.io import gltf

    doc = gltf.load(path)
    mat_ids = []
    for m in doc.materials:
        mat_ids.append(builder.add_material(
            mtype=m.mtype, albedo=m.albedo, roughness=m.roughness,
            ior=m.ior, emission=m.emission, intensity=m.intensity,
            opacity=m.opacity))
    inst_ids = []
    for inst in doc.instances:
        for k, prim in enumerate(inst.primitives):
            inst_ids.append(builder.add_mesh(
                vertices=prim.positions, faces=prim.faces,
                material_id=mat_ids[prim.material],
                transform=inst.transform, normals=prim.normals,
                uvs=prim.uvs, name=f"{inst.name}/{k}"))
    return inst_ids


def _add_obj(builder: SceneBuilder, path: Path) -> list[int]:
    from nexus_tpu.io import obj

    mesh = obj.load(path)
    mat_id = builder.add_material()  # default material (OBJLoader.cpp:79)
    return [builder.add_mesh(
        vertices=mesh.positions, faces=mesh.faces,
        material_id=mat_id, normals=mesh.normals, uvs=mesh.uvs,
        name=path.stem)]
