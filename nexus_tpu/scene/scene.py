"""Scene: host builder + device pytree.

TPU-native replacement for the reference's scene stack
(Nexus/src/Scene/Scene.{h,cpp}, Assets/AssetManager.{h,cpp} and the
D_Scene device mirror, Nexus/src/Cuda/Scene/Scene.cuh:19-36). Instead of
host objects mirrored into device PODs via ToDevice/DeviceVector
(Nexus/src/Device/DeviceVector.h), the whole scene IS one pytree of flat
jnp arrays: upload = jnp.asarray, update = functional replace.

This first-tier scene flattens every instance into world-space triangles
over a single BVH2 (BASELINE configs 1-2). The TLAS/BLAS instanced path
(accel/tlas, accel/bvh8) layers on top later without changing this API.

Mesh lights follow the reference's auto-registration semantics
(Scene.cpp:142-176): every instance whose material is emissive becomes a
light; NEE samples uniform-light → uniform-triangle → uniform-point with
pdf = 1/(lightCount · triCount · triArea) (PathTracer.cu:272-274 — the
deliberate quirk of uniform (not area-weighted) triangle selection,
SURVEY.md §8.7).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax.numpy as jnp
import numpy as np

from nexus_tpu.accel import bvh2 as bvh2_mod
from nexus_tpu.accel import links as links_mod
from nexus_tpu.accel import tlas as tlas_mod
from nexus_tpu.accel.tlas import TLASArrays
from nexus_tpu.accel.traverse2 import BVH2Arrays, device_arrays
from nexus_tpu.scene.camera import Camera, make_camera
from nexus_tpu.scene.materials import MaterialBuilder, Materials
from nexus_tpu.scene.textures import TextureAtlas, build_atlas


@flax.struct.dataclass
class SceneData:
    """Complete device scene (D_Scene analog) — one jittable pytree.

    Exactly one of `bvh` (flat, world-space triangles) / `tlas`
    (instanced TLAS→BLAS, object-space triangles + per-instance
    transforms) is set; `is_instanced` dispatches statically. The
    shading-attribute arrays (n0..uv2) are indexed by GLOBAL triangle id
    in both modes (instanced: object space, transformed by scene/view.py
    accessors at shade time, matching PathTracer.cu:328-346).
    """
    bvh: BVH2Arrays | None   # flat: traversal arrays + world v0/v1/v2
    # Per-triangle shading attributes, indexed by global triangle id:
    n0: jnp.ndarray          # (N, 3) vertex normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray         # (N, 2) texture coords
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    tri_mat: jnp.ndarray     # (N,) int32 material id
    tri_inst: jnp.ndarray    # (N,) int32 owning instance id (pixel query)
    tri_meta: jnp.ndarray    # (N, 2) int32 [mat, inst] — ONE combined
    #                          gather serves both lookups per bounce (an
    #                          XLA gather costs per-index regardless of
    #                          width; two tables = two serial passes)
    tri_attr: jnp.ndarray    # (N, 26) f32 combined shading attributes:
    #                          v0,v1,v2 (9; world for flat / object for
    #                          instanced), n0,n1,n2 (9), uv0,uv1,uv2
    #                          (6), mat, inst (2, exact f32). ONE gather
    #                          per hit set serves all of shading — the
    #                          per-component gathers fused in the fwd
    #                          program but became ~14 separate 0.4 ms
    #                          serial gathers per bounce under jvp
    #                          (view.fetch_attr; docs/perf.md)
    inst_ntris: jnp.ndarray  # (I,) int32 triangles per instance (MIS pdf)
    materials: Materials
    # Mesh lights (flattened): light l owns light_tris[start[l]:start[l]+ntris[l]]
    light_start: jnp.ndarray  # (L,) int32
    light_ntris: jnp.ndarray  # (L,) int32
    light_tris: jnp.ndarray   # (LT,) int32 global triangle ids
    camera: Camera
    textures: TextureAtlas
    env_map: jnp.ndarray               # (He, We, 3) float32 radiance
    background_color: jnp.ndarray      # (3,)
    background_intensity: jnp.ndarray  # ()
    # Instanced mode (None for flat scenes):
    tlas: "TLASArrays | None" = None
    light_inst: jnp.ndarray | None = None  # (L,) int32 owning instance
    # Per-octant skip links for the stackless fast traversal
    # (accel/links.py; (8*M,) flattened [octant, node] tables):
    links_hit: jnp.ndarray | None = None
    links_miss: jnp.ndarray | None = None
    # Blocked triangle layout for the HBM-resident Pallas trace kernel
    # (kernels/trace_hbm.py; flat AND instanced scenes, TPU backend):
    blocked: "object | None" = None
    # CWBVH (8-wide compressed) arrays — built by build(accel="bvh8"),
    # served by accel/traverse8.py (BVH8Traversal.cuh analog):
    bvh8: "object | None" = None
    # Static (non-pytree) metadata: real light count (the arrays above are
    # padded to >=1 for well-formed gathers; n_lights is the truth).
    n_lights: int = flax.struct.field(pytree_node=False, default=0)
    has_env: bool = flax.struct.field(pytree_node=False, default=False)
    is_instanced: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def tri_count(self) -> int:
        return self.tri_mat.shape[0]


def _per_tri_attrs(vertices, faces, normals, uvs):
    """(V,3)+(F,3) indexed mesh → per-triangle SoA attribute arrays.

    Missing normals fall back to geometric face normals (the reference
    imports normals from assimp, OBJLoader.cpp:28-44)."""
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int64)
    v0, v1, v2 = (vertices[faces[:, k]] for k in range(3))
    if normals is None:
        gn = np.cross(v1 - v0, v2 - v0)
        gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True),
                             1e-20)
        n0 = n1 = n2 = gn.astype(np.float32)
    else:
        normals = np.asarray(normals, np.float32)
        normals = normals / np.maximum(
            np.linalg.norm(normals, axis=-1, keepdims=True), 1e-20)
        n0, n1, n2 = (normals[faces[:, k]] for k in range(3))
    if uvs is None:
        uv0 = uv1 = uv2 = np.zeros((faces.shape[0], 2), np.float32)
    else:
        uvs = np.asarray(uvs, np.float32)
        uv0, uv1, uv2 = (uvs[faces[:, k]] for k in range(3))
    return v0, v1, v2, n0, n1, n2, uv0, uv1, uv2


def _pack_tri_attr(v0, v1, v2, n0, n1, n2, uv0, uv1, uv2, mat, inst):
    """One (N, 26) f32 row per triangle (SceneData.tri_attr layout)."""
    mat = np.asarray(mat, np.int64)
    inst = np.asarray(inst, np.int64)
    assert mat.max(initial=0) < (1 << 24) and inst.max(initial=0) < (1 << 24)
    return jnp.asarray(np.concatenate(
        [np.asarray(a, np.float32) for a in
         (v0, v1, v2, n0, n1, n2, uv0, uv1, uv2)]
        + [mat[:, None].astype(np.float32),
           inst[:, None].astype(np.float32)], axis=1))


@dataclasses.dataclass
class _Instance:
    name: str
    tri_start: int
    tri_count: int
    material_id: int


class SceneBuilder:
    """Host-side scene assembly (Scene + AssetManager analog).

    add_mesh flattens (vertices, faces) through `transform` into world
    space immediately — the single-BVH equivalent of
    BVHInstance::SetTransform (BVHInstance.cpp:4-29).
    """

    def __init__(self):
        self.materials = MaterialBuilder()
        self._v0, self._v1, self._v2 = [], [], []
        self._n0, self._n1, self._n2 = [], [], []
        self._uv0, self._uv1, self._uv2 = [], [], []
        self._mat, self._inst = [], []
        self.instances: list[_Instance] = []
        self.camera = None
        self.background_color = (0.0, 0.0, 0.0)
        self.background_intensity = 1.0
        self._textures: list[np.ndarray] = []
        self._env_map: np.ndarray | None = None
        # Instanced mode (build_instanced): mesh assets + instance records.
        self._assets: list[dict] = []
        self._inst_records: list[dict] = []

    def add_material(self, **kw) -> int:
        return self.materials.add(**kw)

    def add_texture(self, image: np.ndarray) -> int:
        """Register an (H, W, 4) float32 LINEAR-space texture; returns id.

        (AssetManager::AddTexture analog, AssetManager.cpp:69-96; sRGB
        decode happens in the loader, textures stored linear.)
        """
        image = np.asarray(image, np.float32)
        assert image.ndim == 3 and image.shape[-1] == 4, image.shape
        self._textures.append(image)
        return len(self._textures) - 1

    def set_env_map(self, rgb: np.ndarray):
        """Set the equirect HDR environment (Scene::AddHDRMap analog,
        Scene.cpp:93-100)."""
        self._env_map = np.asarray(rgb, np.float32)

    def add_mesh(self, vertices: np.ndarray, faces: np.ndarray,
                 material_id: int, transform: np.ndarray | None = None,
                 normals: np.ndarray | None = None,
                 uvs: np.ndarray | None = None, name: str = "mesh") -> int:
        """Add an instance. vertices (V,3) float, faces (F,3) int.

        normals/uvs are per-vertex ((V,3)/(V,2)) and optional: missing
        normals fall back to geometric face normals (the reference
        imports normals from assimp; OBJLoader.cpp:28-44).
        """
        vertices = np.asarray(vertices, np.float32)
        faces = np.asarray(faces, np.int64)
        if transform is not None:
            m = np.asarray(transform, np.float32)
            vertices = vertices @ m[:3, :3].T + m[:3, 3]
            if normals is not None:
                # Normals transform by inverse-transpose (PathTracer.cu:345).
                n_mat = np.linalg.inv(m[:3, :3]).T
                normals = np.asarray(normals, np.float32) @ n_mat.T

        v0 = vertices[faces[:, 0]]
        v1 = vertices[faces[:, 1]]
        v2 = vertices[faces[:, 2]]
        if normals is None:
            gn = np.cross(v1 - v0, v2 - v0)
            norm = np.linalg.norm(gn, axis=-1, keepdims=True)
            gn = gn / np.maximum(norm, 1e-20)
            n0 = n1 = n2 = gn.astype(np.float32)
        else:
            normals = np.asarray(normals, np.float32)
            norm = np.linalg.norm(normals, axis=-1, keepdims=True)
            normals = normals / np.maximum(norm, 1e-20)
            n0, n1, n2 = (normals[faces[:, k]] for k in range(3))
        if uvs is None:
            uv0 = uv1 = uv2 = np.zeros((faces.shape[0], 2), np.float32)
        else:
            uvs = np.asarray(uvs, np.float32)
            uv0, uv1, uv2 = (uvs[faces[:, k]] for k in range(3))

        inst_id = len(self.instances)
        start = sum(i.tri_count for i in self.instances)
        self.instances.append(
            _Instance(name=name, tri_start=start, tri_count=faces.shape[0],
                      material_id=material_id))
        self._v0.append(v0); self._v1.append(v1); self._v2.append(v2)
        self._n0.append(n0); self._n1.append(n1); self._n2.append(n2)
        self._uv0.append(uv0); self._uv1.append(uv1); self._uv2.append(uv2)
        self._mat.append(np.full(faces.shape[0], material_id, np.int32))
        self._inst.append(np.full(faces.shape[0], inst_id, np.int32))
        return inst_id

    def add_mesh_asset(self, vertices: np.ndarray, faces: np.ndarray,
                       normals: np.ndarray | None = None,
                       uvs: np.ndarray | None = None,
                       name: str = "mesh") -> int:
        """Register a reusable OBJECT-space mesh asset; returns mesh id.

        The AssetManager::AddMesh analog (AssetManager.h:30): one BLAS is
        built per asset at build_instanced() time and shared by every
        instance referencing it (AssetManager::CreateBVH,
        AssetManager.cpp:23-37).
        """
        v0, v1, v2, n0, n1, n2, uv0, uv1, uv2 = _per_tri_attrs(
            vertices, faces, normals, uvs)
        self._assets.append(dict(v0=v0, v1=v1, v2=v2, n0=n0, n1=n1, n2=n2,
                                 uv0=uv0, uv1=uv1, uv2=uv2, name=name))
        return len(self._assets) - 1

    def add_instance(self, mesh_id: int, material_id: int,
                     transform: np.ndarray | None = None,
                     name: str | None = None) -> int:
        """Place an instance of a mesh asset (BVHInstance analog:
        per-instance transform + material binding, BVHInstance.h:22-29).
        Only meaningful with build_instanced()."""
        assert 0 <= mesh_id < len(self._assets), mesh_id
        if transform is None:
            transform = np.eye(4, dtype=np.float32)
        self._inst_records.append(dict(
            mesh_id=mesh_id, material_id=material_id,
            transform=np.asarray(transform, np.float32),
            name=name or f"{self._assets[mesh_id]['name']}.{len(self._inst_records)}"))
        return len(self._inst_records) - 1

    def build_instanced(self, leaf_size: int = 4,
                        accel: str = "links") -> SceneData:
        """Build the TLAS→BLAS instanced scene from assets + instances.

        accel: "links" (skip-link CPU fallback; TPU always uses the
        Pallas blocked kernel). "bvh8" is flat-only by design — see
        docs/accel.md for the routing decision."""
        if accel == "bvh8":
            raise NotImplementedError(
                "CWBVH is the flat-scene CPU-side accel; instanced "
                "scenes use the skip-link TLAS fallback (CPU) and the "
                "Pallas blocked kernel (TPU). See docs/accel.md.")
        assert accel == "links", accel
        assert self._inst_records, "no instances added (use add_instance)"
        materials = self.materials.build()

        blases = [tlas_mod.build_blas(a["v0"], a["v1"], a["v2"],
                                      leaf_size=leaf_size)
                  for a in self._assets]
        inst_blas = [r["mesh_id"] for r in self._inst_records]
        tl = tlas_mod.build_tlas(
            blases, inst_blas,
            [r["transform"] for r in self._inst_records],
            [r["material_id"] for r in self._inst_records])
        from nexus_tpu.accel.traverse_links import link_tlas
        linked = link_tlas(tl)
        from nexus_tpu.kernels.trace_hbm import build_blocked_tlas
        blocked = build_blocked_tlas(tl)

        # Global per-triangle shading attrs: concat per asset, matching
        # the tlas triangle concatenation order.
        cat = lambda k: jnp.asarray(
            np.concatenate([a[k] for a in self._assets]))

        # Mesh lights = emissive instances (Scene.cpp:142-176); the
        # light's triangles are the contiguous global range of its BLAS.
        emissive = np.asarray(
            np.max(np.asarray(materials.emission), axis=-1)
            * np.asarray(materials.intensity) > 0.0)
        tri_off = np.asarray(tl.inst_tri_off)
        ntris_all = np.asarray(tl.inst_ntris)
        starts, ntris, light_tris, light_inst = [], [], [], []
        for i, r in enumerate(self._inst_records):
            if emissive[r["material_id"]]:
                starts.append(len(light_tris))
                ntris.append(int(ntris_all[i]))
                light_tris.extend(
                    range(int(tri_off[i]), int(tri_off[i] + ntris_all[i])))
                light_inst.append(i)
        n_lights = len(starts)
        if not starts:
            starts, ntris, light_tris, light_inst = [0], [0], [0], [0]

        camera = self.camera or make_camera(
            position=(0.0, 0.0, 2.0), look_at=(0.0, 0.0, 0.0))
        n_tris = int(np.asarray(tl.v0).shape[0])

        return SceneData(
            bvh=None, tlas=tl, blocked=blocked,
            links_hit=linked.hit, links_miss=linked.miss,
            n0=cat("n0"), n1=cat("n1"), n2=cat("n2"),
            uv0=cat("uv0"), uv1=cat("uv1"), uv2=cat("uv2"),
            tri_mat=jnp.zeros(n_tris, jnp.int32),  # per-instance binding
            tri_inst=jnp.zeros(n_tris, jnp.int32),  # from Intersection
            tri_meta=jnp.zeros((n_tris, 2), jnp.int32),
            tri_attr=_pack_tri_attr(
                np.concatenate([a["v0"] for a in self._assets]),
                np.concatenate([a["v1"] for a in self._assets]),
                np.concatenate([a["v2"] for a in self._assets]),
                np.concatenate([a["n0"] for a in self._assets]),
                np.concatenate([a["n1"] for a in self._assets]),
                np.concatenate([a["n2"] for a in self._assets]),
                np.concatenate([a["uv0"] for a in self._assets]),
                np.concatenate([a["uv1"] for a in self._assets]),
                np.concatenate([a["uv2"] for a in self._assets]),
                np.zeros(n_tris, np.int32), np.zeros(n_tris, np.int32)),
            inst_ntris=tl.inst_ntris,
            materials=materials,
            light_start=jnp.asarray(starts, jnp.int32),
            light_ntris=jnp.asarray(ntris, jnp.int32),
            light_tris=jnp.asarray(light_tris, jnp.int32),
            light_inst=jnp.asarray(light_inst, jnp.int32),
            camera=camera,
            textures=build_atlas(self._textures),
            env_map=jnp.asarray(
                self._env_map if self._env_map is not None
                else np.zeros((1, 1, 3), np.float32)),
            background_color=jnp.asarray(self.background_color, jnp.float32),
            background_intensity=jnp.asarray(self.background_intensity,
                                             jnp.float32),
            n_lights=n_lights,
            has_env=self._env_map is not None,
            is_instanced=True)

    def set_camera(self, **kw):
        self.camera = make_camera(**kw)
        self._camera_kw = dict(kw)   # editor panels re-derive from these

    def build(self, leaf_size: int = 4, accel: str = "links") -> SceneData:
        """Build the flat device scene.

        accel selects the JAX-traversal structure serving closest/any
        hit off the TPU fast path: "links" (stackless per-octant skip
        links, the default) or "bvh8" (8-wide compressed CWBVH,
        accel/bvh8.py + traverse8.py — BVH8Traversal.cuh analog). The
        Pallas kernel still takes precedence on the TPU backend.
        """
        assert accel in ("links", "bvh8"), accel
        assert self._v0, "scene has no geometry"
        v0 = np.concatenate(self._v0)
        v1 = np.concatenate(self._v1)
        v2 = np.concatenate(self._v2)
        tri_mat = np.concatenate(self._mat)
        tri_inst = np.concatenate(self._inst)
        materials = self.materials.build()

        bvh = bvh2_mod.build(v0, v1, v2, leaf_size=leaf_size)
        bvh_arrays = device_arrays(bvh, v0, v1, v2)
        links = links_mod.build_links(bvh.bmin, bvh.bmax, bvh.left_first,
                                      bvh.count)
        from nexus_tpu.kernels.trace_hbm import build_blocked_flat
        blocked = build_blocked_flat(v0, v1, v2, bvh.tri_order)
        bvh8_arrays = None
        if accel == "bvh8":
            from nexus_tpu.accel import bvh8 as bvh8_mod
            from nexus_tpu.accel import traverse8

            bvh8_arrays = traverse8.device_arrays(
                bvh8_mod.build(v0, v1, v2), v0, v1, v2)

        # Mesh lights: one light per emissive instance (Scene.cpp:142-176).
        emissive = np.asarray(
            np.max(np.asarray(materials.emission), axis=-1)
            * np.asarray(materials.intensity) > 0.0)
        starts, ntris, light_tris = [], [], []
        for inst in self.instances:
            if emissive[inst.material_id]:
                starts.append(len(light_tris))
                ntris.append(inst.tri_count)
                light_tris.extend(
                    range(inst.tri_start, inst.tri_start + inst.tri_count))
        n_lights = len(starts)
        if not starts:
            # Pad to >=1 so gathers are well-formed; n_lights records truth
            # and the integrator skips NEE statically when it is 0.
            starts, ntris, light_tris = [0], [0], [0]

        camera = self.camera or make_camera(
            position=(0.0, 0.0, 2.0), look_at=(0.0, 0.0, 0.0))

        return SceneData(
            bvh=bvh_arrays,
            links_hit=jnp.asarray(links.hit.reshape(-1)),
            links_miss=jnp.asarray(links.miss.reshape(-1)),
            blocked=blocked,
            bvh8=bvh8_arrays,
            n0=jnp.asarray(np.concatenate(self._n0)),
            n1=jnp.asarray(np.concatenate(self._n1)),
            n2=jnp.asarray(np.concatenate(self._n2)),
            uv0=jnp.asarray(np.concatenate(self._uv0)),
            uv1=jnp.asarray(np.concatenate(self._uv1)),
            uv2=jnp.asarray(np.concatenate(self._uv2)),
            tri_mat=jnp.asarray(tri_mat), tri_inst=jnp.asarray(tri_inst),
            tri_meta=jnp.stack([jnp.asarray(tri_mat, jnp.int32),
                                jnp.asarray(tri_inst, jnp.int32)],
                               axis=-1),
            tri_attr=_pack_tri_attr(
                v0, v1, v2,
                np.concatenate(self._n0), np.concatenate(self._n1),
                np.concatenate(self._n2),
                np.concatenate(self._uv0), np.concatenate(self._uv1),
                np.concatenate(self._uv2), tri_mat, tri_inst),
            inst_ntris=jnp.asarray(
                [i.tri_count for i in self.instances], jnp.int32),
            materials=materials,
            light_start=jnp.asarray(starts, jnp.int32),
            light_ntris=jnp.asarray(ntris, jnp.int32),
            light_tris=jnp.asarray(light_tris, jnp.int32),
            camera=camera,
            textures=build_atlas(self._textures),
            env_map=jnp.asarray(
                self._env_map if self._env_map is not None
                else np.zeros((1, 1, 3), np.float32)),
            background_color=jnp.asarray(self.background_color, jnp.float32),
            background_intensity=jnp.asarray(self.background_intensity,
                                             jnp.float32),
            n_lights=n_lights,
            has_env=self._env_map is not None)
