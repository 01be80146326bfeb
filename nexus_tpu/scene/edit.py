"""Incremental scene edits: functional set_transform / set_material.

The reference's interactive edit path invalidates an instance, then
Scene::Update re-sets transforms, REBUILDS the whole TLAS and re-uploads
(Nexus/src/Scene/Scene.cpp:29-55, SceneHierarchyPanel.cpp:117-212,
quirk §8.11: full agglomerative rebuild, not a refit). The TPU-native
analog is FUNCTIONAL: each edit returns a new SceneData sharing every
untouched array, with

  - the instance transform rows replaced,
  - the TLAS node bounds REFIT bottom-up (better than the reference's
    full rebuild; topology and therefore the jit shapes are unchanged,
    so no recompilation),
  - the blocked-layout entry AABBs of the touched instance re-derived
    from the stored object-space block AABBs and the chunk parents
    recomputed — triangle blocks are shared and untouched.

Caveats: the spatial (BSP-cluster) ORDER of entries is not re-sorted
(a large move
degrades traversal ordering quality, never correctness — rebuild the
scene when an instance travels far), and the per-octant skip-link
tables keep their child ordering (topological links stay correct under
bound changes; ordering is a heuristic).

set_material flips the per-instance binding and, when the emissive set
changes, rebuilds the flattened light tables (mesh lights are derived
from emissive materials, Scene.cpp:142-176) — that changes array
shapes, so a recompile follows; same-emissiveness swaps are
shape-stable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nexus_tpu.kernels.trace_hbm import CHUNK, _BIG
from nexus_tpu.scene.scene import SceneData


def _affine(m: np.ndarray):
    """(4,4)/(3,4) -> (m34, inv34, nrm) float32 (BVHInstance::SetTransform
    analog, BVHInstance.cpp:4-29)."""
    m = np.asarray(m, np.float32)
    m34 = m[:3, :] if m.shape[0] == 4 else m
    full = np.eye(4, dtype=np.float32)
    full[:3, :] = m34
    inv = np.linalg.inv(full)[:3, :].astype(np.float32)
    nrm = inv[:, :3].T.copy()
    return m34, inv, nrm


def _world_corners(lo, hi, m34):
    """Transformed AABB of (lo, hi) boxes under affine m34.
    lo/hi: (..., 3) jnp; m34: (3, 4) np/jnp. Returns (wlo, whi)."""
    outs = []
    for k in range(8):
        pick = jnp.asarray([(k >> a) & 1 for a in range(3)], bool)
        c = jnp.where(pick, hi, lo)                       # (..., 3)
        outs.append(jnp.einsum("ij,...j->...i", m34[:, :3], c)
                    + m34[:, 3])
    w = jnp.stack(outs, axis=-2)                          # (..., 8, 3)
    return w.min(axis=-2), w.max(axis=-2)


def set_transform(scene: SceneData, inst_id: int, m) -> SceneData:
    """Replace instance `inst_id`'s transform; refit TLAS + blocked
    entries. Instanced scenes only (flat scenes bake world-space
    triangles — rebuild instead)."""
    if not scene.is_instanced:
        raise ValueError("set_transform requires an instanced scene "
                         "(SceneBuilder.build_instanced)")
    t = scene.tlas
    m34, inv34, nrm = _affine(m)

    inst_m = t.inst_m.at[inst_id].set(jnp.asarray(m34))
    inst_inv = t.inst_inv.at[inst_id].set(jnp.asarray(inv34))
    inst_nrm = t.inst_nrm.at[inst_id].set(jnp.asarray(nrm))

    # ---- TLAS refit (host: the TLAS is tiny — O(instances) nodes).
    bmin = np.asarray(t.bmin).copy()
    bmax = np.asarray(t.bmax).copy()
    left_first = np.asarray(t.left_first)
    count = np.asarray(t.count)
    inst_order = np.asarray(t.inst_order)
    inst_root = np.asarray(t.inst_root)
    n_tlas = t.n_tlas_nodes
    mats = np.asarray(inst_m)

    # All instance world AABBs from their BLAS root boxes
    # (BVHInstance.cpp:4-29 semantics).
    rlo = bmin[inst_root]
    rhi = bmax[inst_root]
    corners = np.stack([np.where(
        np.array([(k >> a) & 1 for a in range(3)], bool), rhi, rlo)
        for k in range(8)], axis=1)                        # (I, 8, 3)
    w = np.einsum("nij,nkj->nki", mats[:, :, :3], corners) + \
        mats[:, None, :, 3]
    wlo = w.min(axis=1)
    whi = w.max(axis=1)

    # Bottom-up refit: children are allocated after their parent in the
    # BVH2 layout, so a reverse-index pass sees children first.
    for n in range(n_tlas - 1, -1, -1):
        if count[n] > 0:            # leaf: union of its instances
            ids = inst_order[left_first[n]:left_first[n] + count[n]]
            bmin[n] = wlo[ids].min(axis=0)
            bmax[n] = whi[ids].max(axis=0)
        else:
            l = left_first[n]
            bmin[n] = np.minimum(bmin[l], bmin[l + 1])
            bmax[n] = np.maximum(bmax[l], bmax[l + 1])

    new_tlas = t.replace(
        bmin=jnp.asarray(bmin), bmax=jnp.asarray(bmax),
        inst_m=inst_m, inst_inv=inst_inv, inst_nrm=inst_nrm)

    # ---- Blocked-layout entry refit (vectorized, device-side).
    bs = scene.blocked
    new_blocked = bs
    if bs is not None:
        ne = bs.ent_block.shape[0]
        lane_valid = jnp.arange(ne) < bs.n_entries
        sel = (bs.ent_inst == inst_id) & lane_valid
        # Entry = a group of blocks_per_entry consecutive blocks; its
        # object AABB is the union of the member blocks' AABBs.
        obj = bs.obj_aabb[bs.ent_block]                   # (NE, 6)
        olo, ohi = obj[:, :3], obj[:, 3:]
        for j in range(1, bs.blocks_per_entry):
            nxt = bs.obj_aabb[bs.ent_block + j]
            olo = jnp.minimum(olo, nxt[:, :3])
            ohi = jnp.maximum(ohi, nxt[:, 3:])
        nlo, nhi = _world_corners(olo, ohi, jnp.asarray(m34))
        # Current lo/hi out of the (NEC, 8, 128) chunk layout.
        nec = bs.aabb.shape[0]
        cur = bs.aabb.transpose(0, 2, 1).reshape(nec * CHUNK, 8)
        lo = jnp.where(sel[:, None], nlo, cur[:, 0:3])
        hi = jnp.where(sel[:, None], nhi, cur[:, 3:6])
        packed = jnp.concatenate(
            [lo, hi, jnp.zeros((ne, 2), jnp.float32)], axis=1)
        aabb = packed.reshape(nec, CHUNK, 8).transpose(0, 2, 1)
        # Chunk parents: union of live entries (padding keeps +BIG).
        live = lo[:, 0] < _BIG * 0.5
        plo = jnp.where(live[:, None], lo, _BIG).reshape(
            nec, CHUNK, 3).min(axis=1)
        phi = jnp.where(live[:, None], hi, -_BIG).reshape(
            nec, CHUNK, 3).max(axis=1)
        npc = bs.parent.shape[0]
        cpad = npc * CHUNK - nec
        plo = jnp.concatenate(
            [plo, jnp.full((cpad, 3), _BIG, jnp.float32)])
        phi = jnp.concatenate(
            [phi, jnp.full((cpad, 3), -_BIG, jnp.float32)])
        parent = jnp.concatenate(
            [plo.reshape(npc, CHUNK, 3).transpose(0, 2, 1),
             phi.reshape(npc, CHUNK, 3).transpose(0, 2, 1),
             jnp.zeros((npc, 2, CHUNK), jnp.float32)], axis=1)
        new_blocked = bs.replace(
            aabb=aabb, parent=parent,
            inst_inv=bs.inst_inv.at[inst_id].set(
                jnp.asarray(inv34.reshape(12))))

    return scene.replace(tlas=new_tlas, blocked=new_blocked)


def set_material(scene: SceneData, inst_id: int, mat_id: int) -> SceneData:
    """Rebind instance `inst_id` to material `mat_id`; re-derives the
    mesh-light tables when the emissive set changes
    (Scene.cpp:142-176 auto-registration semantics)."""
    emissive = np.asarray(
        np.max(np.asarray(scene.materials.emission), axis=-1)
        * np.asarray(scene.materials.intensity) > 0.0)

    if scene.is_instanced:
        t = scene.tlas
        old_mats = np.asarray(t.inst_mat).copy()
        new_mats = old_mats.copy()
        new_mats[inst_id] = mat_id
        scene = scene.replace(tlas=t.replace(
            inst_mat=jnp.asarray(new_mats)))
        if emissive[old_mats[inst_id]] == emissive[mat_id]:
            return scene
        # Emissive set changed: rebuild flattened light tables.
        tri_off = np.asarray(t.inst_tri_off)
        ntris_all = np.asarray(t.inst_ntris)
        starts, ntris, light_tris, light_inst = [], [], [], []
        for i in range(t.n_instances):
            if emissive[new_mats[i]]:
                starts.append(len(light_tris))
                ntris.append(int(ntris_all[i]))
                light_tris.extend(range(
                    int(tri_off[i]), int(tri_off[i] + ntris_all[i])))
                light_inst.append(i)
        n_lights = len(starts)
        if not starts:
            starts, ntris, light_tris, light_inst = [0], [0], [0], [0]
        return scene.replace(
            light_start=jnp.asarray(starts, jnp.int32),
            light_ntris=jnp.asarray(ntris, jnp.int32),
            light_tris=jnp.asarray(light_tris, jnp.int32),
            light_inst=jnp.asarray(light_inst, jnp.int32),
            n_lights=n_lights)

    # Flat scene: per-triangle binding.
    tri_inst = np.asarray(scene.tri_inst)
    tri_mat = np.asarray(scene.tri_mat).copy()
    inst_tris = np.nonzero(tri_inst == inst_id)[0]
    old_mat = int(tri_mat[inst_tris[0]]) if inst_tris.size else mat_id
    tri_mat[inst_tris] = mat_id
    # tri_attr column 24 is what the renderer actually shades from
    # (view.fetch_attr flat branch) — rebinding tri_mat/tri_meta alone
    # leaves rendering on the old material.
    tri_attr = np.asarray(scene.tri_attr).copy()
    tri_attr[inst_tris, 24] = float(mat_id)
    scene = scene.replace(
        tri_mat=jnp.asarray(tri_mat),
        tri_attr=jnp.asarray(tri_attr),
        tri_meta=jnp.stack([jnp.asarray(tri_mat, jnp.int32),
                            jnp.asarray(tri_inst, jnp.int32)], axis=-1))
    if emissive[old_mat] == emissive[mat_id]:
        return scene
    # Rebuild light tables from per-instance triangle ranges.
    starts, ntris, light_tris = [], [], []
    n_inst = int(np.asarray(scene.inst_ntris).shape[0])
    for i in range(n_inst):
        tris = np.nonzero(tri_inst == i)[0]
        if tris.size and emissive[tri_mat[tris[0]]]:
            starts.append(len(light_tris))
            ntris.append(int(tris.size))
            light_tris.extend(tris.tolist())
    n_lights = len(starts)
    if not starts:
        starts, ntris, light_tris = [0], [0], [0]
    return scene.replace(
        light_start=jnp.asarray(starts, jnp.int32),
        light_ntris=jnp.asarray(ntris, jnp.int32),
        light_tris=jnp.asarray(light_tris, jnp.int32),
        n_lights=n_lights)


def set_material_params(scene: SceneData, mat_id: int,
                        **props) -> SceneData:
    """Edit material `mat_id`'s PROPERTIES in place (functional).

    The live per-material editors of the reference's hierarchy panel
    (albedo/roughness/ior/emission/intensity/opacity sliders,
    SceneHierarchyPanel.cpp:158-208 driving
    AssetManager::InvalidateMaterial). Scalar/color edits are
    shape-stable — no recompile, the next sample just traces the new
    pytree. If the edit flips the material's EMISSIVE status, the mesh
    light tables are re-derived (Scene.cpp:142-176 semantics), which
    changes shapes and recompiles.

    props: any of albedo, roughness, ior, emission, intensity, opacity,
    eta, k (floats or 3-sequences as appropriate).
    """
    mats = scene.materials
    allowed = {"albedo", "roughness", "ior", "emission", "intensity",
               "opacity", "eta", "k"}
    bad = set(props) - allowed
    if bad:
        raise ValueError(f"unknown material properties {sorted(bad)}")

    was_emissive = bool(
        float(np.max(np.asarray(mats.emission)[mat_id])
              * np.asarray(mats.intensity)[mat_id]) > 0.0)
    new_fields = {}
    for name, value in props.items():
        arr = np.asarray(getattr(mats, name)).copy()
        arr[mat_id] = np.asarray(value, arr.dtype)
        new_fields[name] = jnp.asarray(arr)
    scene = scene.replace(materials=mats.replace(**new_fields))

    mats = scene.materials
    now_emissive = bool(
        float(np.max(np.asarray(mats.emission)[mat_id])
              * np.asarray(mats.intensity)[mat_id]) > 0.0)
    if was_emissive == now_emissive:
        return scene
    # Emissive set changed: rebuild light tables via the existing
    # binding path (set_material with the CURRENT binding recomputes
    # them from the new emissive set).
    emissive = np.asarray(
        np.max(np.asarray(mats.emission), axis=-1)
        * np.asarray(mats.intensity) > 0.0)
    if scene.is_instanced:
        t = scene.tlas
        new_mats = np.asarray(t.inst_mat)
        tri_off = np.asarray(t.inst_tri_off)
        ntris_all = np.asarray(t.inst_ntris)
        starts, ntris, light_tris, light_inst = [], [], [], []
        for i in range(t.n_instances):
            if emissive[new_mats[i]]:
                starts.append(len(light_tris))
                ntris.append(int(ntris_all[i]))
                light_tris.extend(range(
                    int(tri_off[i]), int(tri_off[i] + ntris_all[i])))
                light_inst.append(i)
        n_lights = len(starts)
        if not starts:
            starts, ntris, light_tris, light_inst = [0], [0], [0], [0]
        return scene.replace(
            light_start=jnp.asarray(starts, jnp.int32),
            light_ntris=jnp.asarray(ntris, jnp.int32),
            light_tris=jnp.asarray(light_tris, jnp.int32),
            light_inst=jnp.asarray(light_inst, jnp.int32),
            n_lights=n_lights)
    tri_inst = np.asarray(scene.tri_inst)
    tri_mat = np.asarray(scene.tri_mat)
    starts, ntris, light_tris = [], [], []
    n_inst = int(np.asarray(scene.inst_ntris).shape[0])
    for i in range(n_inst):
        tris = np.nonzero(tri_inst == i)[0]
        if tris.size and emissive[tri_mat[tris[0]]]:
            starts.append(len(light_tris))
            ntris.append(int(tris.size))
            light_tris.extend(tris.tolist())
    n_lights = len(starts)
    if not starts:
        starts, ntris, light_tris = [0], [0], [0]
    return scene.replace(
        light_start=jnp.asarray(starts, jnp.int32),
        light_ntris=jnp.asarray(ntris, jnp.int32),
        light_tris=jnp.asarray(light_tris, jnp.int32),
        n_lights=n_lights)
