"""COLLADA (.dae) and 3DS (.3ds) importers: round-trips against
in-test writers (no model assets exist in this environment, so the
tests construct spec-conformant files — the same strategy as
tests/test_fbx.py). Covers: source/accessor indirection, polylist fan
triangulation, per-input index offsets with corner re-indexing, node
transform composition in document order, instance_node reuse, up-axis
and unit conversion, the RGB_ZERO transparency inversion, the
texture→sampler→surface→image chain, 3DS chunk skipping, Z-up
conversion, and per-material face groups."""

import struct

import numpy as np
import pytest

from nexus_tpu.io import dae, tds

NS = "http://www.collada.org/2005/11/COLLADASchema"


def _dae_doc(body, up="Y_UP", meter="1.0"):
    return f"""<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="{NS}" version="1.4.1">
  <asset><unit meter="{meter}"/><up_axis>{up}</up_axis></asset>
  {body}
</COLLADA>"""


def _quad_geometry(gid="quadgeo"):
    """Unit quad in the XY plane (two source streams + uv), polylist."""
    return f"""
  <library_geometries>
    <geometry id="{gid}"><mesh>
      <source id="{gid}-pos">
        <float_array id="{gid}-pos-arr" count="12">
          0 0 0  1 0 0  1 1 0  0 1 0</float_array>
        <technique_common>
          <accessor source="#{gid}-pos-arr" count="4" stride="3">
            <param name="X" type="float"/><param name="Y" type="float"/>
            <param name="Z" type="float"/></accessor>
        </technique_common>
      </source>
      <source id="{gid}-nrm">
        <float_array id="{gid}-nrm-arr" count="3">0 0 1</float_array>
        <technique_common>
          <accessor source="#{gid}-nrm-arr" count="1" stride="3"/>
        </technique_common>
      </source>
      <source id="{gid}-uv">
        <float_array id="{gid}-uv-arr" count="8">
          0 0  1 0  1 1  0 1</float_array>
        <technique_common>
          <accessor source="#{gid}-uv-arr" count="4" stride="2"/>
        </technique_common>
      </source>
      <vertices id="{gid}-vtx">
        <input semantic="POSITION" source="#{gid}-pos"/>
      </vertices>
      <polylist material="MAT" count="1">
        <input semantic="VERTEX" source="#{gid}-vtx" offset="0"/>
        <input semantic="NORMAL" source="#{gid}-nrm" offset="1"/>
        <input semantic="TEXCOORD" source="#{gid}-uv" offset="2" set="0"/>
        <vcount>4</vcount>
        <p>0 0 0  1 0 1  2 0 2  3 0 3</p>
      </polylist>
    </mesh></geometry>
  </library_geometries>"""


def test_dae_polylist_triangulation_and_attributes(tmp_path):
    body = _quad_geometry() + """
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n1"><instance_geometry url="#quadgeo"/></node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>"""
    p = tmp_path / "quad.dae"
    p.write_text(_dae_doc(body))
    meshes, mats = dae.load(p)
    assert len(meshes) == 1 and mats == []
    m = meshes[0]
    assert m.faces.shape == (2, 3)           # quad fan-triangulated
    assert m.positions.shape == (4, 3)       # corners re-indexed
    assert m.normals.shape == (4, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4)
    assert m.uvs.shape == (4, 2)
    assert m.material == -1
    np.testing.assert_allclose(m.transform, np.eye(4))


def test_dae_node_transform_document_order(tmp_path):
    """translate→rotate→scale compose in document order: the local
    point (1,0,0) lands at T + R·S·p."""
    body = _quad_geometry() + """
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n1">
        <translate>10 20 30</translate>
        <rotate>0 0 1 90</rotate>
        <scale>2 2 2</scale>
        <instance_geometry url="#quadgeo"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>"""
    p = tmp_path / "t.dae"
    p.write_text(_dae_doc(body))
    (m,), _ = dae.load(p)
    pt = m.transform[:3, :3] @ np.array([1.0, 0, 0]) + m.transform[:3, 3]
    # scale → (2,0,0); rotate 90° about Z → (0,2,0); translate.
    np.testing.assert_allclose(pt, [10, 22, 30], atol=1e-5)


def test_dae_up_axis_and_unit(tmp_path):
    """Z_UP converts (x,y,z)→(x,z,−y); unit meter scales everything."""
    body = _quad_geometry() + """
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n1">
        <translate>1 2 3</translate>
        <instance_geometry url="#quadgeo"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>"""
    p = tmp_path / "zup.dae"
    p.write_text(_dae_doc(body, up="Z_UP", meter="0.01"))
    (m,), _ = dae.load(p)
    origin = m.transform[:3, 3]
    np.testing.assert_allclose(origin, [0.01, 0.03, -0.02], atol=1e-7)


def test_dae_instance_node_reuse(tmp_path):
    body = _quad_geometry() + """
  <library_nodes>
    <node id="shared"><instance_geometry url="#quadgeo"/></node>
  </library_nodes>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="a"><translate>1 0 0</translate>
        <instance_node url="#shared"/></node>
      <node id="b"><translate>2 0 0</translate>
        <instance_node url="#shared"/></node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>"""
    p = tmp_path / "inst.dae"
    p.write_text(_dae_doc(body))
    meshes, _ = dae.load(p)
    assert len(meshes) == 2
    xs = sorted(m.transform[0, 3] for m in meshes)
    np.testing.assert_allclose(xs, [1.0, 2.0])


def test_dae_materials_and_texture_chain(tmp_path):
    body = _quad_geometry() + """
  <library_images>
    <image id="img1"><init_from>file://wood.png</init_from></image>
  </library_images>
  <library_effects>
    <effect id="fx-red"><profile_COMMON>
      <technique sid="common"><phong>
        <diffuse><color>1 0 0 1</color></diffuse>
        <emission><color>0 0.5 0 1</color></emission>
        <shininess><float>100</float></shininess>
        <index_of_refraction><float>1.5</float></index_of_refraction>
        <transparent opaque="RGB_ZERO"><color>1 1 1 1</color></transparent>
        <transparency><float>0.6</float></transparency>
      </phong></technique>
    </profile_COMMON></effect>
    <effect id="fx-tex"><profile_COMMON>
      <newparam sid="surf1"><surface type="2D">
        <init_from>img1</init_from></surface></newparam>
      <newparam sid="samp1"><sampler2D>
        <source>surf1</source></sampler2D></newparam>
      <technique sid="common"><lambert>
        <diffuse><texture texture="samp1" texcoord="uv0"/></diffuse>
      </lambert></technique>
    </profile_COMMON></effect>
  </library_effects>
  <library_materials>
    <material id="mat-red" name="red">
      <instance_effect url="#fx-red"/></material>
    <material id="mat-tex" name="wood">
      <instance_effect url="#fx-tex"/></material>
  </library_materials>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n1">
        <instance_geometry url="#quadgeo">
          <bind_material><technique_common>
            <instance_material symbol="MAT" target="#mat-red"/>
          </technique_common></bind_material>
        </instance_geometry>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>"""
    p = tmp_path / "mats.dae"
    p.write_text(_dae_doc(body))
    meshes, mats = dae.load(p)
    assert [m.name for m in mats] == ["red", "wood"]
    red, wood = mats
    np.testing.assert_allclose(red.diffuse, (1, 0, 0))
    np.testing.assert_allclose(red.emission, (0, 0.5, 0))
    assert red.ior == 1.5 and red.shininess == 100
    # RGB_ZERO inverts: opacity = 1 - 0.6.
    assert abs(red.opacity - 0.4) < 1e-6
    assert wood.map_kd == "wood.png"         # chain resolved
    assert meshes[0].material == 0           # symbol MAT → mat-red


def test_dae_loader_integration(tmp_path):
    from nexus_tpu.io.loader import add_model
    from nexus_tpu.scene.materials import DIELECTRIC
    from nexus_tpu.scene.scene import SceneBuilder

    body = _quad_geometry() + """
  <library_effects>
    <effect id="fx"><profile_COMMON><technique sid="c"><phong>
      <diffuse><color>0.2 0.4 0.6 1</color></diffuse>
      <index_of_refraction><float>1.5</float></index_of_refraction>
      <transparency><float>0.3</float></transparency>
    </phong></technique></profile_COMMON></effect>
  </library_effects>
  <library_materials>
    <material id="glassmat"><instance_effect url="#fx"/></material>
  </library_materials>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n1">
        <instance_geometry url="#quadgeo">
          <bind_material><technique_common>
            <instance_material symbol="MAT" target="#glassmat"/>
          </technique_common></bind_material>
        </instance_geometry>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>"""
    p = tmp_path / "scene.dae"
    p.write_text(_dae_doc(body))
    b = SceneBuilder()
    ids = add_model(b, p)
    assert len(ids) == 1
    b.set_camera(position=(0.5, 0.5, 3), look_at=(0.5, 0.5, 0),
                 hfov_deg=45, width=16, height=16)
    scene = b.build()
    assert scene.tri_count == 2
    # Transmissive COMMON effect converts to DIELECTRIC (loader
    # heuristics, io/loader.py _add_dae).
    mtypes = np.asarray(b.materials.build().mtype)
    assert DIELECTRIC in mtypes


def test_dae_no_scene_falls_back_to_geometries(tmp_path):
    p = tmp_path / "bare.dae"
    p.write_text(_dae_doc(_quad_geometry()))
    meshes, _ = dae.load(p)
    assert len(meshes) == 1 and meshes[0].faces.shape == (2, 3)


# ---------------------------------------------------------------- 3DS --

def _c(cid, body=b"", children=b""):
    payload = body + children
    return struct.pack("<HI", cid, 6 + len(payload)) + payload


def _tds_file(tmp_path, with_material=True, extra_editor=b""):
    """Two triangles (a quad split) with a material face group."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)                        # Z-up plane
    vert_body = struct.pack("<H", 4) + verts.tobytes()
    faces = np.array([[0, 1, 2, 0], [0, 2, 3, 0]], np.uint16)
    matgrp = (b"red\x00" + struct.pack("<H", 1)
              + np.array([0], np.uint16).tobytes())
    face_body = (struct.pack("<H", 2) + faces.tobytes()
                 + _c(0x4130, matgrp))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    uv_body = struct.pack("<H", 4) + uvs.tobytes()
    trimesh = _c(0x4100, b"", _c(0x4110, vert_body)
                 + _c(0x4120, face_body) + _c(0x4140, uv_body))
    obj = _c(0x4000, b"plane\x00", trimesh)
    mat = _c(0xAFFF, b"",
             _c(0xA000, b"red\x00")
             + _c(0xA020, b"", _c(0x0010,
                                  np.array([1, 0, 0], np.float32).tobytes()))
             + _c(0xA040, b"", _c(0x0030, struct.pack("<H", 40)))
             + _c(0xA050, b"", _c(0x0031, struct.pack("<f", 25.0)))
             + _c(0xA200, b"", _c(0xA300, b"tex.png\x00")))
    editor_children = (mat if with_material else b"") + obj + extra_editor
    data = _c(0x4D4D, b"", _c(0x3D3D, b"", editor_children))
    p = tmp_path / "plane.3ds"
    p.write_bytes(data)
    return p


def test_3ds_roundtrip(tmp_path):
    p = _tds_file(tmp_path)
    meshes, mats = tds.load(p)
    assert len(meshes) == 1 and len(mats) == 1
    m = meshes[0]
    assert m.name == "plane"
    assert m.faces.shape == (2, 3)
    # Z-up → Y-up: (0,1,0) becomes (0,0,-1).
    np.testing.assert_allclose(
        m.positions, [[0, 0, 0], [1, 0, 0], [1, 0, -1], [0, 0, -1]])
    assert m.uvs.shape == (4, 2)
    np.testing.assert_array_equal(m.face_material, [0, -1])
    mat = mats[0]
    assert mat.name == "red"
    np.testing.assert_allclose(mat.diffuse, (1, 0, 0))
    assert abs(mat.shininess - 0.4) < 1e-6
    assert abs(mat.opacity - 0.75) < 1e-6    # 25% transparency
    assert mat.map_kd == "tex.png"


def test_3ds_skips_unknown_chunks(tmp_path):
    # A keyframer block and an unknown editor chunk must not derail.
    extra = _c(0xB000, b"\x00" * 10) + _c(0x7001, b"\x01\x02")
    p = _tds_file(tmp_path, extra_editor=extra)
    meshes, _ = tds.load(p)
    assert len(meshes) == 1


def test_3ds_rejects_non_3ds(tmp_path):
    p = tmp_path / "bad.3ds"
    p.write_bytes(b"not a 3ds file")
    with pytest.raises(ValueError, match="0x4D4D"):
        tds.load(p)


def test_3ds_loader_integration(tmp_path):
    from nexus_tpu.io.loader import add_model
    from nexus_tpu.scene.scene import SceneBuilder

    p = _tds_file(tmp_path)
    b = SceneBuilder()
    ids = add_model(b, p)
    # Two face groups: material "red" (face 0) + default (face 1).
    assert len(ids) == 2
    b.set_camera(position=(0.5, 2, 0.5), look_at=(0.5, 0, -0.5),
                 hfov_deg=45, width=16, height=16)
    scene = b.build()
    assert scene.tri_count == 2


def test_fail_fast_names_new_formats(tmp_path):
    from nexus_tpu.io.loader import add_model
    from nexus_tpu.scene.scene import SceneBuilder

    bad = tmp_path / "model.blend"
    bad.write_bytes(b"BLENDER")
    with pytest.raises(ValueError) as e:
        add_model(SceneBuilder(), bad)
    for tok in (".dae", ".3ds", ".fbx", "glTF"):
        assert tok in str(e.value)


def test_dae_extra_input_sets_keep_stride(tmp_path):
    """Dropped inputs (2nd TEXCOORD set, COLOR) still count toward the
    <p> stride — skipping one misparses the whole index stream
    (round-5 review finding)."""
    gid = "g"
    body = f"""
  <library_geometries>
    <geometry id="{gid}"><mesh>
      <source id="{gid}-pos">
        <float_array id="{gid}-pos-arr" count="9">
          0 0 0  1 0 0  0 1 0</float_array>
        <technique_common>
          <accessor source="#{gid}-pos-arr" count="3" stride="3"/>
        </technique_common>
      </source>
      <source id="{gid}-uv">
        <float_array id="{gid}-uv-arr" count="6">0 0 1 0 0 1</float_array>
        <technique_common>
          <accessor source="#{gid}-uv-arr" count="3" stride="2"/>
        </technique_common>
      </source>
      <vertices id="{gid}-vtx">
        <input semantic="POSITION" source="#{gid}-pos"/>
      </vertices>
      <triangles count="1">
        <input semantic="VERTEX" source="#{gid}-vtx" offset="0"/>
        <input semantic="TEXCOORD" source="#{gid}-uv" offset="1" set="0"/>
        <input semantic="TEXCOORD" source="#{gid}-uv" offset="2" set="1"/>
        <input semantic="COLOR" source="#{gid}-uv" offset="3"/>
        <p>0 0 2 1  1 1 1 2  2 2 0 0</p>
      </triangles>
    </mesh></geometry>
  </library_geometries>"""
    p = tmp_path / "multiset.dae"
    p.write_text(_dae_doc(body))
    meshes, _ = dae.load(p)
    assert len(meshes) == 1
    m = meshes[0]
    assert m.faces.shape == (1, 3)
    assert m.positions.shape == (3, 3)
    # First TEXCOORD set wins: corner uvs are (0,0),(1,0),(0,1)
    # indexed 0,1,2 via offset 1 — not the set-1/COLOR columns.
    np.testing.assert_allclose(
        m.uvs[m.faces[0]], [[0, 0], [1, 0], [0, 1]])


def test_dae_empty_source_skips_attribute(tmp_path):
    """A declared input whose <float_array> is empty loses only that
    attribute; the geometry itself still loads (the module's fail-soft
    contract). Regression: data[np.clip(idx, 0, -1)] on the 0-row
    array raised IndexError and aborted the whole load."""
    body = """
  <library_geometries>
    <geometry id="egeo"><mesh>
      <source id="egeo-pos">
        <float_array id="egeo-pos-arr" count="9">
          0 0 0  1 0 0  0 1 0</float_array>
        <technique_common>
          <accessor source="#egeo-pos-arr" count="3" stride="3"/>
        </technique_common>
      </source>
      <source id="egeo-nrm">
        <float_array id="egeo-nrm-arr" count="0"></float_array>
        <technique_common>
          <accessor source="#egeo-nrm-arr" count="0" stride="3"/>
        </technique_common>
      </source>
      <vertices id="egeo-vtx">
        <input semantic="POSITION" source="#egeo-pos"/>
      </vertices>
      <polylist count="1">
        <input semantic="VERTEX" source="#egeo-vtx" offset="0"/>
        <input semantic="NORMAL" source="#egeo-nrm" offset="1"/>
        <vcount>3</vcount>
        <p>0 0  1 0  2 0</p>
      </polylist>
    </mesh></geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n1"><instance_geometry url="#egeo"/></node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>"""
    p = tmp_path / "empty_nrm.dae"
    p.write_text(_dae_doc(body))
    (m,), _ = dae.load(p)
    assert m.faces.shape == (1, 3)
    assert m.positions.shape == (3, 3)
    assert m.normals is None          # attribute skipped, not fatal
