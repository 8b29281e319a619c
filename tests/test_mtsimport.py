"""mtsimport OBJ->XML converter (reference src/converter/obj.cpp): the
converted scene must load and render with the source materials."""

import os
import tempfile

import numpy as np


def test_obj_roundtrip_renders(tmp_path):
    obj = tmp_path / "box.obj"
    mtl = tmp_path / "box.mtl"
    mtl.write_text(
        "newmtl red\nKd 0.7 0.1 0.1\n"
        "newmtl gray\nKd 0.5 0.5 0.5\n")
    obj.write_text(
        "mtllib box.mtl\n"
        "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\n"
        "v -1 2 -1\nv 1 2 -1\nv 1 2 1\nv -1 2 1\n"
        "usemtl gray\nf 1 2 3 4\n"
        "usemtl red\nf 5 8 7 6\n")
    out = tmp_path / "scene.xml"

    from ppg_tpu.tools.mtsimport import convert

    n = convert(str(obj), str(out))
    assert n == 2
    assert (tmp_path / "meshes" / "box_0.serialized").exists()

    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(str(out))
    assert sc.num_tris == 4


def test_mtl_mask_and_texture_mapping(tmp_path):
    from ppg_tpu.tools.mtsimport import parse_mtl, _material_xml

    mtl = tmp_path / "m.mtl"
    mtl.write_text("newmtl leaf\nKd 0.2 0.6 0.2\nmap_Kd leaf.png\n"
                   "map_d leaf_alpha.png\n")
    mats = parse_mtl(str(mtl))
    xml = _material_xml("leaf", mats["leaf"])
    assert 'type="mask"' in xml
    assert "leaf_alpha.png" in xml
    assert "leaf.png" in xml
