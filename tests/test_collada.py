"""COLLADA (.dae) import (reference: mitsuba/src/converter/collada.cpp
via mtsimport). A handcrafted document exercises sources/accessors,
polylist fan-triangulation, node transforms, effect materials, camera
and light instancing; the emitted XML must load and render through the
framework."""

import os
import textwrap

import numpy as np

DAE = """\
<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Y_UP</up_axis></asset>
  <library_images>
    <image id="img1"><init_from>tex.png</init_from></image>
  </library_images>
  <library_effects>
    <effect id="eff-red">
      <profile_COMMON><technique sid="common">
        <lambert><diffuse><color>0.8 0.1 0.1 1</color></diffuse></lambert>
      </technique></profile_COMMON>
    </effect>
    <effect id="eff-shiny">
      <profile_COMMON><technique sid="common">
        <phong>
          <diffuse><color>0.2 0.2 0.6 1</color></diffuse>
          <specular><color>0.4 0.4 0.4 1</color></specular>
          <shininess><float>30</float></shininess>
        </phong>
      </technique></profile_COMMON>
    </effect>
  </library_effects>
  <library_materials>
    <material id="mat-red"><instance_effect url="#eff-red"/></material>
    <material id="mat-shiny"><instance_effect url="#eff-shiny"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="quad"><mesh>
      <source id="quad-pos">
        <float_array id="quad-pos-arr" count="12">
          -1 0 -1  1 0 -1  1 0 1  -1 0 1</float_array>
        <technique_common>
          <accessor source="#quad-pos-arr" count="4" stride="3">
            <param name="X" type="float"/><param name="Y" type="float"/>
            <param name="Z" type="float"/>
          </accessor>
        </technique_common>
      </source>
      <source id="quad-n">
        <float_array id="quad-n-arr" count="3">0 1 0</float_array>
        <technique_common>
          <accessor source="#quad-n-arr" count="1" stride="3"/>
        </technique_common>
      </source>
      <vertices id="quad-v">
        <input semantic="POSITION" source="#quad-pos"/>
      </vertices>
      <polylist material="red" count="1">
        <input semantic="VERTEX" source="#quad-v" offset="0"/>
        <input semantic="NORMAL" source="#quad-n" offset="1"/>
        <vcount>4</vcount>
        <p>0 0 1 0 2 0 3 0</p>
      </polylist>
    </mesh></geometry>
    <geometry id="tri"><mesh>
      <source id="tri-pos">
        <float_array id="tri-pos-arr" count="9">0 0 0  1 0 0  0 1 0</float_array>
        <technique_common>
          <accessor source="#tri-pos-arr" count="3" stride="3"/>
        </technique_common>
      </source>
      <vertices id="tri-v">
        <input semantic="POSITION" source="#tri-pos"/>
      </vertices>
      <triangles material="shiny" count="1">
        <input semantic="VERTEX" source="#tri-v" offset="0"/>
        <p>0 1 2</p>
      </triangles>
    </mesh></geometry>
  </library_geometries>
  <library_cameras>
    <camera id="cam"><optics><technique_common>
      <perspective><yfov>40</yfov></perspective>
    </technique_common></optics></camera>
  </library_cameras>
  <library_lights>
    <light id="sun"><technique_common>
      <point><color>10 10 9</color></point>
    </technique_common></light>
  </library_lights>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node id="floor">
        <translate>0 -0.5 0</translate>
        <instance_geometry url="#quad">
          <bind_material><technique_common>
            <instance_material symbol="red" target="#mat-red"/>
          </technique_common></bind_material>
        </instance_geometry>
      </node>
      <node id="obj">
        <matrix>1 0 0 0  0 1 0 0.2  0 0 1 0  0 0 0 1</matrix>
        <node id="nested">
          <rotate>0 1 0 30</rotate>
          <instance_geometry url="#tri">
            <bind_material><technique_common>
              <instance_material symbol="shiny" target="#mat-shiny"/>
            </technique_common></bind_material>
          </instance_geometry>
        </node>
      </node>
      <node id="camnode">
        <translate>0 0.5 3</translate>
        <instance_camera url="#cam"/>
      </node>
      <node id="lightnode">
        <translate>2 3 2</translate>
        <instance_light url="#sun"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#scene"/></scene>
</COLLADA>
"""


def test_collada_roundtrip(tmp_path):
    from ppg_tpu.tools.collada import convert

    dae = os.path.join(tmp_path, "test.dae")
    with open(dae, "w") as f:
        f.write(textwrap.dedent(DAE))
    out = os.path.join(tmp_path, "out", "scene.xml")
    os.makedirs(os.path.dirname(out))
    n = convert(dae, out)
    assert n == 2

    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(out)
    # quad fan-triangulated to 2 tris + 1 tri = 3 faces
    assert sc.num_tris == 3
    # floor translated down; nested tri translated up 0.2
    ys = sc.positions[:, 1]
    assert np.isclose(ys.min(), -0.5)
    # materials: diffuse red + phong
    mt = np.asarray(sc.materials.mtype)
    assert len(set(mt.tolist())) == 2
    refl = np.asarray(sc.materials.reflectance)
    assert np.any(np.all(np.isclose(refl, [0.8, 0.1, 0.1]), axis=-1))
    # camera + point light imported
    assert sc.sensor["type"] == "perspective"
    assert len(sc.delta_emitters) == 1

    # renders finite through the framework
    from ppg_tpu.integrators.driver import make_config, render

    cfg = make_config(sc, guiding=False, max_depth=2)
    img = np.asarray(render(sc, spp=2, seed=0, cfg=cfg))
    assert np.isfinite(img).all()


def test_mtsimport_dispatches_dae(tmp_path):
    from ppg_tpu.tools import mtsimport

    dae = os.path.join(tmp_path, "t.dae")
    with open(dae, "w") as f:
        f.write(DAE)
    out = os.path.join(tmp_path, "o.xml")
    assert mtsimport.main([dae, out]) == 0
    assert os.path.exists(out)
