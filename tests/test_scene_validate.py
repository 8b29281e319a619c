"""XSD-lite validation, versioned scene upgrade, unqueried-property
warnings (reference: mitsuba/data/schema/scene.xsd + upgrade_*.xsl +
properties.h:46 unqueried-key warnings)."""

import os
import textwrap
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from ppg_tpu.scene.validate import (Props, SceneValidationError, upgrade,
                                    validate, warn_unused)
from ppg_tpu.scene.xml_parser import SceneXML


def _parse(s):
    return ET.fromstring(textwrap.dedent(s))


def _load(tmp_path, s, name="scene.xml"):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as f:
        f.write(textwrap.dedent(s))
    return SceneXML(p)


# -- structural validation ---------------------------------------------------

def test_misplaced_element_rejected():
    root = _parse("""\
        <scene version="0.5.0">
          <bsdf type="diffuse"><film type="hdrfilm"/></bsdf>
        </scene>""")
    with pytest.raises(SceneValidationError, match="not allowed inside"):
        validate(root)


def test_missing_type_attribute_rejected():
    root = _parse('<scene version="0.5.0"><shape/></scene>')
    with pytest.raises(SceneValidationError, match="'type'"):
        validate(root)


def test_missing_value_attribute_rejected():
    root = _parse("""\
        <scene version="0.5.0">
          <bsdf type="diffuse"><float name="x"/></bsdf>
        </scene>""")
    with pytest.raises(SceneValidationError, match="'value'"):
        validate(root)


def test_bad_transform_op_rejected():
    root = _parse("""\
        <scene version="0.5.0">
          <shape type="sphere">
            <transform name="toWorld"><float name="x" value="1"/></transform>
          </shape>
        </scene>""")
    with pytest.raises(SceneValidationError, match="transform operation"):
        validate(root)


def test_valid_scene_passes():
    root = _parse("""\
        <scene version="0.5.0">
          <integrator type="path"><integer name="maxDepth" value="4"/>
          </integrator>
          <sensor type="perspective">
            <sampler type="independent"/>
            <film type="hdrfilm"><rfilter type="box"/></film>
          </sensor>
          <shape type="sphere"><bsdf type="diffuse"/></shape>
        </scene>""")
    validate(root)  # no raise


def test_bundled_scenes_validate():
    ref = "/root/reference/scenes"
    if not os.path.isdir(ref):
        pytest.skip("no reference mount")
    for rel in ("cbox/cbox.xml", "cbox/cbox-improved.xml",
                "spaceship/spaceship.xml", "kitchen/kitchen.xml"):
        validate(ET.parse(os.path.join(ref, rel)).getroot(), rel)


# -- versioned upgrade -------------------------------------------------------

def test_upgrade_04_renames(tmp_path):
    xml = _load(tmp_path, """\
        <scene version="0.3.0">
          <camera type="perspective">
            <boolean name="mapSmallerSide" value="false"/>
            <float name="focusDepth" value="3.5"/>
            <transform name="toWorld">
              <translate x="1"/>
            </transform>
            <film type="exrfilm">
              <boolean name="alpha" value="true"/>
            </film>
          </camera>
          <luminaire type="area">
            <rgb name="intensity" value="1 2 3"/>
          </luminaire>
          <bsdf type="bump"/>
        </scene>""")
    sensor = xml.root.child("sensor")
    assert sensor is not None, "camera -> sensor"
    assert sensor.props["fovAxis"] == "larger"
    assert "mapSmallerSide" not in sensor.props
    assert sensor.props["focusDistance"] == 3.5
    em = xml.root.child("emitter")
    assert em is not None, "luminaire -> emitter"
    assert np.allclose(np.asarray(em.props["radiance"]), [1, 2, 3])
    film = sensor.child("film")
    assert film.otype == "hdrfilm"
    assert film.props["pixelFormat"] == "rgba"
    assert xml.root.child("bsdf").otype == "bumpmap"
    # handedness: toWorld gained a leading x-flip
    m = sensor.props["toWorld"]
    assert m[0, 0] < 0


def test_upgrade_pre03_bsdf_renames(tmp_path):
    xml = _load(tmp_path, """\
        <scene version="0.2.1">
          <bsdf type="lambertian"><rgb name="reflectance" value="0.5"/></bsdf>
          <bsdf type="mirror"/>
          <bsdf type="roughmetal"><float name="alphaB" value="0.2"/>
            <float name="ior" value="1.9"/></bsdf>
          <bsdf type="roughglass"><float name="alphaB" value="0.3"/></bsdf>
          <bsdf type="phong">
            <float name="diffuseAmount" value="0.5"/>
          </bsdf>
          <shape type="obj"><string name="filename" value="x.obj"/>
            <bsdf type="lambertian"/></shape>
          <texture type="exrtexture"/>
        </scene>""")
    types = [b.otype for b in xml.root.children_of("bsdf")]
    assert types[:4] == ["diffuse", "conductor", "roughconductor",
                         "roughdielectric"]
    mirror = xml.root.children_of("bsdf")[1]
    assert mirror.props["material"] == "Cr"
    rm = xml.root.children_of("bsdf")[2]
    assert rm.props["alpha"] == 0.2 and rm.props["eta"] == 1.9
    # phong diffuseAmount folding: 0.5 * default diffuseReflectance 0.5
    ph = xml.root.children_of("bsdf")[4]
    assert np.allclose(np.asarray(ph.props["diffuseReflectance"]), 0.25)
    assert np.allclose(np.asarray(ph.props["specularReflectance"]), 0.2)
    sh = xml.root.child("shape")
    assert sh.props["flipTexCoords"] is False
    assert xml.root.child("texture").otype == "bitmap"


def test_upgrade_noop_on_current_version():
    root = _parse('<scene version="0.5.0"><bsdf type="bump"/></scene>')
    assert not upgrade(root)
    assert root.find("bsdf").attrib["type"] == "bump"  # untouched


# -- unqueried-property warnings --------------------------------------------

def test_props_tracks_reads():
    p = Props(a=1, b=2, c=3)
    assert p["a"] == 1
    assert p.get("b") == 2
    q = p.copy()
    assert q.get("c") == 3  # read through the copy credits the original
    assert p.unread() == []


def test_unqueried_property_warns(tmp_path, caplog=None):
    from ppg_tpu.scene.scene import load_scene
    from ppg_tpu.utils import logging as L

    p = os.path.join(tmp_path, "s.xml")
    with open(p, "w") as f:
        f.write(textwrap.dedent("""\
            <scene version="0.5.0">
              <integrator type="path"/>
              <sensor type="perspective">
                <float name="fov" value="45"/>
                <sampler type="independent"/>
                <film type="hdrfilm"><rfilter type="box"/></film>
              </sensor>
              <shape type="sphere">
                <bsdf type="diffuse">
                  <rgb name="reflectance" value="0.5"/>
                  <float name="reflectanceTypo" value="0.7"/>
                </bsdf>
              </shape>
            </scene>"""))
    sc = load_scene(p)
    msgs = []
    from ppg_tpu.scene import validate as V

    orig = V.log
    V.log = lambda msg, level="info": msgs.append((level, msg))
    try:
        warn_unused(sc.xml_root, p)
    finally:
        V.log = orig
    warned = [m for lv, m in msgs if "reflectanceTypo" in m]
    assert warned, msgs
    assert not any("'reflectance'" in m for _, m in msgs)
