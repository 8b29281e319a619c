"""Delta emitter (point/spot/directional) tests: NEE values against
analytic direct lighting on a diffuse plane (the reference validates
emitters via chi^2 + manual scenes; delta emitters admit closed forms)."""

import os
import tempfile

import numpy as np
import pytest

from ppg_tpu.integrators.driver import make_config, render
from ppg_tpu.scene.scene import load_scene

_SCENE = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="60"/>
 <transform name="toWorld">
  <lookat origin="0, 1.5, 3" target="0, 0, 0" up="0, 1, 0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="32"/></sampler>
 <film type="hdrfilm"><integer name="width" value="32"/>
  <integer name="height" value="32"/><rfilter type="box"/></film></sensor>
<shape type="rectangle"><transform name="toWorld">
  <rotate x="1" angle="-90"/><scale value="5"/></transform>
 <bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0.8, 0.8"/></bsdf>
</shape>
{emitter}
</scene>"""


def _render(emitter_xml, spp=48):
    with tempfile.NamedTemporaryFile(
            "w", suffix=".xml", delete=False) as f:
        f.write(_SCENE.format(emitter=emitter_xml))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False, do_nee=True)
        return render(sc, spp=spp, chunk=1024, cfg=cfg)
    finally:
        os.unlink(path)


def _center_hit():
    o = np.array([0, 1.5, 3.0])
    d = -o / np.linalg.norm(o)
    t = -o[1] / d[1]
    return o + t * d


def test_point_inverse_square():
    img = _render('<emitter type="point">'
                  '<point name="position" x="0" y="2" z="0"/>'
                  '<rgb name="intensity" value="10, 10, 10"/></emitter>')
    hit = _center_hit()
    dl = np.array([0, 2, 0.0]) - hit
    d2 = (dl * dl).sum()
    cos = (dl / np.sqrt(d2))[1]
    analytic = 0.8 / np.pi * 10.0 * cos / d2
    assert abs(img[16, 16, 0] - analytic) / analytic < 0.05


def test_directional_irradiance():
    img = _render('<emitter type="directional">'
                  '<vector name="direction" x="0" y="-1" z="0"/>'
                  '<rgb name="irradiance" value="3, 3, 3"/></emitter>')
    analytic = 0.8 / np.pi * 3.0  # cos = 1 (light straight down)
    assert abs(img[16, 16, 0] - analytic) / analytic < 0.05


def test_spot_beam_and_falloff():
    # wide spot pointing straight down from above the plane center
    img = _render(
        '<emitter type="spot">'
        '<transform name="toWorld">'
        '<lookat origin="0, 2, 0" target="0, 0, 0" up="1, 0, 0"/></transform>'
        '<float name="cutoffAngle" value="60"/>'
        '<float name="beamWidth" value="50"/>'
        '<rgb name="intensity" value="10, 10, 10"/></emitter>')
    hit = _center_hit()
    dl = np.array([0, 2, 0.0]) - hit
    d2 = (dl * dl).sum()
    cos = (dl / np.sqrt(d2))[1]
    # the center hit is ~18 deg off-axis: inside the beam -> falloff 1
    analytic = 0.8 / np.pi * 10.0 * cos / d2
    assert abs(img[16, 16, 0] - analytic) / analytic < 0.06
    # far corner pixels outside the cutoff must be black
    assert img[0, 0].max() < analytic * 0.5
