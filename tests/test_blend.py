"""blendbsdf / mixturebsdf: stochastic child sampling with exact mixture
eval/pdf (src/bsdfs/{blendbsdf,mixturebsdf}.cpp), validated against the
analytic albedo mixture under head-on directional lighting."""

import os
import tempfile

import numpy as np

from ppg_tpu.integrators.driver import make_config, render
from ppg_tpu.scene.scene import load_scene

_SCENE = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld">
  <lookat origin="0, 2, 2.5" target="0, 0, 0" up="0, 1, 0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
 <film type="hdrfilm"><integer name="width" value="24"/>
  <integer name="height" value="24"/><rfilter type="box"/></film></sensor>
<shape type="rectangle"><transform name="toWorld">
  <rotate x="1" angle="-90"/><scale value="2"/></transform>
 {bsdf}</shape>
<emitter type="directional"><vector name="direction" x="0" y="-1" z="0"/>
 <rgb name="irradiance" value="3.14159265, 3.14159265, 3.14159265"/>
</emitter>
</scene>"""


def _render(bsdf):
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SCENE.format(bsdf=bsdf))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False, do_nee=True)
        assert cfg.has_blend
        return render(sc, spp=128, chunk=576, cfg=cfg)
    finally:
        os.unlink(path)


def test_blendbsdf_analytic():
    img = _render(
        '<bsdf type="blendbsdf"><float name="weight" value="0.25"/>'
        '<bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0, 0"/></bsdf>'
        '<bsdf type="diffuse"><rgb name="reflectance" value="0, 0, 0.8"/></bsdf>'
        '</bsdf>')
    c = img[12, 12]
    assert abs(c[0] - 0.6) < 0.04 and abs(c[2] - 0.2) < 0.03 and c[1] < 0.01


def test_mixturebsdf_analytic():
    img = _render(
        '<bsdf type="mixturebsdf"><string name="weights" value="0.5, 0.5"/>'
        '<bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0, 0"/></bsdf>'
        '<bsdf type="diffuse"><rgb name="reflectance" value="0, 0.8, 0"/></bsdf>'
        '</bsdf>')
    c = img[12, 12]
    assert abs(c[0] - 0.4) < 0.04 and abs(c[1] - 0.4) < 0.04
