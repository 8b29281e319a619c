"""sunRadiusScale=0: the sun collapses to a directional emitter with
irradiance = sunRadiance * solidAngle (sun.cpp:153-166). A diffuse
ground plane must receive the same energy either way."""

import os
import tempfile

import numpy as np
import pytest

from ppg_tpu.integrators.driver import make_config, render
from ppg_tpu.scene.scene import load_scene

_SCENE = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld">
  <lookat origin="0, 3, 0.001" target="0, 0, 0" up="0, 1, 0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
 <film type="hdrfilm"><integer name="width" value="16"/>
  <integer name="height" value="16"/><rfilter type="box"/></film></sensor>
<shape type="rectangle"><transform name="toWorld">
  <rotate x="1" angle="-90"/><scale value="50"/></transform>
 <bsdf type="diffuse"><rgb name="reflectance" value="0.6, 0.6, 0.6"/></bsdf>
</shape>
<emitter type="sun">
 <float name="sunRadiusScale" value="{srs}"/>
 <float name="turbidity" value="3"/>
 <float name="elevation" value="60"/>
</emitter>
</scene>"""


def _render(srs, spp):
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SCENE.format(srs=srs))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False, do_nee=True)
        if srs == 0:
            assert not cfg.has_env and sc.delta_emitters, \
                "sun should flatten to a directional delta emitter"
        return render(sc, spp=spp, chunk=256, cfg=cfg)
    finally:
        os.unlink(path)


def test_directional_sun_matches_disk_sun():
    disk = _render(1.0, spp=96)
    direc = _render(0.0, spp=16)  # delta light: no MC noise from NEE
    a = disk[8, 8]
    b = direc[8, 8]
    assert np.isfinite(b).all() and b.mean() > 0
    rel = np.abs(a - b) / np.maximum(b, 1e-9)
    assert rel.max() < 0.08, (a, b)


def test_collimated_parses_and_warns():
    scene = _SCENE.replace(
        '<emitter type="sun">\n <float name="sunRadiusScale" value="{srs}"/>'
        '\n <float name="turbidity" value="3"/>'
        '\n <float name="elevation" value="60"/>\n</emitter>',
        '<emitter type="collimated"><rgb name="power" value="1,1,1"/>'
        '</emitter>')
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(scene)
        path = f.name
    try:
        with pytest.warns(UserWarning, match="collimated"):
            sc = load_scene(path)
        assert not sc.delta_emitters and sc.env_emitter is None
    finally:
        os.unlink(path)
