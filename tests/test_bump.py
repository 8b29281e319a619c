"""Bump/normal mapping test: a bump-mapped plane lit obliquely must show
shading variation that a flat plane doesn't (bumpmap.cpp semantics)."""

import os
import tempfile

import numpy as np

from ppg_tpu.integrators.driver import make_config, render
from ppg_tpu.scene.scene import load_scene

_SCENE = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="40"/>
 <transform name="toWorld">
  <lookat origin="0, 2.5, 2.5" target="0, 0, 0" up="0, 1, 0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
 <film type="hdrfilm"><integer name="width" value="32"/>
  <integer name="height" value="32"/><rfilter type="box"/></film></sensor>
<shape type="rectangle"><transform name="toWorld">
  <rotate x="1" angle="-90"/><scale value="2"/></transform>
 {bsdf}
</shape>
<emitter type="directional">
 <vector name="direction" x="0.8" y="-0.6" z="0"/>
 <rgb name="irradiance" value="4, 4, 4"/></emitter>
</scene>"""

_FLAT = '<bsdf type="diffuse"><rgb name="reflectance" value="0.7, 0.7, 0.7"/></bsdf>'
_BUMP = ('<bsdf type="bumpmap">'
         '<texture name="map" type="bitmap">'
         '<string name="filename" value="{tex}"/></texture>'
         '<bsdf type="diffuse">'
         '<rgb name="reflectance" value="0.7, 0.7, 0.7"/></bsdf></bsdf>')


def _render(bsdf_xml):
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SCENE.format(bsdf=bsdf_xml))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False, do_nee=True)
        return render(sc, spp=32, chunk=1024, cfg=cfg), sc
    finally:
        os.unlink(path)


def test_bumpmap_modulates_shading():
    from PIL import Image

    # sine-stripe height field
    x = np.arange(64)
    h = (0.5 + 0.5 * np.sin(x * np.pi / 4.0))[None, :].repeat(64, 0)
    img8 = (h * 255).astype(np.uint8)
    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as tf:
        Image.fromarray(img8).save(tf.name)
        tex = tf.name
    try:
        flat, _ = _render(_FLAT)
        bump, sc = _render(_BUMP.format(tex=tex))
        assert (np.asarray(sc.materials.tex_bump) >= 0).any()
        # same mean energy ballpark but much higher spatial variation
        f_var = flat[8:24, 8:24, 0].std()
        b_var = bump[8:24, 8:24, 0].std()
        assert b_var > 3 * max(f_var, 1e-4), (f_var, b_var)
        assert abs(bump.mean() / flat.mean() - 1.0) < 0.35
    finally:
        os.unlink(tex)
