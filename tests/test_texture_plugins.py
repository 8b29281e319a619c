"""scale and vertexcolors texture plugins
(reference src/textures/{scale,vertexcolors}.cpp)."""

import os
import tempfile

import numpy as np

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
{shape}
<emitter type="directional"><vector name="direction" x="0" y="-1" z="0"/>
 <rgb name="irradiance" value="3.14159265, 3.14159265, 3.14159265"/>
</emitter>
</scene>"""


def _render_scene(shape_xml, spp=64):
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SCENE.format(shape=shape_xml))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False, do_nee=True)
        return render(sc, spp=spp, chunk=256, cfg=cfg)
    finally:
        os.unlink(path)


def test_scale_texture():
    """scale wraps a checkerboard: both checker colors multiplied."""
    shape = """<shape type="rectangle"><transform name="toWorld">
      <rotate x="1" angle="-90"/><scale value="2"/></transform>
     <bsdf type="diffuse">
      <texture type="scale" name="reflectance">
       <rgb name="scale" value="0.5, 1.0, 0.25"/>
       <texture type="checkerboard">
        <rgb name="color0" value="0.8, 0.8, 0.8"/>
        <rgb name="color1" value="0.8, 0.8, 0.8"/>
       </texture>
      </texture>
     </bsdf></shape>"""
    img = _render_scene(shape)
    c = img[8, 8]
    expect = np.array([0.8 * 0.5, 0.8, 0.8 * 0.25])
    assert np.all(np.abs(c - expect) < 0.03), (c, expect)


def test_vertexcolors_ply():
    """A ply quad with red/green/blue/white corners: the center pixel
    reflects the barycentric blend."""
    ply_txt = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
property uchar red
property uchar green
property uchar blue
element face 2
property list uchar int vertex_indices
end_header
-2 0 -2 255 0 0
2 0 -2 255 0 0
2 0 2 255 0 0
-2 0 2 255 0 0
3 0 2 1
3 0 3 2
"""
    scene_tpl = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld">
  <lookat origin="0, 3, 0.001" target="0, 0, 0" up="0, 1, 0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
 <film type="hdrfilm"><integer name="width" value="16"/>
  <integer name="height" value="16"/><rfilter type="box"/></film></sensor>
<shape type="ply"><string name="filename" value="{ply}"/>
 <boolean name="srgb" value="false"/>
 <bsdf type="diffuse">
  <texture type="vertexcolors" name="reflectance"/>
 </bsdf></shape>
<emitter type="directional"><vector name="direction" x="0" y="-1" z="0"/>
 <rgb name="irradiance" value="3.14159265, 3.14159265, 3.14159265"/>
</emitter>
</scene>"""
    from ppg_tpu.integrators.driver import make_config, render

    d = tempfile.mkdtemp()
    ply_path = os.path.join(d, "quad.ply")
    xml_path = os.path.join(d, "s.xml")
    with open(ply_path, "w") as f:
        f.write(ply_txt)
    with open(xml_path, "w") as f:
        f.write(scene_tpl.format(ply=ply_path))
    sc = load_scene(xml_path)
    assert sc.colors is not None
    cfg = make_config(sc, guiding=False, do_nee=True)
    assert cfg.has_vertexcolors
    img = render(sc, spp=64, chunk=256, cfg=cfg)
    # uniformly red mesh: reflectance (1, 0, 0)
    c = img[8, 8]
    assert abs(c[0] - 1.0) < 0.05 and c[1] < 0.02 and c[2] < 0.02, c
