"""Shape plugin coverage: ply / serialized loaders, cylinder
tessellation, instance/shapegroup flattening."""

import os
import struct
import tempfile
import zlib

import numpy as np

from ppg_tpu.io.ply import load_ply
from ppg_tpu.io.serialized import load_serialized, save_serialized
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.scene.shapes import make_cylinder

QUAD_POS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
QUAD_FACES = np.array([[0, 1, 2], [2, 3, 0]], np.int32)


def test_ply_ascii():
    txt = """ply
format ascii 1.0
comment a quad
element vertex 4
property float x
property float y
property float z
property float nx
property float ny
property float nz
property float u
property float v
element face 1
property list uchar int vertex_indices
end_header
0 0 0 0 0 1 0 0
1 0 0 0 0 1 1 0
1 1 0 0 0 1 1 1
0 1 0 0 0 1 0 1
4 0 1 2 3
"""
    with tempfile.NamedTemporaryFile("w", suffix=".ply", delete=False) as f:
        f.write(txt)
        path = f.name
    try:
        m = load_ply(path)
    finally:
        os.unlink(path)
    assert np.allclose(m["positions"], QUAD_POS)
    # quad fan-triangulated into 2 triangles
    assert m["faces"].shape == (2, 3)
    assert np.allclose(m["normals"][:, 2], 1.0)
    assert np.allclose(m["texcoords"], QUAD_POS[:, :2])


def _write_binary_ply(path, endian="<"):
    fmt = ("binary_little_endian" if endian == "<"
           else "binary_big_endian")
    header = f"""ply
format {fmt} 1.0
element vertex 4
property float x
property float y
property float z
property uchar red
property uchar green
property uchar blue
element face 2
property list uchar uint vertex_indices
end_header
""".encode()
    body = b""
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    for p, c in zip(QUAD_POS, colors):
        body += struct.pack(endian + "3f", *p) + bytes(c)
    for tri in QUAD_FACES:
        body += struct.pack(endian + "B3I", 3, *tri)
    with open(path, "wb") as f:
        f.write(header + body)


def test_ply_binary_both_endians():
    for endian in ("<", ">"):
        with tempfile.NamedTemporaryFile(suffix=".ply", delete=False) as f:
            path = f.name
        try:
            _write_binary_ply(path, endian)
            m = load_ply(path)
        finally:
            os.unlink(path)
        assert np.allclose(m["positions"], QUAD_POS), endian
        assert np.array_equal(m["faces"], QUAD_FACES), endian
        assert np.allclose(m["colors"][0], [1, 0, 0]), endian


def test_serialized_roundtrip_multimesh():
    meshes = [
        dict(positions=QUAD_POS, faces=QUAD_FACES,
             normals=np.tile([0.0, 0, 1], (4, 1)),
             texcoords=QUAD_POS[:, :2], name="quad"),
        dict(positions=QUAD_POS * 2.0, faces=QUAD_FACES,
             face_normals=True, name="quad2"),
    ]
    with tempfile.NamedTemporaryFile(suffix=".serialized", delete=False) as f:
        path = f.name
    try:
        save_serialized(path, meshes)
        m0 = load_serialized(path, 0)
        m1 = load_serialized(path, 1)
    finally:
        os.unlink(path)
    assert np.allclose(m0["positions"], QUAD_POS)
    assert np.allclose(m0["normals"][:, 2], 1.0)
    assert m0["name"] == "quad"
    assert not m0["face_normals"]
    assert np.allclose(m1["positions"], QUAD_POS * 2.0)
    assert m1["face_normals"] and m1["normals"] is None


def test_cylinder_geometry():
    m = make_cylinder([0, 0, 0], [0, 0, 2.0], 0.5, subdiv=128)
    r = np.linalg.norm(m.positions[:, :2], axis=-1)
    assert np.allclose(r, 0.5, atol=1e-9)
    assert m.positions[:, 2].min() == 0.0 and m.positions[:, 2].max() == 2.0
    # outward normals
    d = (m.normals[:, :2] * m.positions[:, :2]).sum(-1)
    assert np.all(d > 0)
    fn, areas = m.face_normals_areas()
    assert abs(areas.sum() - 2 * np.pi * 0.5 * 2.0) < 1e-3


_INSTANCE_SCENE = """<scene version="0.5.0">
<shape type="shapegroup" id="grp">
 <shape type="rectangle">
  <bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0.1, 0.1"/></bsdf>
 </shape>
</shape>
<shape type="instance"><ref id="grp"/>
 <transform name="toWorld"><translate x="-3"/></transform></shape>
<shape type="instance"><ref id="grp"/>
 <transform name="toWorld"><translate x="3"/></transform></shape>
</scene>"""


def test_instance_flattening():
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_INSTANCE_SCENE)
        path = f.name
    try:
        sc = load_scene(path)
    finally:
        os.unlink(path)
    # two instances x 2 triangles, the group itself is not emitted
    assert sc.num_tris == 4
    xs = sc.positions[:, 0]
    assert xs.min() == -4 and xs.max() == 4
    # material shared via the group's nested bsdf
    assert np.allclose(sc.materials.reflectance[sc.tri_mat[0]],
                       [0.8, 0.1, 0.1])


def test_ply_scene_end_to_end():
    """A ply quad lit head-on renders like the rectangle baseline."""
    ply_txt = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 2
property list uchar int vertex_indices
end_header
-2 0 -2
2 0 -2
2 0 2
-2 0 2
3 0 2 1
3 0 3 2
"""
    scene_tpl = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld">
  <lookat origin="0, 3, 0.001" target="0, 0, 0" up="0, 1, 0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
 <film type="hdrfilm"><integer name="width" value="16"/>
  <integer name="height" value="16"/><rfilter type="box"/></film></sensor>
<shape type="ply"><string name="filename" value="{ply}"/>
 <bsdf type="diffuse"><rgb name="reflectance" value="0.5, 0.5, 0.5"/></bsdf>
</shape>
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
    cfg = make_config(sc, guiding=False, do_nee=True)
    img = render(sc, spp=64, chunk=256, cfg=cfg)
    assert abs(img[8, 8].mean() - 0.5) < 0.02, img[8, 8]


def test_heightfield_shape(tmp_path):
    import numpy as np

    from ppg_tpu.scene.scene import load_scene

    from PIL import Image

    h = (np.arange(16)[None, :] * np.ones((16, 1)) * 16).astype(np.uint8)
    Image.fromarray(h, mode="L").save(tmp_path / "h.png")
    xml = """<scene version="0.5.0">
<integrator type="path"/>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld"><lookAt origin="8,8,30" target="8,8,0" up="0,1,0"/></transform>
 <sampler type="independent"/><film type="hdrfilm">
 <integer name="width" value="8"/><integer name="height" value="8"/><rfilter type="box"/></film></sensor>
<shape type="heightfield">
 <string name="filename" value="h.png"/>
 <float name="scale" value="4"/>
 <bsdf type="diffuse"/></shape>
</scene>"""
    p = tmp_path / "s.xml"
    p.write_text(xml)
    sc = load_scene(str(p))
    assert sc.num_tris == 2 * 15 * 15
    # ramp along x scaled by 4: max height = 4 * (15*16/255)
    zmax = sc.positions[:, 2].max()
    assert abs(zmax - 4 * (15 * 16) / 255) < 0.05
    assert sc.positions[:, 0].max() == 15 and sc.positions[:, 1].max() == 15


def test_hair_shape(tmp_path):
    import numpy as np

    from ppg_tpu.scene.scene import load_scene

    # two fibers in the text format, blank-line separated
    (tmp_path / "f.hair").write_text(
        "0 0 0\n0 0 1\n0 0 2\n\n1 0 0\n1 0 1\n")
    xml = """<scene version="0.5.0">
<integrator type="path"/>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld"><lookAt origin="0,4,1" target="0,0,1" up="0,0,1"/></transform>
 <sampler type="independent"/><film type="hdrfilm">
 <integer name="width" value="8"/><integer name="height" value="8"/><rfilter type="box"/></film></sensor>
<shape type="hair">
 <string name="filename" value="f.hair"/>
 <float name="radius" value="0.05"/>
 <bsdf type="diffuse"/></shape>
</scene>"""
    p = tmp_path / "s.xml"
    p.write_text(xml)
    sc = load_scene(str(p))
    # 3 segments x (4 sides x 2 tris)
    assert sc.num_tris == 3 * 8
    # tube radius respected
    r = np.linalg.norm(sc.positions[:16, :2] - [0, 0], axis=-1)
    np.testing.assert_allclose(r, 0.05, atol=1e-6)


def test_hair_binary_roundtrip(tmp_path):
    import struct

    import numpy as np

    from ppg_tpu.io.hair import load_hair

    buf = b"BINARY_HAIR" + struct.pack("<I", 4)
    inf = struct.pack("<f", float("inf"))
    pts = [(0, 0, 0), (0, 0, 1), (5, 0, 0), (5, 0, 1)]
    data = inf + struct.pack("<3f", *pts[0]) + struct.pack("<3f", *pts[1])
    data += inf + struct.pack("<3f", *pts[2]) + struct.pack("<3f", *pts[3])
    (tmp_path / "b.hair").write_bytes(buf + data)
    v, s = load_hair(str(tmp_path / "b.hair"))
    np.testing.assert_allclose(v, pts)
    assert list(s) == [True, False, True, False]
