"""wireframe + curvature textures (reference src/textures/
{wireframe,curvature}.cpp)."""

import os
import tempfile

import numpy as np


def test_wireframe_color_edge_vs_interior():
    import jax.numpy as jnp

    from ppg_tpu.scene.textures import TextureAtlas, wireframe_color

    atlas = TextureAtlas.empty()
    wfp = np.full((2, 8), -1.0, np.float32)
    wfp[1] = [0.1, 0.5, 1, 0, 0, 0, 1, 0]  # red edges, green interior
    atlas.wfp = jnp.asarray(wfp)
    # unit right triangle at origin: p0=(0,0,0), e1=(1,0,0), e2=(0,1,0)
    tri = jnp.asarray(np.tile(
        np.array([[0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0]], np.float32),
        (3, 1)))
    # barycentrics: on edge e1 (bv=0), centroid, near-hypotenuse
    bu = jnp.asarray([0.5, 1 / 3, 0.45])
    bv = jnp.asarray([0.0, 1 / 3, 0.45])
    col = np.asarray(wireframe_color(
        atlas, jnp.ones(3, jnp.int32), tri, bu, bv))
    assert col[0, 0] > 0.9 and col[0, 1] < 0.1       # on edge: red
    assert col[1, 1] > 0.9 and col[1, 0] < 0.1       # centroid: interior
    assert col[2, 0] > 0.5                            # near hypotenuse


def test_wireframe_renders_mixed_colors():
    from ppg_tpu.integrators.driver import make_config, render
    from ppg_tpu.scene.scene import load_scene

    xml = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="40"/>
 <transform name="toWorld"><lookAt origin="0,0,-3" target="0,0,0" up="0,1,0"/></transform>
 <sampler type="independent"/><film type="hdrfilm">
 <integer name="width" value="32"/><integer name="height" value="32"/>
 <rfilter type="box"/></film></sensor>
<shape type="sphere"><float name="radius" value="1"/>
 <bsdf type="diffuse"><texture name="reflectance" type="wireframe">
   <rgb name="edgeColor" value="1,0,0"/>
   <rgb name="interiorColor" value="0,1,0"/>
 </texture></bsdf></shape>
<emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
</scene>"""
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        p = f.name
    try:
        sc = load_scene(p)
        cfg = make_config(sc, guiding=False)
        assert cfg.has_wireframe
        img = render(sc, spp=16, chunk=1024, cfg=cfg)
    finally:
        os.unlink(p)
    assert np.isfinite(img).all()
    center = img[8:24, 8:24]
    # both edge (red) and interior (green) energy present
    assert center[..., 0].max() > 0.05
    assert center[..., 1].max() > 0.1


def test_curvature_gaussian_on_sphere():
    from ppg_tpu.scene.scene import curvature_colors
    from ppg_tpu.scene.shapes import make_sphere

    r = 0.5
    mesh = make_sphere(np.zeros(3), r)
    # K = 1/r^2 = 4 -> with scale 0.1 the red channel ~= 0.4, blue ~ 0
    col = curvature_colors(np.asarray(mesh.positions),
                           np.asarray(mesh.faces), show_k=True, scale=0.1)
    # ignore the poles (angle defect degenerates at fan apexes)
    interior = col[np.abs(np.asarray(mesh.positions)[:, 1]) < 0.9 * r]
    assert np.median(interior[:, 0]) == pytest_approx(0.4, 0.08)
    assert np.median(interior[:, 2]) < 0.02


def pytest_approx(v, tol):
    class A:
        def __eq__(self, other):
            return abs(other - v) < tol

        def __repr__(self):
            return f"approx({v}+-{tol})"

    return A()


def test_curvature_mean_on_sphere():
    from ppg_tpu.scene.scene import curvature_colors
    from ppg_tpu.scene.shapes import make_sphere

    r = 0.5
    mesh = make_sphere(np.zeros(3), r)
    # H = 1/r = 2 (positive, convex) -> scale 0.2 -> red 0.4
    col = curvature_colors(np.asarray(mesh.positions),
                           np.asarray(mesh.faces), show_k=False, scale=0.2)
    interior = col[np.abs(np.asarray(mesh.positions)[:, 1]) < 0.9 * r]
    assert np.median(interior[:, 0]) == pytest_approx(0.4, 0.08)
    assert np.median(interior[:, 2]) < 0.02
