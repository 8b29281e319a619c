"""Sensor plugins: thinlens, orthographic, spherical
(reference src/sensors/{thinlens,orthographic,spherical}.cpp)."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from ppg_tpu.integrators.driver import make_config, render
from ppg_tpu.render.sensor import make_sensor
from ppg_tpu.scene.scene import load_scene

_SCENE = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
{sensor}
<shape type="rectangle"><transform name="toWorld">
  <rotate x="1" angle="-90"/><scale value="4"/></transform>
 <bsdf type="diffuse"><rgb name="reflectance" value="0.5, 0.5, 0.5"/></bsdf>
</shape>
<emitter type="directional"><vector name="direction" x="0" y="-1" z="0"/>
 <rgb name="irradiance" value="3.14159265, 3.14159265, 3.14159265"/>
</emitter>
</scene>"""

_FILM = """<film type="hdrfilm"><integer name="width" value="16"/>
  <integer name="height" value="16"/><rfilter type="box"/></film>
 <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>"""


def _render_with(sensor_xml, spp=32):
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SCENE.format(sensor=sensor_xml))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False, do_nee=True)
        return render(sc, spp=spp, chunk=256, cfg=cfg), sc
    finally:
        os.unlink(path)


def test_thinlens_renders_plane():
    img, _ = _render_with(
        '<sensor type="thinlens"><float name="fov" value="45"/>'
        '<float name="apertureRadius" value="0.05"/>'
        '<float name="focusDistance" value="3"/>'
        '<transform name="toWorld">'
        '<lookat origin="0, 3, 0.001" target="0, 0, 0" up="0, 1, 0"/>'
        f'</transform>{_FILM}</sensor>')
    # the focal plane IS the diffuse plane: same value as pinhole
    assert abs(img[8, 8].mean() - 0.5) < 0.03, img[8, 8]


def test_thinlens_aperture_spreads_rays():
    """With a big aperture, rays from one pixel start at distinct points
    on the lens disk and converge on the focus plane."""
    cfgs = dict(type="thinlens", to_world=np.eye(4), xfov=45.0,
                apertureRadius=0.5, focusDistance=2.0)
    film = dict(width=8, height=8)
    s = make_sensor(cfgs, film)
    pos = jnp.full((4, 2), 4.0)  # same pixel
    u = jnp.array([[0.1, 0.2], [0.9, 0.4], [0.3, 0.8], [0.6, 0.6]])
    o, d, tmin, tmax = s.sample_rays(pos, u)
    o = np.asarray(o)
    assert np.ptp(o[:, 0]) > 0.1  # distinct lens points
    # all rays meet at the focal point
    t = 2.0 / np.asarray(d)[:, 2]
    hits = o + t[:, None] * np.asarray(d)
    assert np.ptp(hits, axis=0).max() < 1e-5


def test_orthographic_parallel_rays():
    cfgs = dict(type="orthographic", to_world=np.diag([3.0, 3.0, 1.0, 1.0]))
    film = dict(width=8, height=8)
    s = make_sensor(cfgs, film)
    pos = jnp.array([[0.5, 0.5], [7.5, 7.5], [4.0, 1.0]])
    o, d, tmin, tmax = s.sample_rays(pos)
    d = np.asarray(d)
    assert np.allclose(d, d[0])  # parallel
    o = np.asarray(o)
    # extents scaled by the toWorld scale (x in [-3, 3])
    assert np.ptp(o[:, 0]) > 4.0


def test_orthographic_end_to_end():
    img, _ = _render_with(
        '<sensor type="orthographic">'
        '<transform name="toWorld">'
        '<scale x="2" y="2"/>'
        '<lookat origin="0, 3, 0" target="0, 0, 0" up="0, 0, 1"/>'
        f'</transform>{_FILM}</sensor>')
    # whole view covered by the lit plane
    assert abs(np.median(img) - 0.5) < 0.03, np.median(img)


def test_spherical_covers_sphere():
    cfgs = dict(type="spherical", to_world=np.eye(4))
    film = dict(width=32, height=16)
    s = make_sensor(cfgs, film)
    xs = np.linspace(0.5, 31.5, 32)
    ys = np.linspace(0.5, 15.5, 16)
    X, Y = np.meshgrid(xs, ys)
    pos = jnp.asarray(np.stack([X.ravel(), Y.ravel()], -1), jnp.float32)
    o, d, *_ = s.sample_rays(pos)
    d = np.asarray(d)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # both poles and all octants reached
    assert d[:, 1].max() > 0.95 and d[:, 1].min() < -0.95
    assert (d[:, 0] > 0.5).any() and (d[:, 0] < -0.5).any()
    assert (d[:, 2] > 0.5).any() and (d[:, 2] < -0.5).any()


def test_radiancemeter_reads_lambertian_wall():
    # meter at (0,1,-3) looking +z at the diffuse floor... aim straight
    # down at the lit floor: radiance = E/pi * rho = 1 * 0.5
    sensor = """<sensor type="radiancemeter">
      <transform name="toWorld">
        <lookAt origin="0, 1, 0" target="0, 0, 0" up="0, 0, 1"/>
      </transform>""" + _FILM + "</sensor>"
    img, sc = _render_with(sensor, spp=64)
    # every pixel shoots the same ray; direct light on white 0.5 albedo
    val = img.mean(axis=(0, 1))
    np.testing.assert_allclose(val, 0.5, rtol=0.1)
