"""EWA anisotropic texture filtering (reference:
mitsuba/include/mitsuba/render/mipmap.h:640-713, bitmap.cpp:213-232).

The TPU formulation replaces the reference's variable-texel Gaussian
loop with fixed trilinear probes along the ellipse major axis at the
minor-axis MIP level — these tests pin the properties that matter:
isotropic footprints reduce to trilinear, anisotropic footprints
preserve detail perpendicular to the major axis, and per-texture
filterType dispatch works."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from ppg_tpu.io import exr  # noqa: E402
from ppg_tpu.scene.textures import TextureAtlas, sample_atlas  # noqa: E402


def _stripe_image(n=64):
    """Horizontal stripes: value depends on v (row) only, period 8."""
    img = np.zeros((n, n, 3), np.float32)
    img[(np.arange(n) // 4) % 2 == 0, :, :] = 1.0
    return img


@pytest.fixture(scope="module")
def atlas(tmp_path_factory):
    d = tmp_path_factory.mktemp("tex")
    p = os.path.join(d, "stripes.exr")
    exr.write(p, _stripe_image())
    specs = [
        dict(_otype="bitmap", filename="stripes.exr"),  # default -> ewa
        dict(_otype="bitmap", filename="stripes.exr",
             filterType="trilinear"),
        dict(_otype="bitmap", filename="stripes.exr", filterType="nearest"),
    ]
    return TextureAtlas.build(specs, str(d))


def _duv(dx, dy):
    """[L,2] gradient pairs from scalar tuples."""
    return (jnp.asarray([dx], jnp.float32).repeat(2, 0).reshape(1, -1)
            if False else None)


def test_filter_codes(atlas):
    f = np.asarray(atlas.filt)
    assert f[1, 0] == TextureAtlas.F_EWA
    assert f[2, 0] == TextureAtlas.F_TRILINEAR
    assert f[3, 0] == TextureAtlas.F_NEAREST
    assert f[1, 1] == 20.0


def test_isotropic_duv_matches_trilinear(atlas):
    uv = jnp.asarray([[0.3, 0.4], [0.77, 0.21]], jnp.float32)
    tid = jnp.asarray([2, 2], jnp.int32)  # trilinear-mode slot
    r = 4.0 / 64.0  # 4-texel isotropic footprint
    duv = (jnp.asarray([[r, 0.0]] * 2, jnp.float32),
           jnp.asarray([[0.0, r]] * 2, jnp.float32))
    foot = jnp.asarray([[r, r]] * 2, jnp.float32)
    a = np.asarray(sample_atlas(atlas, tid, uv, duv=duv))
    b = np.asarray(sample_atlas(atlas, tid, uv, foot_uv=foot))
    assert np.allclose(a, b, atol=1e-3), (a, b)


def test_ewa_preserves_cross_axis_detail(atlas):
    # footprint strongly elongated along u; stripes vary along v only.
    # EWA should return nearly the point value; trilinear (forced to the
    # major-axis MIP level) blurs toward the 0.5 mean.
    uv = jnp.asarray([[0.5, 4.0 / 64.0 + 0.002]], jnp.float32)  # stripe=1
    major = 16.0 / 64.0
    minor = 0.5 / 64.0
    duv = (jnp.asarray([[major, 0.0]], jnp.float32),
           jnp.asarray([[0.0, minor]], jnp.float32))
    point = np.asarray(sample_atlas(atlas, jnp.asarray([1], jnp.int32), uv))
    e = np.asarray(sample_atlas(atlas, jnp.asarray([1], jnp.int32), uv,
                                duv=duv))
    t = np.asarray(sample_atlas(atlas, jnp.asarray([2], jnp.int32), uv,
                                duv=duv))
    assert abs(float(e[0, 0]) - float(point[0, 0])) < 0.25
    assert abs(float(t[0, 0]) - 0.5) < 0.2  # trilinear blurred to mean
    assert abs(float(e[0, 0]) - float(point[0, 0])) < \
        abs(float(t[0, 0]) - float(point[0, 0])) - 0.1


def test_anisotropy_clamp(atlas):
    # extreme anisotropy: minor radius is clamped to major/maxAniso, so
    # the result stays finite and bounded
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    duv = (jnp.asarray([[0.9, 0.0]], jnp.float32),
           jnp.asarray([[0.0, 1e-6]], jnp.float32))
    v = np.asarray(sample_atlas(atlas, jnp.asarray([1], jnp.int32), uv,
                                duv=duv))
    assert np.all(np.isfinite(v)) and np.all(v >= 0) and np.all(v <= 1)


def test_nearest_mode(atlas):
    # nearest returns the exact texel regardless of sub-texel position
    uv = jnp.asarray([[10.3 / 64.0, 6.7 / 64.0]], jnp.float32)
    z = jnp.zeros((1, 2), jnp.float32)
    v = np.asarray(sample_atlas(atlas, jnp.asarray([3], jnp.int32), uv,
                                duv=(z, z)))
    img = _stripe_image()
    assert np.allclose(v[0], img[6, 10], atol=2e-3), (v, img[6, 10])


def test_perspective_dir_differentials_numeric():
    from ppg_tpu.render.sensor import PerspectiveSensor

    sensor = PerspectiveSensor(
        dict(xfov=45.0, to_world=np.eye(4)), dict(width=128, height=96))
    pos = jnp.asarray([[40.0, 30.0], [90.0, 70.0], [5.0, 88.0]],
                      jnp.float32)
    o, d, *_ = sensor.sample_rays(pos)
    ddx, ddy = sensor.dir_differentials(d)
    for axis, dd in ((0, ddx), (1, ddy)):
        step = np.zeros((1, 2), np.float32)
        step[0, axis] = 1.0
        _, d2, *_ = sensor.sample_rays(pos + step)
        num = np.asarray(d2 - d)
        assert np.allclose(np.asarray(dd), num, atol=2e-3), (
            axis, np.asarray(dd), num)


def test_ewa_end_to_end_scene(tmp_path):
    """A textured scene with default (ewa) bitmaps renders finite through
    the classic wavefront with the duv plumbing engaged."""
    from ppg_tpu.integrators.driver import make_config, render
    from ppg_tpu.scene.scene import load_scene

    p = os.path.join(tmp_path, "stripes.exr")
    exr.write(p, _stripe_image())
    xml = os.path.join(tmp_path, "s.xml")
    with open(xml, "w") as f:
        f.write(f"""<scene version="0.5.0">
  <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="60"/>
    <transform name="toWorld">
      <lookat origin="0, 0.4, -2" target="0, 0, 1"/>
    </transform>
    <sampler type="independent"/>
    <film type="hdrfilm">
      <integer name="width" value="32"/><integer name="height" value="24"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <emitter type="constant"><rgb name="radiance" value="1"/></emitter>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="-90"/><scale value="50"/>
    </transform>
    <bsdf type="diffuse">
      <texture name="reflectance" type="bitmap">
        <string name="filename" value="{p}"/>
        <float name="gamma" value="1"/>
      </texture>
    </bsdf>
  </shape>
</scene>""")
    sc = load_scene(xml)
    cfg = make_config(sc, guiding=False)
    assert cfg.has_tex_ewa
    img = np.asarray(render(sc, spp=4, seed=0, cfg=cfg))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
