"""Heterogeneous media: .vol codec roundtrip, Woodcock tracking vs the
analytic homogeneous sampler on a constant grid, ratio-tracking
transmittance, and an end-to-end hetero-vs-homogeneous render match
(reference src/medium/heterogeneous.cpp, src/volume/gridvolume.cpp)."""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from ppg_tpu import media as MED
from ppg_tpu.integrators.driver import make_config, render
from ppg_tpu.io.vol import read_vol, write_vol
from ppg_tpu.scene.scene import load_scene


def test_vol_roundtrip():
    rng = np.random.default_rng(3)
    data = rng.random((5, 6, 7)).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".vol", delete=False) as f:
        path = f.name
    try:
        write_vol(path, data, [-1, -2, -3], [1, 2, 3])
        out, bmin, bmax = read_vol(path)
    finally:
        os.unlink(path)
    assert out.shape == (5, 6, 7, 1)
    assert np.allclose(out[..., 0], data)
    assert np.allclose(bmin, [-1, -2, -3]) and np.allclose(bmax, [1, 2, 3])


def _const_media(value=1.5, scale=1.0, albedo=(0.8, 0.6, 0.4)):
    return MED.MediaArrays.from_table([dict(
        hetero=True,
        density=np.full((2, 2, 2), value, np.float32),
        bbox_min=np.array([-10.0, -10, -10]),
        bbox_max=np.array([10.0, 10, 10]),
        scale=scale, albedo=np.array(albedo), g=0.0)])


def test_density_trilinear():
    """A linear-in-x grid must interpolate exactly; outside -> 0."""
    nx = 5
    grid = np.broadcast_to(
        np.linspace(0.0, 1.0, nx, dtype=np.float32), (3, 3, nx)).copy()
    media = MED.MediaArrays.from_table([dict(
        hetero=True, density=grid,
        bbox_min=np.array([0.0, 0, 0]), bbox_max=np.array([1.0, 1, 1]),
        scale=1.0, albedo=np.full(3, 0.5), g=0.0)])
    mid = jnp.zeros(4, jnp.int32)
    row = MED.fetch_row(media, mid)
    p = jnp.asarray([[0.25, 0.5, 0.5], [0.6, 0.5, 0.5],
                     [0.5, 0.5, 0.5], [2.0, 0.5, 0.5]], jnp.float32)
    d = np.asarray(MED.density(media, row, p))
    assert np.allclose(d[:3], [0.25, 0.6, 0.5], atol=1e-5)
    assert d[3] == 0.0


def test_woodcock_matches_analytic():
    """On a CONSTANT density grid Woodcock tracking must reproduce the
    homogeneous free-flight statistics: P(surface) = exp(-sigma_t d) and
    medium-event weights sum to albedo (1 - T)."""
    n = 200_000
    media = _const_media(value=1.5)
    mid = jnp.zeros(n, jnp.int32)
    o = jnp.tile(jnp.asarray([[0.0, 0, 0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0, 0]], jnp.float32), (n, 1))
    t_surf = jnp.full(n, 1.2, jnp.float32)
    is_med, t, w = MED.woodcock_sample(media, mid, o, d, t_surf,
                                       jax.random.key(0))
    is_med = np.asarray(is_med)
    T = np.exp(-1.5 * 1.2)
    assert abs((~is_med).mean() - T) < 0.01, ((~is_med).mean(), T)
    est = np.where(is_med[:, None], np.asarray(w), 0).mean(0)
    expect = np.array([0.8, 0.6, 0.4]) * (1 - T)
    assert np.allclose(est, expect, rtol=0.03), (est, expect)
    # events distributed exponentially: mean of t | medium
    tm = np.asarray(t)[is_med]
    mean_expect = (1 / 1.5) - 1.2 * T / (1 - T)
    assert abs(tm.mean() - mean_expect) < 0.01


def test_ratio_transmittance_unbiased():
    n = 200_000
    media = _const_media(value=2.0)
    mid = jnp.zeros(n, jnp.int32)
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0, 1.0]], jnp.float32), (n, 1))
    dist = jnp.full(n, 0.9, jnp.float32)
    T = np.asarray(MED.ratio_transmittance(media, mid, o, d, dist,
                                           jax.random.key(1)))
    expect = np.exp(-2.0 * 0.9)
    assert abs(T.mean() - expect) < 0.01, (T.mean(), expect)


_SLAB = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="6"/></integrator>
<sensor type="perspective"><float name="fov" value="40"/>
 <transform name="toWorld">
  <lookat origin="0, 0, 4" target="0, 0, 0" up="0, 1, 0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
 <film type="hdrfilm"><integer name="width" value="24"/>
  <integer name="height" value="24"/><rfilter type="box"/></film></sensor>
<shape type="cube">
 <bsdf type="null"/>
 {medium}
</shape>
<shape type="rectangle"><transform name="toWorld">
  <translate z="-2"/></transform>
 <emitter type="area"><rgb name="radiance" value="5, 5, 5"/></emitter>
 <bsdf type="diffuse"/></shape>
</scene>"""


def _render_slab(medium_xml, spp=96):
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SLAB.format(medium=medium_xml))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False)
        return render(sc, spp=spp, chunk=576, cfg=cfg)
    finally:
        os.unlink(path)


def test_hetero_render_matches_homogeneous():
    """A constant heterogeneous medium (grid of 0.35, gray sigma_t, hg
    phase) must render like the equivalent homogeneous medium."""
    d = tempfile.mkdtemp()
    vol_path = os.path.join(d, "const.vol")
    write_vol(vol_path, np.full((4, 4, 4), 0.35, np.float32),
              [-1.5, -1.5, -1.5], [1.5, 1.5, 1.5])
    het = f"""<medium name="interior" type="heterogeneous">
  <volume name="density" type="gridvolume">
   <string name="filename" value="{vol_path}"/></volume>
  <volume name="albedo" type="constvolume">
   <rgb name="value" value="0.7, 0.7, 0.7"/></volume>
  <float name="scale" value="2.0"/>
  <phase type="hg"><float name="g" value="0.3"/></phase>
 </medium>"""
    hom = """<medium name="interior" type="homogeneous">
  <rgb name="sigmaT" value="0.7, 0.7, 0.7"/>
  <rgb name="albedo" value="0.7, 0.7, 0.7"/>
  <phase type="hg"><float name="g" value="0.3"/></phase>
 </medium>"""
    ih = _render_slab(het)
    io_ = _render_slab(hom)
    a = ih[8:16, 8:16].mean()
    b = io_[8:16, 8:16].mean()
    assert abs(a - b) < 0.06 * b + 0.02, (a, b)
    assert np.isfinite(ih).all()
