"""End-to-end renders with coating / roughcoating / hk materials,
validated against analytic single-bounce expectations (the same
head-on-directional-light setup as test_blend.py)."""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ppg_tpu.integrators.driver import make_config, render
from ppg_tpu.scene.scene import load_scene

_SCENE = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld">
  <lookat origin="{origin}" target="0, 0, 0" up="0, 1, 0"/></transform>
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


def _render(bsdf, spp=128, origin="0, 3, 0.001", **cfg_over):
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SCENE.format(bsdf=bsdf, origin=origin))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False, do_nee=True, **cfg_over)
        return render(sc, spp=spp, chunk=576, cfg=cfg)
    finally:
        os.unlink(path)


def _fresnel(c, eta):
    ct = np.sqrt(max(1.0 - (1.0 - c * c) / (eta * eta), 0.0))
    rs = (c - eta * ct) / (c + eta * ct)
    rp = (eta * c - ct) / (eta * c + ct)
    return 0.5 * (rs * rs + rp * rp)


def test_coating_diffuse_analytic():
    """Normal-incidence coated diffuse: L = rho (1-R0)^2 / eta^2
    (Weidlich-Wilkie; the delta interface lobe cannot see a directional
    emitter so only the refracted diffuse term contributes)."""
    img = _render(
        '<bsdf type="coating">'
        '<bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0.6, 0.4"/>'
        '</bsdf></bsdf>')
    eta = 1.5046 / 1.000277
    r0 = _fresnel(1.0, eta)
    expect = np.array([0.8, 0.6, 0.4]) * (1 - r0) ** 2 / eta**2
    c = img[12, 12]
    assert np.all(np.abs(c - expect) < 0.05 * expect + 0.01), (c, expect)


def test_coating_absorption():
    """A tinted coat attenuates by exp(-2 sigmaA d) at normal incidence."""
    base = _render(
        '<bsdf type="coating">'
        '<bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0.8, 0.8"/>'
        '</bsdf></bsdf>')
    tinted = _render(
        '<bsdf type="coating">'
        '<rgb name="sigmaA" value="0.2, 0.5, 1.0"/>'
        '<float name="thickness" value="1.0"/>'
        '<bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0.8, 0.8"/>'
        '</bsdf></bsdf>')
    # refracted path length at normal incidence = 2 * thickness
    ratio = tinted[12, 12] / np.maximum(base[12, 12], 1e-9)
    expect = np.exp(-2.0 * np.array([0.2, 0.5, 1.0]))
    assert np.all(np.abs(ratio - expect) < 0.06), (ratio, expect)


def test_roughcoating_runs_close_to_smooth():
    """A nearly-smooth roughcoating approaches the smooth coating limit.

    The camera sits 45 degrees off the light's mirror direction so the
    near-specular glossy highlight (which the smooth coat's delta lobe
    cannot transport against a delta emitter) misses the view and only
    the refracted nested-diffuse term is compared."""
    origin = "0, 2, 2"
    smooth = _render(
        '<bsdf type="coating">'
        '<bsdf type="diffuse"><rgb name="reflectance" value="0.7, 0.7, 0.7"/>'
        '</bsdf></bsdf>', origin=origin)
    rough = _render(
        '<bsdf type="roughcoating"><float name="alpha" value="0.02"/>'
        '<bsdf type="diffuse"><rgb name="reflectance" value="0.7, 0.7, 0.7"/>'
        '</bsdf></bsdf>', origin=origin)
    a, b = smooth[12, 12].mean(), rough[12, 12].mean()
    assert abs(a - b) < 0.05 * a + 0.02, (a, b)


def test_hk_reflection_analytic():
    """Isotropic HK slab, normal incidence + normal view:
    L = albedo (1 - exp(-2 tau)) / 8 (path length 1/ci + 1/co = 2)."""
    img = _render(
        '<bsdf type="hk">'
        '<rgb name="sigmaS" value="2, 3, 4"/>'
        '<rgb name="sigmaA" value="0.1, 0.3, 0.5"/>'
        '<float name="thickness" value="0.4"/></bsdf>', spp=256)
    st = np.array([2.1, 3.3, 4.5])
    albedo = np.array([2, 3, 4]) / st
    tau = st * 0.4
    expect = albedo * (1 - np.exp(-2 * tau)) / 8.0
    c = img[12, 12]
    assert np.all(np.abs(c - expect) < 0.08 * expect + 0.005), (c, expect)


def test_coating_guided_smoke():
    """The guided sampling branch composes with coat_fix (compile +
    finite output + agreement with the unguided estimate)."""
    bsdf = ('<bsdf type="roughcoating"><float name="alpha" value="0.15"/>'
            '<bsdf type="diffuse"><rgb name="reflectance" value="0.6, 0.6, 0.6"/>'
            '</bsdf></bsdf>')
    plain = _render(bsdf, spp=64, origin="0, 2, 2")
    from ppg_tpu.integrators.guided import GuidedPathTracer

    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SCENE.format(bsdf=bsdf, origin="0, 2, 2"))
        path = f.name
    try:
        sc = load_scene(path)
        sc.integrator.update(dict(type="guided_path", budgetType="spp",
                                  budget=15, sppPerPass=1, nee="always"))
        tracer = GuidedPathTracer(sc, chunk=576)
        img = tracer.render()
    finally:
        os.unlink(path)
    assert np.isfinite(img).all()
    a, b = plain[12, 12].mean(), img[12, 12].mean()
    assert abs(a - b) < 0.15 * a + 0.03, (a, b)
