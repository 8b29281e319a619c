"""SGGX microflake fiber phase (reference src/phase/microflake.cpp role):
normalization, sample-vs-pdf chi^2 GOF with the pooled-significance
harness, orientation-volume lookups, and an end-to-end volumetric
render through the XML surface."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

import ppg_tpu.media as MED
from chi2util import chi2_test


def _pp(n, axis=(0.0, 0.0, 1.0), stddev=0.25):
    table = [dict(sigma_t=[1, 1, 1], albedo=[0.9, 0.9, 0.9],
                  g=MED.MICROFLAKE_G, stddev=stddev, orientation=axis)]
    media = MED.MediaArrays.from_table(table)
    _, _, pp = MED.fetch(media, jnp.zeros(n, jnp.int32))
    return pp


@pytest.mark.parametrize("stddev,axis", [
    (0.25, (0.0, 0.0, 1.0)),
    (0.1, (1.0, 0.0, 0.0)),
    (0.6, (0.577, 0.577, 0.577)),
])
def test_sggx_phase_normalized(stddev, axis):
    """int p(wi -> wo) dwo = 1 for any wi (Heitz 2015 eq. for the
    specular SGGX phase)."""
    rng = np.random.default_rng(1)
    N = 400_000
    v = rng.normal(size=(N, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pp = _pp(N, axis, stddev)
    d_in = jnp.asarray(np.tile([0.3, -0.4, np.sqrt(0.75)], (N, 1)),
                       jnp.float32)
    p = np.asarray(MED.sggx_eval(pp, d_in, jnp.asarray(v, jnp.float32)))
    integral = p.mean() * 4 * np.pi
    assert abs(integral - 1.0) < 0.02, integral


def test_sggx_sample_matches_pdf_chi2():
    """Pooled chi^2 GOF over (theta, phi) bins: the visible-normal
    sampler must follow sggx_eval (which is also the reported pdf)."""
    rng = np.random.default_rng(2)
    N = 500_000
    pp = _pp(N, (0.0, 0.0, 1.0), 0.3)
    d_in = jnp.asarray(np.tile([0.6, 0.0, -0.8], (N, 1)), jnp.float32)
    u = jnp.asarray(rng.random((N, 2)), jnp.float32)
    d_out, pdf = MED.sggx_sample(pp, d_in, u)
    d_out = np.asarray(d_out)
    # reported pdf equals eval at the sampled direction
    pdf2 = np.asarray(MED.sggx_eval(pp, d_in, jnp.asarray(d_out)))
    rel = np.abs(np.asarray(pdf) - pdf2) / np.maximum(pdf2, 1e-6)
    assert np.quantile(rel, 0.95) < 1e-3

    nb_t, nb_p = 16, 16
    theta = np.arccos(np.clip(d_out[:, 2], -1, 1))
    phi = np.arctan2(d_out[:, 1], d_out[:, 0]) + np.pi
    ti = np.minimum((theta / np.pi * nb_t).astype(int), nb_t - 1)
    pi_ = np.minimum((phi / (2 * np.pi) * nb_p).astype(int), nb_p - 1)
    counts = np.bincount(ti * nb_p + pi_, minlength=nb_t * nb_p)

    # expected mass per bin via MC integration of the pdf
    M = 400_000
    v = np.random.default_rng(3).normal(size=(M, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pv = np.asarray(MED.sggx_eval(_pp(M, (0.0, 0.0, 1.0), 0.3),
                                  jnp.asarray(np.tile([0.6, 0.0, -0.8],
                                                      (M, 1)), jnp.float32),
                                  jnp.asarray(v, jnp.float32)))
    tv = np.arccos(np.clip(v[:, 2], -1, 1))
    pv_ = np.arctan2(v[:, 1], v[:, 0]) + np.pi
    tvi = np.minimum((tv / np.pi * nb_t).astype(int), nb_t - 1)
    pvi = np.minimum((pv_ / (2 * np.pi) * nb_p).astype(int), nb_p - 1)
    bins = tvi * nb_p + pvi
    w = pv * 4 * np.pi / M
    expected = np.bincount(bins, weights=w, minlength=nb_t * nb_p) * N
    evar = (np.bincount(bins, weights=w * w, minlength=nb_t * nb_p) * M
            - (expected / N) ** 2) / M * N * N
    ok, stats = chi2_test(counts, expected, expected_var=evar,
                          significance=0.0025)
    assert ok, stats


def test_orientation_volume_lookup():
    """Per-position fiber axes from a 3-channel grid volume: lanes in
    different cells get different axes through fetch(x=...)."""
    og = np.zeros((1, 1, 2, 3), np.float32)
    og[0, 0, 0] = [1, 0, 0]
    og[0, 0, 1] = [0, 1, 0]
    table = [dict(sigma_t=[1, 1, 1], albedo=[0.9] * 3,
                  g=MED.MICROFLAKE_G, stddev=0.2,
                  orientation=[0, 0, 1], hetero=True,
                  density=np.ones((2, 2, 2), np.float32),
                  bbox_min=[0, 0, 0], bbox_max=[1, 1, 1],
                  orientation_grid=np.broadcast_to(
                      og, (2, 2, 2, 3)).copy())]
    media = MED.MediaArrays.from_table(table)
    x = jnp.asarray([[0.1, 0.1, 0.1], [0.9, 0.1, 0.1]], jnp.float32)
    _, _, pp = MED.fetch(media, jnp.zeros(2, jnp.int32), x=x)
    ax = np.asarray(pp.axis)
    np.testing.assert_allclose(ax[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(ax[1], [0, 1, 0], atol=1e-6)


def test_microflake_medium_renders():
    """End-to-end: a homogeneous microflake medium through the XML
    surface traces without NaNs and scatters anisotropically."""
    from ppg_tpu.scene.testscenes import scene_from_xml
    from ppg_tpu.integrators.driver import make_config, render

    xml = """
    <scene version="0.5.0">
      <integrator type="volpath"><integer name="maxDepth" value="6"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="toWorld">
          <lookat origin="0,0,-4" target="0,0,0" up="0,1,0"/>
        </transform>
        <film type="hdrfilm">
          <integer name="width" value="24"/><integer name="height" value="24"/>
          <rfilter type="box"/>
        </film>
        <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
      </sensor>
      <shape type="sphere">
        <float name="radius" value="1.2"/>
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaT" value="1.5,1.5,1.5"/>
          <rgb name="albedo" value="0.9,0.9,0.9"/>
          <phase type="microflake"><float name="stddev" value="0.2"/></phase>
        </medium>
        <bsdf type="null"/>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="0.8,0.9,1.0"/></emitter>
    </scene>
    """
    sc = scene_from_xml(xml)
    img = np.asarray(render(sc, spp=8, seed=1, chunk=24 * 24))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
