"""Statistical goodness-of-fit tests for every BSDF family.

Mirrors the reference's ChiSquare harness (mitsuba/include/mitsuba/core/
chisquare.h + src/tests/test_chisquare.cpp), which verifies for every
BSDF plugin x parameter set that sample() is distributed according to
pdf(). Here, per family:

  1. internal consistency — for sampled directions, the standalone
     pdf_bsdf() must reproduce the sampling pdf, and eval_bsdf()/pdf
     must reproduce the returned importance weight (the reference
     recovers this with its replayable FakeSampler);
  2. chi^2 GOF — sampled directions binned over (cos_theta, phi) against
     expected bin masses computed by Monte-Carlo integration of pdf(),
     with low-count pooling like ChiSquare::runTest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from ppg_tpu.bsdf import bsdf as B
from ppg_tpu.scene.scene import MaterialBuilder, TextureBuilder
from ppg_tpu.scene.xml_parser import PluginSpec, Spectrum


def make_params(otype, props=None, children=(), L=1):
    """Single material row -> per-lane params dict of length L."""
    spec = PluginSpec("bsdf", otype)
    spec.props.update(props or {})
    for c in children:
        spec.children.append(c)
    mb = MaterialBuilder(TextureBuilder(None))
    row = mb.add(spec)
    table = mb.finalize()
    mats = B.MaterialArrays.from_table(table)
    return B.gather_params(mats, jnp.full(L, row, jnp.int32))


FAMILIES = [
    ("diffuse", {"reflectance": Spectrum(rgb=np.array([0.6, 0.4, 0.3]))}, ()),
    ("roughconductor", {"alpha": 0.3, "distribution": "beckmann"}, ()),
    ("roughconductor", {"alpha": 0.1, "distribution": "ggx"}, ()),
    ("plastic", {}, ()),
    ("roughplastic", {"alpha": 0.25, "distribution": "beckmann"}, ()),
    ("roughdielectric", {"alpha": 0.3, "distribution": "beckmann"}, ()),
    ("phong", {"exponent": 20.0}, ()),
    ("roughdiffuse", {"alpha": 0.4}, ()),
    ("ward", {"alphaU": 0.15, "alphaV": 0.3}, ()),
    ("difftrans", {}, ()),
    ("hk", {"sigmaS": Spectrum(rgb=np.array([2.0, 3.0, 4.0])),
            "sigmaA": Spectrum(rgb=np.array([0.1, 0.3, 0.5])),
            "thickness": 0.4}, ()),
    ("hk", {"material": "ketchup", "thickness": 2.0}, ()),
    ("hk", {"sigmaS": Spectrum(rgb=np.array([1.5, 1.5, 1.5])),
            "sigmaA": Spectrum(rgb=np.array([0.2, 0.2, 0.2])),
            "thickness": 1.0},
     (PluginSpec("phase", "hg", {"g": 0.6}),)),
]

DELTA_FAMILIES = [
    ("conductor", {}, ()),
    ("dielectric", {}, ()),
    ("thindielectric", {}, ()),
]

WI_LIST = [
    np.array([0.0, 0.0, 1.0]),
    np.array([0.6, 0.0, 0.8]),
    np.array([0.3, -0.6, 0.7416]),
]


def _sample(otype, props, children, wi, n, seed=0):
    params = make_params(otype, props, children, L=n)
    wi_l = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
    u = jax.random.uniform(jax.random.key(seed), (n, 3))
    wo, w, pdf, delta, eta = B.sample_bsdf(params, wi_l, u)
    return params, wi_l, *map(np.asarray, (wo, w, pdf, delta, eta))


@pytest.mark.parametrize("otype,props,children", FAMILIES)
def test_sample_pdf_eval_consistency(otype, props, children):
    n = 60_000
    for wi in WI_LIST:
        params, wi_l, wo, w, pdf, delta, eta = _sample(
            otype, props, children, wi, n)
        ok = (pdf > 1e-5) & ~delta & np.any(w > 0, -1)
        if ok.sum() < n // 10:
            continue
        pdf2 = np.asarray(B.pdf_bsdf(params, wi_l, jnp.asarray(wo)))
        f = np.asarray(B.eval_bsdf(params, wi_l, jnp.asarray(wo)))
        sel = ok & (pdf > 1e-3)
        rel = np.abs(pdf2[sel] - pdf[sel]) / pdf[sel]
        assert np.quantile(rel, 0.95) < 5e-3, (otype, wi, np.quantile(rel, 0.95))
        w2 = f[sel] / pdf[sel][:, None]
        relw = np.abs(w2 - w[sel]) / np.maximum(np.abs(w[sel]), 1e-3)
        assert np.quantile(relw, 0.95) < 1e-2, (otype, wi)


# total (family, wi) chi^2 runs for the Sidak correction
_N_CHI2_RUNS = len(FAMILIES) * 2


@pytest.mark.parametrize("otype,props,children", FAMILIES)
def test_chi2_distribution(otype, props, children):
    from chi2util import run_sphere_chi2

    n = 200_000
    rng = np.random.default_rng(7)
    for wi in WI_LIST[:2]:
        params, wi_l, wo, w, pdf, delta, eta = _sample(
            otype, props, children, wi, n, seed=3)
        sel = (pdf > 0) & ~delta
        wo_s = wo[sel]
        n_s = sel.sum()
        if n_s < n // 10:
            continue

        params_m = None

        def pdf_fn(dirs):
            nonlocal params_m
            m = len(dirs)
            if params_m is None:
                params_m = make_params(otype, props, children, L=m)
            return B.pdf_bsdf(
                params_m,
                jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (m, 3)),
                jnp.asarray(dirs, jnp.float32))

        ok, stats = run_sphere_chi2(wo_s, pdf_fn, rng,
                                    significance=0.01,
                                    n_tests=_N_CHI2_RUNS)
        assert stats["total_mass"] < 1.0 + 5e-2, (otype, stats)
        assert ok, (otype, wi, stats)


def test_chi2_power_rejects_wrong_pdf():
    """The harness must REJECT a pdf that is wrong by ~5%: samples drawn
    from a cosine lobe tested against a pdf tilted by 5% toward the
    pole (both normalized) — validates the discriminating power that
    the reference gets from ChiSquare::runTest's significance level."""
    from chi2util import run_sphere_chi2

    n = 200_000
    rng = np.random.default_rng(11)
    u = rng.random((n, 2))
    # exact cosine-weighted hemisphere samples
    ct = np.sqrt(u[:, 0])
    ph = 2 * np.pi * u[:, 1]
    st = np.sqrt(1 - ct**2)
    dirs = np.stack([st * np.cos(ph), st * np.sin(ph), ct], -1)

    def pdf_tilted(d):
        # p(w) ∝ cos^1.2 — ~5% mass shift toward the pole, normalized
        c = np.clip(d[:, 2], 0, 1)
        k = 1.2
        return (k + 1) / (2 * np.pi) * c**k

    ok, stats = run_sphere_chi2(dirs, pdf_tilted, rng, significance=0.01,
                                n_tests=_N_CHI2_RUNS)
    assert not ok, stats

    def pdf_true(d):
        return np.clip(d[:, 2], 0, None) / np.pi

    ok, stats = run_sphere_chi2(dirs, pdf_true, rng, significance=0.01,
                                n_tests=_N_CHI2_RUNS)
    assert ok, stats


@pytest.mark.parametrize("otype,props,children", DELTA_FAMILIES)
def test_delta_energy(otype, props, children):
    """Delta BSDFs: weights bounded by 1 (energy conservation) and
    discrete pdfs sum to 1 over the lobe choice."""
    n = 50_000
    for wi in WI_LIST[1:]:
        params, wi_l, wo, w, pdf, delta, eta = _sample(
            otype, props, children, wi, n)
        assert delta.all()
        assert (pdf > 0).all() and (pdf <= 1 + 1e-5).all()
        assert w.max() <= 1.0 + 1e-4, (otype, w.max())
        # reflect/refract lobes partition the unit interval
        # (pdf is the discrete lobe probability)
        mean_pdf_inv = np.mean(1.0 / pdf)
        # E[1/p] over lobes chosen w.p. p equals the number of lobes
        assert 0.9 < mean_pdf_inv < 2.3, (otype, mean_pdf_inv)
