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


@pytest.mark.parametrize("otype,props,children", FAMILIES)
def test_chi2_distribution(otype, props, children):
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

        # bins over (cos_theta in [-1,1], phi)
        NB_CT, NB_PH = 12, 12
        ct = np.clip(wo_s[:, 2], -1, 1)
        ph = np.arctan2(wo_s[:, 1], wo_s[:, 0])
        bi = np.clip(((ct + 1) / 2 * NB_CT).astype(int), 0, NB_CT - 1)
        bj = np.clip(((ph + np.pi) / (2 * np.pi) * NB_PH).astype(int), 0, NB_PH - 1)
        counts = np.bincount(bi * NB_PH + bj, minlength=NB_CT * NB_PH).astype(float)

        # expected masses: MC-integrate pdf over uniform sphere points
        m = 400_000
        u = rng.random((m, 2))
        ect = 2 * u[:, 0] - 1
        eph = 2 * np.pi * u[:, 1] - np.pi
        st = np.sqrt(1 - ect**2)
        dirs = np.stack([st * np.cos(eph), st * np.sin(eph), ect], -1)
        pd = np.asarray(B.pdf_bsdf(
            params if params["mtype"].shape[0] == m else make_params(
                otype, props, children, L=m),
            jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (m, 3)),
            jnp.asarray(dirs, jnp.float32)))
        ei = np.clip(((ect + 1) / 2 * NB_CT).astype(int), 0, NB_CT - 1)
        ej = np.clip(((eph + np.pi) / (2 * np.pi) * NB_PH).astype(int), 0, NB_PH - 1)
        eb = ei * NB_PH + ej
        scale = 4 * np.pi / m
        mass = np.bincount(eb, weights=pd, minlength=NB_CT * NB_PH) * scale
        # MC variance of each bin's expected mass (sharp lobes make this
        # the dominant error source, so fold it into the statistic)
        mass_var = np.bincount(eb, weights=pd**2,
                               minlength=NB_CT * NB_PH) * scale**2
        total_mass = mass.sum()
        assert total_mass < 1.0 + 5e-2, (otype, total_mass)
        expected = mass * n_s / max(total_mass, 1e-9)
        var_e = mass_var * (n_s / max(total_mass, 1e-9)) ** 2

        # pool cells with expected < 5 (ChiSquare::runTest pooling)
        small = expected < 5
        c = np.append(counts[~small], counts[small].sum())
        e = np.append(expected[~small], max(expected[small].sum(), 1e-9))
        v = np.append(expected[~small] + var_e[~small],
                      max(expected[small].sum() + var_e[small].sum(), 1e-9))
        chi2 = np.sum((c - e) ** 2 / v)
        dof = len(c) - 1
        assert chi2 < dof * 2 + 30, (otype, wi, chi2, dof)


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
