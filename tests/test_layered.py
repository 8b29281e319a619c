"""GOF + consistency tests for the coating / roughcoating wrappers.

Mirrors the reference's ChiSquare coverage of coating.cpp /
roughcoating.cpp (test_chisquare.cpp instantiates every BSDF plugin):
sampling must agree with the standalone eval/pdf pair, and the sampled
direction distribution must match the pdf.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from ppg_tpu.bsdf import bsdf as B
from ppg_tpu.bsdf import layered as LY
from ppg_tpu.scene.scene import MaterialBuilder, TextureBuilder
from ppg_tpu.scene.xml_parser import PluginSpec, Spectrum


def make_coat(otype, props, nested_otype, nested_props, L):
    nested = PluginSpec("bsdf", nested_otype, dict(nested_props))
    spec = PluginSpec("bsdf", otype, dict(props), [nested])
    mb = MaterialBuilder(TextureBuilder(None))
    row = mb.add(spec)
    table = mb.finalize()
    mats = B.MaterialArrays.from_table(table)
    p = B.gather_params(mats, jnp.full(L, row, jnp.int32))
    pn = B.gather_params(mats, jnp.maximum(p["nested"], 0))
    return p, pn


CASES = [
    ("coating", {"intIOR": 1.5}, "roughconductor", {"alpha": 0.3}),
    ("coating", {"intIOR": 1.7, "sigmaA": Spectrum(rgb=np.array([0.1, 0.2, 0.5])),
                 "thickness": 1.0}, "diffuse", {}),
    ("coating", {}, "conductor", {}),
    ("roughcoating", {"alpha": 0.2}, "diffuse", {}),
    ("roughcoating", {"alpha": 0.1, "distribution": "ggx"},
     "roughconductor", {"alpha": 0.3}),
]

WI_LIST = [
    np.array([0.0, 0.0, 1.0]),
    np.array([0.6, 0.0, 0.8]),
]


def _sample(case, wi, n, seed=0):
    otype, props, n_otype, n_props = case
    p, pn = make_coat(otype, props, n_otype, n_props, n)
    wi_l = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
    u = jax.random.uniform(jax.random.key(seed), (n, 4))
    wo, w, pdf, delta, eta = LY.sample(p, pn, wi_l, u)
    return p, pn, wi_l, *map(np.asarray, (wo, w, pdf, delta, eta))


@pytest.mark.parametrize("case", CASES)
def test_consistency(case):
    n = 60_000
    for wi in WI_LIST:
        p, pn, wi_l, wo, w, pdf, delta, eta = _sample(case, wi, n)
        ok = (pdf > 1e-4) & ~delta & np.any(w > 0, -1)
        if ok.sum() < n // 20:
            continue
        f2, pdf2 = map(np.asarray, LY.eval_pdf(p, pn, wi_l, jnp.asarray(wo)))
        sel = ok & (pdf > 1e-3)
        rel = np.abs(pdf2[sel] - pdf[sel]) / pdf[sel]
        assert np.quantile(rel, 0.95) < 5e-3, (case[0], wi, np.quantile(rel, 0.95))
        w2 = f2[sel] / pdf[sel][:, None]
        relw = np.abs(w2 - w[sel]) / np.maximum(np.abs(w[sel]), 1e-3)
        assert np.quantile(relw, 0.95) < 1e-2, (case[0], wi)


@pytest.mark.parametrize("case", CASES)
def test_chi2(case):
    n = 200_000
    rng = np.random.default_rng(11)
    for wi in WI_LIST:
        p, pn, wi_l, wo, w, pdf, delta, eta = _sample(case, wi, n, seed=5)
        sel = (pdf > 0) & ~delta
        wo_s = wo[sel]
        n_s = sel.sum()
        if n_s < n // 20:
            continue

        NB_CT, NB_PH = 12, 12
        ct = np.clip(wo_s[:, 2], -1, 1)
        ph = np.arctan2(wo_s[:, 1], wo_s[:, 0])
        bi = np.clip(((ct + 1) / 2 * NB_CT).astype(int), 0, NB_CT - 1)
        bj = np.clip(((ph + np.pi) / (2 * np.pi) * NB_PH).astype(int),
                     0, NB_PH - 1)
        counts = np.bincount(
            bi * NB_PH + bj, minlength=NB_CT * NB_PH).astype(float)

        m = 400_000
        u = rng.random((m, 2))
        ect = 2 * u[:, 0] - 1
        eph = 2 * np.pi * u[:, 1] - np.pi
        st = np.sqrt(1 - ect**2)
        dirs = np.stack([st * np.cos(eph), st * np.sin(eph), ect], -1)
        pm, pmn = make_coat(case[0], case[1], case[2], case[3], m)
        pd = np.asarray(LY.eval_pdf(
            pm, pmn,
            jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (m, 3)),
            jnp.asarray(dirs, jnp.float32))[1])
        ei = np.clip(((ect + 1) / 2 * NB_CT).astype(int), 0, NB_CT - 1)
        ej = np.clip(((eph + np.pi) / (2 * np.pi) * NB_PH).astype(int),
                     0, NB_PH - 1)
        eb = ei * NB_PH + ej
        scale = 4 * np.pi / m
        mass = np.bincount(eb, weights=pd, minlength=NB_CT * NB_PH) * scale
        mass_var = np.bincount(eb, weights=pd**2,
                               minlength=NB_CT * NB_PH) * scale**2
        total_mass = mass.sum()
        assert total_mass < 1.0 + 5e-2, (case[0], total_mass)
        expected = mass * n_s / max(total_mass, 1e-9)
        var_e = mass_var * (n_s / max(total_mass, 1e-9)) ** 2

        small = expected < 5
        c = np.append(counts[~small], counts[small].sum())
        e = np.append(expected[~small], max(expected[small].sum(), 1e-9))
        v = np.append(expected[~small] + var_e[~small],
                      max(expected[small].sum() + var_e[small].sum(), 1e-9))
        chi2 = np.sum((c - e) ** 2 / v)
        dof = len(c) - 1
        assert chi2 < dof * 2 + 30, (case[0], wi, chi2, dof)


def test_coating_energy_bounds():
    """Specular + transmitted energy should never exceed unity for a
    white nested diffuse under a clear coat."""
    n = 100_000
    p, pn, wi_l, wo, w, pdf, delta, eta = _sample(
        ("coating", {}, "diffuse",
         {"reflectance": Spectrum(rgb=np.ones(3))}),
        np.array([0.3, 0.2, 0.933]), n)
    # average path weight (estimates directional albedo) must be <= 1
    assert w.mean(0).max() <= 1.0 + 1e-3
