"""Dielectric coating wrappers: `coating` and `roughcoating`.

Weidlich-Wilkie layered models as implemented by the reference
(src/bsdfs/coating.cpp:106-400, roughcoating.cpp:106-456): the incident
and exitant directions are refracted through the dielectric interface,
the nested BSDF is queried with the refracted pair, and the result is
attenuated by the two interface transmittances, the layer absorption,
and the solid-angle compression factor eta^-2 cos(wo)/cos(wo').

The nested BSDF must be a LEAF family (any of the dispatch families in
bsdf.py); the integrator gathers its parameter row via the coat row's
`nested` index and calls these functions, mirroring how blendbsdf and
mask are composed.

Conventions match bsdf.py: eval/pdf cover the smooth lobes in the
solid-angle measure (eval premultiplied by |cos theta_o|); sampling
returns (wo, weight=f/pdf, pdf, sampled_delta, eta) with discrete lobe
probabilities for delta picks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.scene import MAT_ROUGHCOATING
from . import bsdf as B
from . import microfacet as MF
from .fresnel import fresnel_dielectric_ext


def _refract(v, scale):
    """Refract across the interface with relative IOR `1/scale`,
    PRESERVING the hemisphere sign (coating.cpp:refractIn/refractOut,
    roughcoating.cpp:refractTo). Returns (v', R) where R is the Fresnel
    reflectance; under total internal reflection v'.z = 0 and R = 1."""
    vz = v[..., 2]
    R, ct = fresnel_dielectric_ext(jnp.abs(vz), 1.0 / scale)
    # fresnel returns ct signed opposite to its (positive) input
    zp = jnp.sign(vz) * (-ct)
    return jnp.stack([scale * v[..., 0], scale * v[..., 1], zp], -1), R


def _absorption(p, wi_p, wo_p):
    """exp(-sigmaA * thickness * (1/|cos wi'| + 1/|cos wo'|))."""
    inv = (1.0 / jnp.maximum(jnp.abs(wi_p[..., 2]), 1e-8)
           + 1.0 / jnp.maximum(jnp.abs(wo_p[..., 2]), 1e-8))
    return jnp.exp(-p["sigma_a"] * p["thickness"][..., None] * inv[..., None])


def _prob_specular(p, wi):
    """Sample-reallocation probability of picking the interface lobe
    (coating.cpp:268-273; roughcoating uses 1 - roughTransmittance
    instead of the raw Fresnel term, roughcoating.cpp:340-353)."""
    rough = p["mtype"] == MAT_ROUGHCOATING
    R12, _ = fresnel_dielectric_ext(jnp.abs(wi[..., 2]), p["eta_rel"])
    ps0 = jnp.where(rough, 1.0 - B._rt_lookup(p, jnp.abs(wi[..., 2])), R12)
    w = p["spec_weight"]
    ps = (ps0 * w) / jnp.maximum(ps0 * w + (1.0 - ps0) * (1.0 - w), 1e-12)
    return ps, R12


def eval_pdf(p, pn, wi, wo, present=None):
    """Smooth-lobe (f*cos, pdf) of coating/roughcoating lanes."""
    sign = B._flip_sign(p, wi)
    wi, wo = B._z(wi, sign), B._z(wo, sign)
    inv_eta = 1.0 / p["eta_rel"]
    wi_p, R12 = _refract(wi, inv_eta)
    wo_p, R21 = _refract(wo, inv_eta)
    tir = (R12 >= 1.0) | (R21 >= 1.0)

    f_n, pdf_n = B._eval_pdf(pn, wi_p, wo_p, present)
    rough = p["mtype"] == MAT_ROUGHCOATING
    rt_i = B._rt_lookup(p, jnp.abs(wi[..., 2]))
    rt_o = B._rt_lookup(p, jnp.abs(wo[..., 2]))
    interface_t = jnp.where(rough, rt_i * rt_o, (1.0 - R12) * (1.0 - R21))

    compress = (inv_eta * inv_eta * wo[..., 2]
                / jnp.where(jnp.abs(wo_p[..., 2]) < 1e-8, 1.0, wo_p[..., 2]))
    f = (f_n * interface_t[..., None] * _absorption(p, wi_p, wo_p)
         * compress[..., None])
    f = jnp.where(tir[..., None], 0.0, f)

    ps, _ = _prob_specular(p, wi)
    pdf = jnp.where(tir, 0.0, pdf_n * compress * (1.0 - ps))

    # roughcoating's own glossy reflection lobe (solid-angle measure)
    ci, co = wi[..., 2], wo[..., 2]
    refl = ci * co > 0
    sg = jnp.sign(ci)
    wi_f = B._z(wi, sg)
    h = B._half(wi_f, B._z(wo, sg))
    alpha = p["alpha_u"]
    d = MF.eval_d(p["dist"], alpha, alpha, h)
    Fh, _ = fresnel_dielectric_ext(jnp.abs(jnp.sum(wi_f * h, -1)),
                                   p["eta_rel"])
    g = MF.g_smith(p["dist"], alpha, alpha, wi_f, B._z(wo, sg), h)
    gl = Fh * d * g / (4.0 * jnp.maximum(jnp.abs(ci), 1e-8))
    pdf_h = MF.pdf_visible(p["dist"], alpha, alpha, wi_f, h)
    pdf_gl = pdf_h / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(B._z(wo, sg) * h, -1)), 1e-12)
    gl_on = rough & refl & (d > 0)
    f = f + jnp.where(gl_on[..., None], p["specular"] * gl[..., None], 0.0)
    pdf = pdf + jnp.where(gl_on, pdf_gl * ps, 0.0)
    return f, pdf


def sample(p, pn, wi, u4, present=None):
    """Sample coating/roughcoating lanes. u4 is [L,4]: 0-2 drive the
    nested/microfacet sampling, 3 picks the interface vs nested lobe."""
    sign = B._flip_sign(p, wi)
    wi = B._z(wi, sign)
    inv_eta = 1.0 / p["eta_rel"]
    rough = p["mtype"] == MAT_ROUGHCOATING
    ps, R12 = _prob_specular(p, wi)
    pick_spec = u4[..., 3] < ps
    ci = wi[..., 2]
    sg = jnp.sign(ci)

    # --- interface branch ---------------------------------------------------
    # coating: perfect delta reflection (coating.cpp:330-337)
    wo_sd = B._reflect(wi)
    w_sd = p["specular"] * (R12 / jnp.maximum(ps, 1e-12))[..., None]
    # roughcoating: VNDF-sampled microfacet reflection (roughcoating:420-430)
    alpha = p["alpha_u"]
    m = MF.sample_visible(p["dist"], alpha, alpha, B._z(wi, sg), u4[..., :2])
    m_true = B._z(m, sg)
    wo_sg = B._reflect_m(wi, m_true)
    side_ok = wo_sg[..., 2] * ci > 0

    wo_s = jnp.where(rough[..., None], wo_sg, wo_sd)
    delta_s = ~rough

    # --- nested branch --------------------------------------------------------
    wi_p, _ = _refract(wi, inv_eta)
    wo_n_p, w_n, pdf_n, delta_n, eta_n = B.sample_bsdf(
        pn, wi_p, u4[..., :3], present)
    wo_n, R21 = _refract(wo_n_p, p["eta_rel"])
    tir = (R12 >= 1.0) | (R21 >= 1.0)
    absorb = _absorption(p, wi_p, wo_n_p)
    rt_i = B._rt_lookup(p, jnp.abs(ci))
    rt_o = B._rt_lookup(p, jnp.abs(wo_n[..., 2]))
    interface_t = jnp.where(rough, rt_i * rt_o, (1.0 - R12) * (1.0 - R21))
    inv_pn = 1.0 / jnp.maximum(1.0 - ps, 1e-12)
    # smooth nested lobes: branch weight (coating.cpp:342-370); delta
    # nested lobes: discrete measure, no compression factor
    w_nb = w_n * (interface_t * inv_pn)[..., None] * absorb
    compress = (inv_eta * inv_eta * wo_n[..., 2]
                / jnp.where(jnp.abs(wo_n_p[..., 2]) < 1e-8, 1.0,
                            wo_n_p[..., 2]))
    pdf_nb = pdf_n * (1.0 - ps) * jnp.where(delta_n, 1.0, compress)
    bad_n = tir | (pdf_n <= 0)
    w_nb = jnp.where(bad_n[..., None], 0.0, w_nb)
    pdf_nb = jnp.where(bad_n, 0.0, pdf_nb)

    # --- combine --------------------------------------------------------------
    wo = jnp.where(pick_spec[..., None], wo_s, wo_n)
    sampled_delta = jnp.where(pick_spec, delta_s, delta_n)
    eta_out = jnp.where(pick_spec, 1.0, eta_n)

    # glossy interface pick and smooth nested pick both land in the
    # solid-angle measure: recompute the FULL mixture eval/pdf at wo so
    # one-sample MIS stays consistent (roughcoating.cpp:443-450)
    smooth_sampled = ~sampled_delta
    f_mix, pdf_mix = eval_pdf(p, pn, wi, wo, present)
    w_mix = jnp.where(pdf_mix[..., None] > 0,
                      f_mix / jnp.maximum(pdf_mix, 1e-30)[..., None], 0.0)

    weight = jnp.where(
        smooth_sampled[..., None],
        w_mix,
        jnp.where(pick_spec[..., None], w_sd, w_nb))
    pdf = jnp.where(
        smooth_sampled,
        pdf_mix,
        jnp.where(pick_spec, ps, pdf_nb))
    ok = jnp.where(pick_spec, rough & side_ok | ~rough, pdf_nb > 0)
    ok = ok & (pdf > 0)
    weight = jnp.where(ok[..., None], weight, 0.0)
    pdf = jnp.where(ok, pdf, 0.0)
    return B._z(wo, sign), weight, pdf, sampled_delta, eta_out
