"""Microfacet normal distributions (Beckmann / GGX), batched.

Matches the reference's MicrofacetDistribution
(mitsuba/src/bsdfs/microfacet.h): D evaluation (:191-233), Smith G1
(:477-514, including the Beckmann rational approximation), projected
roughness (:541-551), full-distribution sampling (:287-397) and
visible-normal sampling with its exact pdf
pdfVisible = G1(wi,m) |wi.m| D(m) / |cos(wi)| (:465-470).

The visible-normal samplers draw from the same VNDF as the reference but
use the closed-form Heitz (2018) construction for GGX and an erf-domain
bisection for Beckmann — the distributions are identical, only the
uniform->sample mapping differs (RNG streams are not replicated anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfinv

INV_PI = 1.0 / jnp.pi
SQRT_PI_INV = 1.0 / jnp.sqrt(jnp.pi)

BECKMANN, GGX = 0, 1


def _cos2(m):
    return m[..., 2] * m[..., 2]


def eval_d(dist, alpha_u, alpha_v, m):
    """Microfacet density D(m)."""
    c2 = _cos2(m)
    safe_c2 = jnp.maximum(c2, 1e-20)
    bexp = (
        (m[..., 0] ** 2) / (alpha_u * alpha_u)
        + (m[..., 1] ** 2) / (alpha_v * alpha_v)
    ) / safe_c2
    beck = jnp.exp(-bexp) / (jnp.pi * alpha_u * alpha_v * safe_c2 * safe_c2)
    root = (1.0 + bexp) * safe_c2
    ggx = 1.0 / (jnp.pi * alpha_u * alpha_v * root * root)
    d = jnp.where(dist == GGX, ggx, beck)
    d = jnp.where(m[..., 2] <= 0, 0.0, d)
    return jnp.where(d * m[..., 2] < 1e-20, 0.0, d)


def _project_roughness(alpha_u, alpha_v, v):
    sin2 = jnp.maximum(1.0 - v[..., 2] ** 2, 1e-20)
    inv = 1.0 / sin2
    cos_phi2 = v[..., 0] ** 2 * inv
    sin_phi2 = v[..., 1] ** 2 * inv
    aniso = jnp.sqrt(cos_phi2 * alpha_u**2 + sin_phi2 * alpha_v**2)
    return jnp.where(jnp.abs(alpha_u - alpha_v) < 1e-7, alpha_u, aniso)


def smith_g1(dist, alpha_u, alpha_v, v, m):
    """Smith's masking term for one direction."""
    back = jnp.sum(v * m, -1) * v[..., 2] <= 0
    cos_v = jnp.clip(jnp.abs(v[..., 2]), 1e-8, 1.0)
    tan_theta = jnp.sqrt(jnp.maximum(1.0 - cos_v * cos_v, 0.0)) / cos_v
    alpha = _project_roughness(alpha_u, alpha_v, v)

    a = 1.0 / jnp.maximum(alpha * tan_theta, 1e-12)
    a2 = a * a
    beck = jnp.where(
        a >= 1.6, 1.0, (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2)
    )
    root = alpha * tan_theta
    ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + root * root))
    g = jnp.where(dist == GGX, ggx, beck)
    g = jnp.where(tan_theta == 0.0, 1.0, g)
    return jnp.where(back, 0.0, g)


def g_smith(dist, alpha_u, alpha_v, wi, wo, m):
    return smith_g1(dist, alpha_u, alpha_v, wi, m) * smith_g1(
        dist, alpha_u, alpha_v, wo, m
    )


def pdf_visible(dist, alpha_u, alpha_v, wi, m):
    cos_i = wi[..., 2]
    g1 = smith_g1(dist, alpha_u, alpha_v, wi, m)
    d = eval_d(dist, alpha_u, alpha_v, m)
    p = g1 * jnp.abs(jnp.sum(wi * m, -1)) * d / jnp.maximum(jnp.abs(cos_i), 1e-12)
    return jnp.where(cos_i == 0.0, 0.0, p)


def _sample_visible_11(dist, theta_i, u):
    """Slope-space VNDF sampling for alpha = 1 (batched, both types)."""
    u1 = u[..., 0]
    u2 = u[..., 1]

    # ---- GGX: closed form (Heitz 2018, "Sampling the GGX Distribution") --
    # expressed in slope space of the stretched configuration
    tan_t = jnp.tan(theta_i)
    # normal incidence special case handled by the construction itself
    wi = jnp.stack(
        [jnp.sin(theta_i), jnp.zeros_like(theta_i), jnp.cos(theta_i)], -1
    )
    # orthonormal basis around wi
    lensq = wi[..., 0] ** 2
    T1 = jnp.where(
        (wi[..., 2] < 0.9999)[..., None],
        jnp.stack([-wi[..., 2], jnp.zeros_like(tan_t), wi[..., 0]], -1)
        / jnp.sqrt(jnp.maximum(wi[..., 0] ** 2 + wi[..., 2] ** 2, 1e-20))[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), wi.shape),
    )
    T2 = jnp.cross(wi, T1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + wi[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    n = p1[..., None] * T1 + p2[..., None] * T2 + p3[..., None] * wi
    nz = jnp.maximum(n[..., 2], 1e-8)
    ggx_slope = jnp.stack([-n[..., 0] / nz, -n[..., 1] / nz], -1)

    # ---- Beckmann: erf-domain bisection (microfacet.h:573-650) ------------
    tan_ti = jnp.tan(theta_i)
    cot_ti = 1.0 / jnp.maximum(tan_ti, 1e-12)
    c = erf(cot_ti)
    ux = jnp.maximum(u1, 1e-6)
    fit = 1.0 + theta_i * (-0.876 + theta_i * (0.4265 - 0.0594 * theta_i))
    b0 = c - (1.0 + c) * jnp.power(1.0 - ux, fit)
    norm = 1.0 / (
        1.0 + c + SQRT_PI_INV * tan_ti * jnp.exp(-cot_ti * cot_ti)
    )

    def body(_, ab):
        a, b, cc = ab
        b = jnp.where((b >= a) & (b <= cc), b, 0.5 * (a + cc))
        inv_erf = erfinv(jnp.clip(b, -0.9999999, 0.9999999))
        value = (
            1.0
            + b
            + SQRT_PI_INV * tan_ti * jnp.exp(-inv_erf * inv_erf)
        ) * norm - ux
        a = jnp.where(value <= 0, b, a)
        cc = jnp.where(value <= 0, cc, b)
        deriv = (1.0 - inv_erf * tan_ti) * norm
        b = b - value / jnp.where(jnp.abs(deriv) < 1e-12, 1.0, deriv)
        return a, b, cc

    a0 = jnp.full_like(b0, -1.0)
    a, b, cmax = jax.lax.fori_loop(0, 12, body, (a0, b0, c))
    b = jnp.clip(b, -0.9999999, jnp.minimum(c, 0.9999999))
    slope_x = erfinv(b)
    slope_y = erfinv(jnp.clip(2.0 * jnp.maximum(u2, 1e-6) - 1.0, -0.9999999, 0.9999999))
    # normal-incidence special case
    near0 = theta_i < 1e-4
    r0 = jnp.sqrt(jnp.maximum(-jnp.log(1.0 - u1), 0.0))
    phi0 = 2.0 * jnp.pi * u2
    slope_x = jnp.where(near0, r0 * jnp.cos(phi0), slope_x)
    slope_y = jnp.where(near0, r0 * jnp.sin(phi0), slope_y)
    beck_slope = jnp.stack([slope_x, slope_y], -1)

    return jnp.where((dist == GGX)[..., None], ggx_slope, beck_slope)


def sample_visible(dist, alpha_u, alpha_v, wi, u):
    """Visible-normal sample (microfacet.h:428-463): stretch, sample the
    alpha=1 slope distribution, rotate, unstretch, normalize."""
    wi_s = jnp.stack(
        [alpha_u * wi[..., 0], alpha_v * wi[..., 1], wi[..., 2]], -1
    )
    wi_s = wi_s / jnp.linalg.norm(wi_s, axis=-1, keepdims=True)
    z = jnp.clip(wi_s[..., 2], -1.0, 1.0)
    theta = jnp.where(z < 0.99999, jnp.arccos(z), 0.0)
    phi = jnp.where(z < 0.99999, jnp.arctan2(wi_s[..., 1], wi_s[..., 0]), 0.0)
    sp, cp = jnp.sin(phi), jnp.cos(phi)

    slope = _sample_visible_11(dist, theta, u)
    sx = cp * slope[..., 0] - sp * slope[..., 1]
    sy = sp * slope[..., 0] + cp * slope[..., 1]
    sx = sx * alpha_u
    sy = sy * alpha_v
    inv = 1.0 / jnp.sqrt(sx * sx + sy * sy + 1.0)
    return jnp.stack([-sx * inv, -sy * inv, inv], -1)


def sample_all(dist, alpha_u, alpha_v, u):
    """Sample the full (cosine-weighted) distribution D(m)cos;
    isotropic-alpha path (microfacet.h:287-345). Returns (m, pdf)."""
    u1, u2 = u[..., 0], u[..., 1]
    phi = 2.0 * jnp.pi * u2
    # Beckmann
    a2 = alpha_u * alpha_u
    tan2_b = a2 * -jnp.log(jnp.maximum(1.0 - u1, 1e-20))
    cos_b = 1.0 / jnp.sqrt(1.0 + tan2_b)
    pdf_b = (1.0 - u1) / jnp.maximum(
        jnp.pi * alpha_u * alpha_v * cos_b**3, 1e-30
    )
    # GGX
    tan2_g = a2 * u1 / jnp.maximum(1.0 - u1, 1e-12)
    cos_g = 1.0 / jnp.sqrt(1.0 + tan2_g)
    temp = 1.0 + tan2_g / a2
    pdf_g = INV_PI / jnp.maximum(
        alpha_u * alpha_v * cos_g**3 * temp * temp, 1e-30
    )
    cos_t = jnp.where(dist == GGX, cos_g, cos_b)
    pdf = jnp.where(dist == GGX, pdf_g, pdf_b)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    m = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], -1)
    return m, jnp.where(pdf < 1e-20, 0.0, pdf)


def pdf_all(dist, alpha_u, alpha_v, m):
    return eval_d(dist, alpha_u, alpha_v, m) * m[..., 2]


def pdf_m(dist, alpha_u, alpha_v, wi, m, visible):
    return jnp.where(
        visible,
        pdf_visible(dist, alpha_u, alpha_v, wi, m),
        pdf_all(dist, alpha_u, alpha_v, m),
    )


def sample_m(dist, alpha_u, alpha_v, wi, u, visible):
    m_vis = sample_visible(dist, alpha_u, alpha_v, wi, u)
    m_all, _ = sample_all(dist, alpha_u, alpha_v, u)
    return jnp.where(visible[..., None], m_vis, m_all)
