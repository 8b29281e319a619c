"""Fresnel terms (batched), matching the reference's exact forms
(mitsuba/src/libcore/util.cpp: fresnelDielectricExt, fresnelConductorExact,
fresnelDiffuseReflectance)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fresnel_dielectric_ext(cos_theta_i, eta):
    """Unpolarized Fresnel reflectance of a dielectric boundary.

    cos_theta_i is SIGNED (positive = outside). Returns (F, cos_theta_t)
    with cos_theta_t signed opposite to cos_theta_i.
    """
    scale = jnp.where(cos_theta_i > 0, 1.0 / eta, eta)
    cos_t2 = 1.0 - (1.0 - cos_theta_i * cos_theta_i) * scale * scale
    tir = cos_t2 <= 0.0
    ci = jnp.abs(cos_theta_i)
    ct = jnp.sqrt(jnp.maximum(cos_t2, 0.0))
    rs = (ci - eta * ct) / (ci + eta * ct)
    rp = (eta * ci - ct) / (eta * ci + ct)
    F = 0.5 * (rs * rs + rp * rp)
    F = jnp.where(tir, 1.0, F)
    F = jnp.where(eta == 1.0, 0.0, F)
    cos_theta_t = jnp.where(cos_theta_i > 0, -ct, ct)
    cos_theta_t = jnp.where(tir, 0.0, cos_theta_t)
    cos_theta_t = jnp.where(eta == 1.0, -cos_theta_i, cos_theta_t)
    return F, cos_theta_t


def fresnel_conductor_exact(cos_theta_i, eta, k):
    """Exact unpolarized conductor reflectance; eta/k are [..., 3]."""
    c2 = (cos_theta_i * cos_theta_i)[..., None]
    s2 = 1.0 - c2
    s4 = s2 * s2
    t1 = eta * eta - k * k - s2
    a2pb2 = jnp.sqrt(jnp.maximum(t1 * t1 + 4.0 * k * k * eta * eta, 0.0))
    a = jnp.sqrt(jnp.maximum((a2pb2 + t1) * 0.5, 0.0))
    term1 = a2pb2 + c2
    term2 = 2.0 * a * jnp.sqrt(c2)
    rs2 = (term1 - term2) / (term1 + term2)
    term3 = a2pb2 * c2 + s4
    term4 = term2 * s2
    rp2 = rs2 * (term3 - term4) / (term3 + term4)
    return 0.5 * (rp2 + rs2)


def fresnel_diffuse_reflectance(eta):
    """Average Fresnel reflectance for diffuse illumination. The reference
    computes this with adaptive quadrature (util.cpp, fast=false); here a
    dense Simpson quadrature of the same integrand, evaluated host-side."""
    if eta == 1.0:
        return 0.0
    mu = np.linspace(0.0, 1.0, 2049)
    # evaluate F(mu) with the dielectric formula (external side)
    s = 1.0 / eta
    cos_t2 = 1.0 - (1.0 - mu * mu) * s * s
    ct = np.sqrt(np.maximum(cos_t2, 0.0))
    # mu = 0 makes both denominators 0 for TIR-free angles; the value is
    # replaced by the TIR branch below, so just keep the math warning-free
    with np.errstate(invalid="ignore", divide="ignore"):
        rs = (mu - eta * ct) / (mu + eta * ct)
        rp = (eta * mu - ct) / (eta * mu + ct)
    F = np.where(cos_t2 <= 0, 1.0, 0.5 * (rs * rs + rp * rp))
    integrand = 2.0 * mu * F
    return float(np.trapezoid(integrand, mu))
