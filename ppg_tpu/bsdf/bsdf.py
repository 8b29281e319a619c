"""Vectorized BSDF dispatch over a material parameter table.

The reference dispatches through virtual BSDF plugins
(mitsuba/include/mitsuba/render/bsdf.h:369-440); here every lane carries a
material row index and all implemented families are evaluated branchlessly
with masked selects — the idiomatic SPMD shape for the VPU. Conventions
follow Mitsuba exactly:

  sample(u) -> (wo, weight = f*cos/pdf, pdf, sampled_delta, eta)
  eval()    -> f * cos(theta_o)   (solid-angle measure, 0 for delta lobes)
  pdf()     -> solid-angle pdf of sample()

`twosided` adapters are a per-row flag: the local frame is flipped when
wi.z < 0 (reference src/bsdfs/twosided.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import warp
from ..scene.scene import (
    MAT_CONDUCTOR,
    MAT_DIELECTRIC,
    MAT_DIFFUSE,
    MAT_MASK,
    MAT_NULL,
    MAT_PLASTIC,
    MAT_ROUGHCONDUCTOR,
    MAT_ROUGHDIELECTRIC,
    MAT_ROUGHPLASTIC,
    MAT_THINDIELECTRIC,
)

INV_PI = 1.0 / jnp.pi

# families for which guiding applies (BSDF::ESmooth in the reference)
SMOOTH_TYPES = (
    MAT_DIFFUSE,
    MAT_ROUGHCONDUCTOR,
    MAT_ROUGHDIELECTRIC,
    MAT_PLASTIC,
    MAT_ROUGHPLASTIC,
)
# delta-only families (pure specular): guiding bypassed entirely
DELTA_TYPES = (MAT_CONDUCTOR, MAT_DIELECTRIC, MAT_THINDIELECTRIC)


class MaterialArrays:
    """Pytree of per-material parameter arrays (rows = material ids)."""

    FIELDS = (
        "mtype", "twosided", "reflectance", "specular", "transmittance",
        "eta", "k", "int_ior", "ext_ior", "alpha_u", "alpha_v", "dist",
        "nonlinear", "opacity", "nested", "exponent",
    )

    def __init__(self, **kw):
        for f in self.FIELDS:
            setattr(self, f, kw[f])

    @classmethod
    def from_table(cls, table):
        kw = {}
        for f in cls.FIELDS:
            arr = getattr(table, f)
            if arr.dtype == bool or arr.dtype == jnp.int32 or str(arr.dtype).startswith("int"):
                kw[f] = jnp.asarray(arr)
            else:
                kw[f] = jnp.asarray(arr, jnp.float32)
        return cls(**kw)


jax.tree_util.register_pytree_node(
    MaterialArrays,
    lambda m: (tuple(getattr(m, f) for f in MaterialArrays.FIELDS), None),
    lambda aux, ch: MaterialArrays(**dict(zip(MaterialArrays.FIELDS, ch))),
)


def gather_params(mats: MaterialArrays, mid):
    """Gather per-lane material parameters."""
    g = {}
    for f in MaterialArrays.FIELDS:
        g[f] = getattr(mats, f)[mid]
    return g


def lane_flags(p):
    """(is_smooth, is_delta_only, is_null) per lane, mirroring the lobe-type
    checks at guided_path.cpp:1654,1697,1942."""
    mt = p["mtype"]
    smooth = jnp.zeros_like(mt, dtype=bool)
    for t in SMOOTH_TYPES:
        smooth |= mt == t
    delta_only = jnp.zeros_like(smooth)
    for t in DELTA_TYPES:
        delta_only |= mt == t
    is_null = mt == MAT_NULL
    return smooth, delta_only, is_null


def _flip_for_twosided(p, wi):
    """twosided: operate in the flipped frame when arriving from below."""
    flip = p["twosided"] & (wi[..., 2] < 0.0)
    sign = jnp.where(flip, -1.0, 1.0)
    return sign


def _diffuse_eval(p, wi, wo):
    both = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    f = p["reflectance"] * (INV_PI * jnp.maximum(wo[..., 2], 0.0))[..., None]
    return jnp.where(both[..., None], f, 0.0)


def _diffuse_pdf(p, wi, wo):
    both = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(both, warp.square_to_cosine_hemisphere_pdf(wo), 0.0)


def _diffuse_sample(p, wi, u2):
    wo = warp.square_to_cosine_hemisphere(u2)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    valid = wi[..., 2] > 0
    weight = jnp.where(valid[..., None], p["reflectance"], 0.0)
    return wo, weight, jnp.where(valid, pdf, 0.0)


def eval_bsdf(p, wi, wo):
    """f*cos for the smooth component. Currently: diffuse family."""
    sign = _flip_for_twosided(p, wi)
    wi_l = wi * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], -1)
    wo_l = wo * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], -1)
    out = jnp.zeros_like(wi)
    mt = p["mtype"]
    out = jnp.where((mt == MAT_DIFFUSE)[..., None], _diffuse_eval(p, wi_l, wo_l), out)
    return out


def pdf_bsdf(p, wi, wo):
    sign = _flip_for_twosided(p, wi)
    wi_l = wi * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], -1)
    wo_l = wo * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], -1)
    out = jnp.zeros(wi.shape[:-1])
    mt = p["mtype"]
    out = jnp.where(mt == MAT_DIFFUSE, _diffuse_pdf(p, wi_l, wo_l), out)
    return out


def sample_bsdf(p, wi, u2):
    """Returns (wo, weight=f*cos/pdf, pdf, sampled_delta, eta)."""
    sign = _flip_for_twosided(p, wi)
    wi_l = wi * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], -1)

    mt = p["mtype"]
    wo = jnp.zeros_like(wi)
    weight = jnp.zeros_like(wi)
    pdf = jnp.zeros(wi.shape[:-1])

    d_wo, d_w, d_pdf = _diffuse_sample(p, wi_l, u2)
    sel = (mt == MAT_DIFFUSE)
    wo = jnp.where(sel[..., None], d_wo, wo)
    weight = jnp.where(sel[..., None], d_w, weight)
    pdf = jnp.where(sel, d_pdf, pdf)

    sampled_delta = jnp.zeros(wi.shape[:-1], bool)
    eta = jnp.ones(wi.shape[:-1])

    # un-flip the outgoing direction for twosided lanes
    wo = wo * jnp.stack([jnp.ones_like(sign)] * 2 + [sign], -1)
    return wo, weight, pdf, sampled_delta, eta
