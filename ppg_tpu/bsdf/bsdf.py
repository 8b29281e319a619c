"""Vectorized BSDF dispatch over a material parameter table.

The reference dispatches through virtual BSDF plugins
(mitsuba/include/mitsuba/render/bsdf.h:369-440); here every lane carries a
material row index and all families are evaluated branchlessly with masked
selects — the idiomatic SPMD shape for the VPU. Conventions follow
Mitsuba exactly:

  sample(u) -> (wo, weight = f*cos/pdf, pdf, sampled_delta, eta)
               (pdf is discrete for delta lobes)
  eval()    -> f * cos(theta_o) for the smooth components (solid angle)
  pdf()     -> solid-angle pdf of the smooth components of sample()

Families (reference source in src/bsdfs/):
  diffuse.cpp, conductor.cpp, dielectric.cpp, thindielectric.cpp,
  roughconductor.cpp, plastic.cpp, roughplastic.cpp, roughdielectric.cpp,
  with twosided.cpp as a per-row frame-flip flag and mask.cpp handled in
  the integrator's null-transition logic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import warp
from ..core.vecmath import small_table_gather
from ..scene.scene import (
    MAT_NAMES,
    MAT_BLEND,
    MAT_COATING,
    MAT_CONDUCTOR,
    MAT_DIELECTRIC,
    MAT_DIFFTRANS,
    MAT_DIFFUSE,
    MAT_HK,
    MAT_MASK,
    MAT_NULL,
    MAT_PHONG,
    MAT_PLASTIC,
    MAT_ROUGHCOATING,
    MAT_ROUGHCONDUCTOR,
    MAT_ROUGHDIELECTRIC,
    MAT_ROUGHDIFFUSE,
    MAT_ROUGHPLASTIC,
    MAT_THINDIELECTRIC,
    MAT_WARD,
)
from . import microfacet as MF
from .fresnel import fresnel_conductor_exact, fresnel_dielectric_ext

INV_PI = 1.0 / jnp.pi
RT_BINS = 64

# families with a smooth lobe (BSDF::ESmooth): guiding applies
# (coating/roughcoating get their flags fixed up from the nested child
# in the integrator, like mask)
SMOOTH_TYPES = (
    MAT_DIFFUSE,
    MAT_ROUGHDIFFUSE,
    MAT_ROUGHCONDUCTOR,
    MAT_ROUGHDIELECTRIC,
    MAT_PLASTIC,
    MAT_ROUGHPLASTIC,
    MAT_PHONG,
    MAT_WARD,
    MAT_DIFFTRANS,
    MAT_BLEND,
    MAT_HK,
    MAT_ROUGHCOATING,
)
# delta-only families: guiding bypassed (guided_path.cpp:1654)
DELTA_TYPES = (MAT_CONDUCTOR, MAT_DIELECTRIC, MAT_THINDIELECTRIC)
# families with transmission or backside lobes: NEE refN = 0
# (records.inl:160-164; twosided adds EBackSide)
TRANSMISSIVE_TYPES = (
    MAT_DIELECTRIC,
    MAT_THINDIELECTRIC,
    MAT_ROUGHDIELECTRIC,
    MAT_MASK,
    MAT_NULL,
    MAT_DIFFTRANS,
    MAT_HK,
)


class MaterialArrays:
    """Per-material parameters PACKED into one [M, WIDTH] f32 matrix.

    TPU gather cost is per-op, not per-byte, so fetching a lane's whole
    material record costs ONE row gather instead of 22 field gathers.
    Integer fields (mtype/dist/nested) are stored bit-exactly via
    float32 bitcast; bools as 0.0/1.0.
    """

    # field -> (offset, width, kind); kind in {f, f3, i, b, tab}
    SLOTS = {
        "mtype": (0, 1, "i"),
        "twosided": (1, 1, "b"),
        "reflectance": (2, 3, "f3"),
        "specular": (5, 3, "f3"),
        "transmittance": (8, 3, "f3"),
        "eta": (11, 3, "f3"),
        "k": (14, 3, "f3"),
        "int_ior": (17, 1, "f"),
        "ext_ior": (18, 1, "f"),
        "alpha_u": (19, 1, "f"),
        "alpha_v": (20, 1, "f"),
        "dist": (21, 1, "i"),
        "nonlinear": (22, 1, "b"),
        "opacity": (23, 3, "f3"),
        "nested": (26, 1, "i"),
        "exponent": (27, 1, "f"),
        "eta_rel": (28, 1, "f"),
        "inv_eta2": (29, 1, "f"),
        "fdr_int": (30, 1, "f"),
        "spec_weight": (31, 1, "f"),
        "rt_fdr_int": (32, 1, "f"),
        "tex_reflectance": (33, 1, "i"),
        "tex_opacity": (34, 1, "i"),
        "tex_bump": (35, 1, "i"),
        "bump_is_normal": (36, 1, "b"),
        "nested2": (37, 1, "i"),
        "blend_w": (38, 1, "f"),
        "rt_ext": (39, RT_BINS, "tab"),
        "sigma_s": (39 + RT_BINS, 3, "f3"),
        "sigma_a": (42 + RT_BINS, 3, "f3"),
        "thickness": (45 + RT_BINS, 1, "f"),
        "phase_g": (46 + RT_BINS, 1, "f"),
    }
    WIDTH = 47 + RT_BINS

    def __init__(self, packed, present=None):
        self.packed = packed
        # STATIC set of material families present in the scene: the
        # branchless dispatch skips absent families entirely (a scene with
        # only diffuse shouldn't pay for microfacet math on every lane).
        # Travels as pytree aux data so it stays static under jit.
        self.present = (frozenset(present) if present is not None
                        else frozenset(MAT_NAMES.values()))

    @classmethod
    def from_table(cls, table):
        import numpy as np

        M = len(table.mtype)
        packed = np.zeros((max(M, 1), cls.WIDTH), np.float32)
        for f, (off, w, kind) in cls.SLOTS.items():
            arr = np.asarray(getattr(table, f))[:M]
            if kind == "i":
                packed[:M, off] = arr.astype(np.int32).view(np.float32)
            elif kind == "b":
                packed[:M, off] = arr.astype(np.float32)
            elif kind == "f":
                packed[:M, off] = arr.astype(np.float32)
            else:
                packed[:M, off : off + w] = arr.astype(np.float32).reshape(M, w)
        present = frozenset(int(t) for t in np.unique(np.asarray(table.mtype)))
        return cls(jnp.asarray(packed), present)


jax.tree_util.register_pytree_node(
    MaterialArrays,
    lambda m: ((m.packed,), m.present),
    lambda aux, ch: MaterialArrays(ch[0], aux),
)


def gather_params(mats: MaterialArrays, mid):
    """One packed row gather -> dict of per-lane parameter views."""
    row = small_table_gather(mats.packed, mid)
    out = {}
    for f, (off, w, kind) in MaterialArrays.SLOTS.items():
        if kind == "i":
            out[f] = jax.lax.bitcast_convert_type(row[..., off], jnp.int32)
        elif kind == "b":
            out[f] = row[..., off] > 0.5
        elif kind == "f":
            out[f] = row[..., off]
        else:
            out[f] = row[..., off : off + w]
    return out


def lane_flags(p):
    mt = p["mtype"]
    smooth = jnp.zeros_like(mt, dtype=bool)
    for t in SMOOTH_TYPES:
        smooth |= mt == t
    delta_only = jnp.zeros_like(smooth)
    for t in DELTA_TYPES:
        delta_only |= mt == t
    is_null = mt == MAT_NULL
    transmissive = jnp.zeros_like(smooth)
    for t in TRANSMISSIVE_TYPES:
        transmissive |= mt == t
    transmissive |= p["twosided"]
    return smooth, delta_only, is_null, transmissive


def _flip_sign(p, wi):
    flip = p["twosided"] & (wi[..., 2] < 0.0)
    return jnp.where(flip, -1.0, 1.0)


def _z(v, sign):
    return jnp.concatenate([v[..., :2], (v[..., 2] * sign)[..., None]], axis=-1)


def _reflect(wi):
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def _reflect_m(wi, m):
    return 2.0 * jnp.sum(wi * m, -1, keepdims=True) * m - wi


def _half(wi, wo):
    h = wi + wo
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)


def _rt_lookup(p, cos_theta):
    """Rough-transmittance table lookup (linear in cos)."""
    x = jnp.clip(cos_theta, 0.0, 1.0) * RT_BINS - 0.5
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, RT_BINS - 1)
    i1 = jnp.minimum(i0 + 1, RT_BINS - 1)
    t = jnp.clip(x - i0, 0.0, 1.0)
    tab = p["rt_ext"]
    ar = jnp.arange(cos_theta.shape[0])
    return (1 - t) * tab[ar, i0] + t * tab[ar, i1]


# ---------------------------------------------------------------------------
# family evaluators: each returns (f_cos [L,3], pdf [L]) for the SMOOTH part
# ---------------------------------------------------------------------------

def _diffuse_ep(p, wi, wo):
    both = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    f = p["reflectance"] * (INV_PI * jnp.maximum(wo[..., 2], 0.0))[..., None]
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    return (
        jnp.where(both[..., None], f, 0.0),
        jnp.where(both, pdf, 0.0),
    )


def _roughdiffuse_ep(p, wi, wo):
    """Oren-Nayar (qualitative model), src/bsdfs/roughdiffuse.cpp with
    useFastApprox semantics; sampled with the cosine hemisphere like the
    reference, so pdf is the plain cosine pdf."""
    both = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    ci = jnp.clip(wi[..., 2], 1e-6, 1.0)
    co = jnp.clip(wo[..., 2], 1e-6, 1.0)
    # conversion from the slope-area alpha to the ON sigma (roughdiffuse.cpp:
    # sigma = alpha / sqrt(2))
    sigma = p["alpha_u"] * 0.70710678
    s2 = sigma * sigma
    a = 1.0 - 0.5 * s2 / (s2 + 0.33)
    b = 0.45 * s2 / (s2 + 0.09)
    si = jnp.sqrt(jnp.clip(1 - ci * ci, 0.0, 1.0))
    so = jnp.sqrt(jnp.clip(1 - co * co, 0.0, 1.0))
    # cos(phi_i - phi_o) from the projected directions
    denom = jnp.maximum(si * so, 1e-9)
    cos_dphi = jnp.clip(
        (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1]) / denom, -1, 1)
    max_cos = jnp.maximum(cos_dphi, 0.0)
    sin_alpha = jnp.maximum(si, so)
    tan_beta = jnp.minimum(si / ci, so / co)
    f = p["reflectance"] * (
        INV_PI * co * (a + b * max_cos * sin_alpha * tan_beta))[..., None]
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(both[..., None], f, 0.0), jnp.where(both, pdf, 0.0)


def _ward_ep(p, wi, wo):
    """Anisotropic Ward model (src/bsdfs/ward.cpp, classic 'ward'
    variant): diffuse + gaussian-exponential specular on the half vector,
    sampled as a diffuse/specular mixture with the Ward half-vector
    warp."""
    both = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    ci = jnp.clip(wi[..., 2], 1e-6, 1.0)
    co = jnp.clip(wo[..., 2], 1e-6, 1.0)
    h = wi + wo
    hz2 = jnp.maximum(h[..., 2] * h[..., 2], 1e-12)
    au = jnp.maximum(p["alpha_u"], 1e-4)
    av = jnp.maximum(p["alpha_v"], 1e-4)
    expo = jnp.exp(-((h[..., 0] / au) ** 2 + (h[..., 1] / av) ** 2) / hz2)
    spec = expo / (4.0 * jnp.pi * au * av * jnp.sqrt(ci * co))
    f = (p["reflectance"] * (INV_PI * co)[..., None]
         + p["specular"] * (spec * co)[..., None])
    # specular pdf: half-vector gaussian warped to wo (ward.cpp pdf)
    hn = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    chz2 = jnp.maximum(hn[..., 2] * hn[..., 2], 1e-12)
    exph = jnp.exp(-((hn[..., 0] / au) ** 2 + (hn[..., 1] / av) ** 2) / chz2)
    pdf_h = exph / (4.0 * jnp.pi * au * av *
                    jnp.maximum(hn[..., 2] ** 3, 1e-12))
    dwh_dwo = 1.0 / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(wo * hn, -1)), 1e-12)
    w_s = p["spec_weight"]
    pdf = (w_s * pdf_h * dwh_dwo
           + (1 - w_s) * warp.square_to_cosine_hemisphere_pdf(wo))
    return jnp.where(both[..., None], f, 0.0), jnp.where(both, pdf, 0.0)


def _difftrans_ep(p, wi, wo):
    """Diffuse transmitter (src/bsdfs/difftrans.cpp): Lambertian lobe on
    the OPPOSITE hemisphere."""
    through = (wi[..., 2] > 0) & (wo[..., 2] < 0) | \
        (wi[..., 2] < 0) & (wo[..., 2] > 0)
    aco = jnp.abs(wo[..., 2])
    f = p["transmittance"] * (INV_PI * aco)[..., None]
    pdf = aco * INV_PI
    return (jnp.where(through[..., None], f, 0.0),
            jnp.where(through, pdf, 0.0))


def _phong_ep(p, wi, wo):
    """Modified Phong (src/bsdfs/phong.cpp): diffuse + normalized cosine
    lobe around the mirror direction, sampled as a weighted mixture."""
    both = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    e = p["exponent"]
    refl = _reflect(wi)
    alpha = jnp.clip(jnp.sum(refl * wo, -1), 0.0, 1.0)
    spec = (alpha ** e) * (e + 2) * (0.5 * INV_PI)
    co = jnp.maximum(wo[..., 2], 0.0)
    f = (p["reflectance"] * (INV_PI * co)[..., None]
         + p["specular"] * (spec * co)[..., None])
    w_s = p["spec_weight"]
    pdf_spec = (alpha ** e) * (e + 1) * (0.5 * INV_PI)
    pdf = w_s * pdf_spec + (1 - w_s) * warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(both[..., None], f, 0.0), jnp.where(both, pdf, 0.0)


def _roughconductor_ep(p, wi, wo):
    both = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    h = _half(wi, wo)
    d = MF.eval_d(p["dist"], p["alpha_u"], p["alpha_v"], h)
    F = fresnel_conductor_exact(jnp.sum(wi * h, -1), p["eta"], p["k"])
    g = MF.g_smith(p["dist"], p["alpha_u"], p["alpha_v"], wi, wo, h)
    val = (d * g / (4.0 * jnp.maximum(wi[..., 2], 1e-8)))[..., None] * F
    f = p["specular"] * val
    pdf_h = MF.pdf_visible(p["dist"], p["alpha_u"], p["alpha_v"], wi, h)
    pdf = pdf_h / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-12)
    return (
        jnp.where(both[..., None], f, 0.0),
        jnp.where(both & (d > 0), pdf, 0.0),
    )


def _plastic_ep(p, wi, wo):
    """Smooth plastic: diffuse lobe only in solid-angle measure
    (plastic.cpp eval/pdf); delta lobe handled in sampling."""
    both = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    Fi, _ = fresnel_dielectric_ext(wi[..., 2], p["eta_rel"])
    Fo, _ = fresnel_dielectric_ext(wo[..., 2], p["eta_rel"])
    diff = p["reflectance"]
    fdr = p["fdr_int"][..., None]
    diff = jnp.where(
        p["nonlinear"][..., None], diff / (1.0 - diff * fdr), diff / (1.0 - fdr)
    )
    f = diff * (
        warp.square_to_cosine_hemisphere_pdf(wo)
        * p["inv_eta2"] * (1 - Fi) * (1 - Fo)
    )[..., None]
    # pdf: diffuse share of the lobe-pick probability
    prob_spec = (Fi * p["spec_weight"]) / jnp.maximum(
        Fi * p["spec_weight"] + (1 - Fi) * (1 - p["spec_weight"]), 1e-12
    )
    pdf = warp.square_to_cosine_hemisphere_pdf(wo) * (1 - prob_spec)
    return (
        jnp.where(both[..., None], f, 0.0),
        jnp.where(both, pdf, 0.0),
    )


def _roughplastic_ep(p, wi, wo):
    both = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    h = _half(wi, wo)
    alpha = p["alpha_u"]
    d = MF.eval_d(p["dist"], alpha, alpha, h)
    F, _ = fresnel_dielectric_ext(jnp.sum(wi * h, -1), p["eta_rel"])
    g = MF.g_smith(p["dist"], alpha, alpha, wi, wo, h)
    spec = p["specular"] * (
        F * d * g / (4.0 * jnp.maximum(wi[..., 2], 1e-8))
    )[..., None]

    t12 = _rt_lookup(p, wi[..., 2])
    t21 = _rt_lookup(p, wo[..., 2])
    fdr = p["rt_fdr_int"][..., None]
    diff = p["reflectance"]
    diff = jnp.where(
        p["nonlinear"][..., None], diff / (1.0 - diff * fdr), diff / (1.0 - fdr)
    )
    diffuse = diff * (
        INV_PI * jnp.maximum(wo[..., 2], 0.0) * t12 * t21 * p["inv_eta2"]
    )[..., None]
    f = spec + diffuse

    prob_spec0 = 1.0 - t12
    prob_spec = (prob_spec0 * p["spec_weight"]) / jnp.maximum(
        prob_spec0 * p["spec_weight"]
        + (1 - prob_spec0) * (1 - p["spec_weight"]),
        1e-12,
    )
    pdf_h = MF.pdf_visible(p["dist"], alpha, alpha, wi, h)
    pdf_spec = pdf_h / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-12)
    pdf = pdf_spec * prob_spec + (1 - prob_spec) * warp.square_to_cosine_hemisphere_pdf(wo)
    return (
        jnp.where(both[..., None], f, 0.0),
        jnp.where(both, pdf, 0.0),
    )


def _roughdielectric_ep(p, wi, wo):
    """Walter-style rough dielectric: reflection + transmission lobes
    (roughdielectric.cpp eval/pdf), signed-cosine convention."""
    ci, co = wi[..., 2], wo[..., 2]
    reflect = ci * co > 0
    eta = jnp.where(ci > 0, p["eta_rel"], 1.0 / p["eta_rel"])
    h_r = _half(wi, wo)
    h_t = wi + wo * eta[..., None]
    h_t = h_t / jnp.maximum(jnp.linalg.norm(h_t, axis=-1, keepdims=True), 1e-20)
    h = jnp.where(reflect[..., None], h_r, h_t)
    h = h * jnp.sign(h[..., 2:3])

    alpha_u, alpha_v = p["alpha_u"], p["alpha_v"]
    d = MF.eval_d(p["dist"], alpha_u, alpha_v, h)
    F, _ = fresnel_dielectric_ext(jnp.sum(wi * h, -1), p["eta_rel"])
    g = MF.g_smith(p["dist"], alpha_u, alpha_v, wi, wo, h)

    val_r = F * d * g / (4.0 * jnp.maximum(jnp.abs(ci), 1e-8))
    ih = jnp.sum(wi * h, -1)
    oh = jnp.sum(wo * h, -1)
    denom = ih + eta * oh
    val_t = (
        (1 - F) * d * g * eta * eta * ih * oh
        / jnp.where(jnp.abs(ci * denom * denom) < 1e-12, 1.0, ci * denom * denom)
    )
    factor = jnp.where(ci > 0, 1.0 / p["eta_rel"], p["eta_rel"])
    val_t = jnp.abs(val_t * factor * factor)
    f = jnp.where(
        reflect[..., None],
        p["specular"] * val_r[..., None],
        p["transmittance"] * val_t[..., None],
    )
    f = jnp.where((d > 0)[..., None] & (ci != 0)[..., None], f, 0.0)

    wi_f = _z(wi, jnp.sign(ci))
    pdf_h = MF.pdf_visible(p["dist"], alpha_u, alpha_v, wi_f, h)
    dwh_dwo = jnp.where(
        reflect,
        1.0 / jnp.maximum(4.0 * jnp.abs(oh), 1e-12),
        (eta * eta * jnp.abs(oh)) / jnp.maximum(denom * denom, 1e-12),
    )
    pdf = jnp.abs(pdf_h * dwh_dwo) * jnp.where(reflect, F, 1 - F)
    return f, jnp.where(ci != 0, pdf, 0.0)


def _hk_phase_eval(g, wi, wo):
    """HG phase value in the reference's convention (src/phase/hg.cpp:
    eval uses 1+g^2+2g*dot(wi,wo) with both directions pointing AWAY
    from the event); g=0 degenerates to isotropic 1/4pi."""
    dp = jnp.sum(wi * wo, -1)
    temp = 1.0 + g * g + 2.0 * g * dp
    hg = (0.25 * INV_PI) * (1.0 - g * g) / jnp.maximum(
        temp * jnp.sqrt(jnp.maximum(temp, 1e-12)), 1e-12)
    return jnp.where(jnp.abs(g) < 1e-6, 0.25 * INV_PI, hg)


def _hk_parts(p, wi):
    sigma_t = p["sigma_s"] + p["sigma_a"]
    tau_d = sigma_t * p["thickness"][..., None]
    albedo = jnp.where(sigma_t > 0,
                       p["sigma_s"] / jnp.maximum(sigma_t, 1e-30), 0.0)
    aci = jnp.maximum(jnp.abs(wi[..., 2]), 1e-8)
    # per-wavelength probability of crossing the slab unscattered,
    # averaged over channels (hk.cpp:318-320)
    atten = jnp.exp(-tau_d / aci[..., None])
    prob_t = atten.mean(-1)
    return tau_d, albedo, atten, prob_t


def _hk_ep(p, wi, wo):
    """Hanrahan-Krueger single-scattering slab, smooth lobes only
    (src/bsdfs/hk.cpp:191-261 eval for ESolidAngle; the delta
    transmission lobe is handled in sampling)."""
    tau_d, albedo, _, prob_t = _hk_parts(p, wi)
    ci, co = wi[..., 2], wo[..., 2]
    aci = jnp.maximum(jnp.abs(ci), 1e-8)
    aco = jnp.maximum(jnp.abs(co), 1e-8)
    phase = _hk_phase_eval(p["phase_g"], wi, wo)
    dp = ci * co

    # reflection component (Hanrahan et al. '93 single scattering)
    f_r = albedo * (phase * ci / (ci + co))[..., None] * (
        1.0 - jnp.exp((-1.0 / aci - 1.0 / aco)[..., None] * tau_d))

    # transmission component; the |ci|==|co| limit uses the l'Hopital form
    near = jnp.abs(aci - aco) < 1e-5
    safe_diff = jnp.where(near, 1.0, aci - aco)[..., None]
    f_t_gen = albedo * (phase * aci)[..., None] / safe_diff * (
        jnp.exp(-tau_d / aci[..., None]) - jnp.exp(-tau_d / aco[..., None]))
    f_t_lim = albedo * phase[..., None] * tau_d / aco[..., None] * jnp.exp(
        -tau_d / aco[..., None])
    f_t = jnp.where(near[..., None], f_t_lim, f_t_gen)

    f = jnp.where((dp > 0)[..., None], f_r,
                  jnp.where((dp < 0)[..., None], f_t, 0.0)) * aco[..., None]
    pdf = phase * (1.0 - prob_t)
    ok = dp != 0
    return jnp.where(ok[..., None], jnp.maximum(f, 0.0), 0.0), \
        jnp.where(ok, pdf, 0.0)


_SMOOTH_EP = {
    MAT_DIFFUSE: _diffuse_ep,
    MAT_ROUGHDIFFUSE: _roughdiffuse_ep,
    MAT_PHONG: _phong_ep,
    MAT_WARD: _ward_ep,
    MAT_DIFFTRANS: _difftrans_ep,
    MAT_ROUGHCONDUCTOR: _roughconductor_ep,
    MAT_PLASTIC: _plastic_ep,
    MAT_ROUGHPLASTIC: _roughplastic_ep,
    MAT_ROUGHDIELECTRIC: _roughdielectric_ep,
    MAT_HK: _hk_ep,
}


def _eval_pdf(p, wi, wo, present=None):
    sign = _flip_sign(p, wi)
    wi_l, wo_l = _z(wi, sign), _z(wo, sign)
    f = jnp.zeros_like(wi)
    pdf = jnp.zeros(wi.shape[:-1])
    mt = p["mtype"]
    for t, fn in _SMOOTH_EP.items():
        if present is not None and t not in present:
            continue  # family statically absent from this scene
        sel = mt == t
        ft, pt = fn(p, wi_l, wo_l)
        f = jnp.where(sel[..., None], ft, f)
        pdf = jnp.where(sel, pt, pdf)
    return f, pdf


def eval_bsdf(p, wi, wo, present=None):
    return _eval_pdf(p, wi, wo, present)[0]


def pdf_bsdf(p, wi, wo, present=None):
    return _eval_pdf(p, wi, wo, present)[1]


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def sample_bsdf(p, wi, u2, present=None):
    """Returns (wo, weight=f*cos/pdf, pdf, sampled_delta, eta).

    u2 is [L, 3]: components 0-1 drive the lobe/warp sampling like the
    reference's Point2, component 2 is the extra 1D draw roughdielectric
    needs for its reflect/refract decision. For delta lobes pdf is the
    discrete lobe probability and weight carries f/pdf as in the
    reference's bsdf->sample convention."""
    sign = _flip_sign(p, wi)
    wi_l = _z(wi, sign)
    mt = p["mtype"]
    L = wi.shape[0]
    u1, u2b = u2[..., 0], u2[..., 1]
    u3 = u2[..., 2] if u2.shape[-1] > 2 else u2[..., 0]
    u2 = u2[..., :2]
    ci = wi_l[..., 2]
    on = (lambda t: t in present) if present is not None else (lambda t: True)
    any_cosine = any(map(on, (MAT_DIFFUSE, MAT_ROUGHDIFFUSE, MAT_PHONG,
                              MAT_WARD, MAT_DIFFTRANS)))

    wo = jnp.zeros_like(wi)
    weight = jnp.zeros_like(wi)
    pdf = jnp.zeros(L)
    delta = jnp.zeros(L, bool)
    eta_out = jnp.ones(L)

    def put(sel, wo_t, w_t, pdf_t, delta_t=None, eta_t=None):
        nonlocal wo, weight, pdf, delta, eta_out
        wo = jnp.where(sel[..., None], wo_t, wo)
        weight = jnp.where(sel[..., None], w_t, weight)
        pdf = jnp.where(sel, pdf_t, pdf)
        if delta_t is not None:
            delta = jnp.where(sel, delta_t, delta)
        if eta_t is not None:
            eta_out = jnp.where(sel, eta_t, eta_out)

    if any_cosine:
        # --- diffuse -----------------------------------------------------------
        wo_d = warp.square_to_cosine_hemisphere(u2)
        pdf_d = warp.square_to_cosine_hemisphere_pdf(wo_d)
        ok_d = ci > 0
        put(
            mt == MAT_DIFFUSE,
            wo_d,
            jnp.where(ok_d[..., None], p["reflectance"], 0.0),
            jnp.where(ok_d, pdf_d, 0.0),
        )

    if on(MAT_ROUGHDIFFUSE):
        # --- roughdiffuse (Oren-Nayar): cosine sample, weight = f/pdf ----------
        f_on, pdf_on = _roughdiffuse_ep(p, wi_l, wo_d)
        put(
            mt == MAT_ROUGHDIFFUSE,
            wo_d,
            jnp.where((ok_d & (pdf_on > 0))[..., None],
                      f_on / jnp.maximum(pdf_on, 1e-30)[..., None], 0.0),
            jnp.where(ok_d, pdf_on, 0.0),
        )

    if on(MAT_PHONG) or on(MAT_WARD):
        # --- phong: diffuse/specular mixture (phong.cpp:sample) ----------------
        e = p["exponent"]
        refl_m = _reflect(wi_l)
        cos_a = jnp.clip(u1, 1e-9, 1.0) ** (1.0 / (e + 1.0))
        sin_a = jnp.sqrt(jnp.clip(1 - cos_a * cos_a, 0.0, 1.0))
        phi_s = 2 * jnp.pi * u2b
        # orthonormal frame around the mirror direction
        up = jnp.where((jnp.abs(refl_m[..., 2]) < 0.999)[..., None],
                       jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), refl_m.shape),
                       jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), refl_m.shape))
        sx = jnp.cross(up, refl_m)
        sx = sx / jnp.maximum(
            jnp.linalg.norm(sx, axis=-1, keepdims=True), 1e-12)
        sy = jnp.cross(refl_m, sx)
        wo_sp = (sx * (sin_a * jnp.cos(phi_s))[..., None]
                 + sy * (sin_a * jnp.sin(phi_s))[..., None]
                 + refl_m * cos_a[..., None])
        pick_spec = u3 < p["spec_weight"]
        wo_ph = jnp.where(pick_spec[..., None], wo_sp, wo_d)
        f_ph, pdf_ph = _phong_ep(p, wi_l, wo_ph)
        ok_ph = ok_d & (pdf_ph > 0) & (wo_ph[..., 2] > 0)
        put(
            mt == MAT_PHONG,
            wo_ph,
            jnp.where(ok_ph[..., None],
                      f_ph / jnp.maximum(pdf_ph, 1e-30)[..., None], 0.0),
            jnp.where(ok_ph, pdf_ph, 0.0),
        )

    if on(MAT_WARD):
        # --- ward: diffuse/specular mixture with the Ward half-vector warp ------
        au = jnp.maximum(p["alpha_u"], 1e-4)
        av = jnp.maximum(p["alpha_v"], 1e-4)
        phi_w = 2 * jnp.pi * u2b
        hx = au * jnp.cos(phi_w)
        hy = av * jnp.sin(phi_w)
        inv_n = 1.0 / jnp.sqrt(jnp.maximum(hx * hx + hy * hy, 1e-20))
        cph, sph = hx * inv_n, hy * inv_n
        tan2_th = -jnp.log(jnp.clip(u1, 1e-9, 1.0)) / jnp.maximum(
            (cph / au) ** 2 + (sph / av) ** 2, 1e-12)
        cos_th = 1.0 / jnp.sqrt(1.0 + tan2_th)
        sin_th = jnp.sqrt(jnp.clip(1.0 - cos_th**2, 0.0, 1.0))
        h_w = jnp.stack([sin_th * cph, sin_th * sph, cos_th], -1)
        wo_ws = _reflect_m(wi_l, h_w)
        wo_w = jnp.where(pick_spec[..., None], wo_ws, wo_d)
        f_w, pdf_w = _ward_ep(p, wi_l, wo_w)
        ok_w = ok_d & (pdf_w > 0) & (wo_w[..., 2] > 0)
        put(
            mt == MAT_WARD,
            wo_w,
            jnp.where(ok_w[..., None],
                      f_w / jnp.maximum(pdf_w, 1e-30)[..., None], 0.0),
            jnp.where(ok_w, pdf_w, 0.0),
        )

    if on(MAT_DIFFTRANS):
        # --- difftrans: cosine lobe on the opposite hemisphere ------------------
        wo_dt = wo_d * jnp.asarray([1.0, 1.0, -1.0])
        put(
            mt == MAT_DIFFTRANS,
            wo_dt,
            jnp.where(ok_d[..., None], p["transmittance"], 0.0),
            jnp.where(ok_d, pdf_d, 0.0),
        )

    if on(MAT_CONDUCTOR):
        # --- conductor (delta) --------------------------------------------------
        F_c = fresnel_conductor_exact(ci, p["eta"], p["k"])
        put(
            mt == MAT_CONDUCTOR,
            _reflect(wi_l),
            jnp.where((ci > 0)[..., None], p["specular"] * F_c, 0.0),
            jnp.where(ci > 0, 1.0, 0.0),
            jnp.ones(L, bool),
        )

    if on(MAT_DIELECTRIC):
        # --- dielectric (two delta lobes) ---------------------------------------
        F_d, cos_t = fresnel_dielectric_ext(ci, p["eta_rel"])
        pick_refl = u1 <= F_d
        scale = jnp.where(ci > 0, 1.0 / p["eta_rel"], p["eta_rel"])
        wo_refr = jnp.stack(
            [-scale * wi_l[..., 0], -scale * wi_l[..., 1], cos_t], -1
        )
        factor = jnp.where(ci > 0, 1.0 / p["eta_rel"], p["eta_rel"])
        w_diel = jnp.where(
            pick_refl[..., None],
            p["specular"],
            p["transmittance"] * (factor * factor)[..., None],
        )
        put(
            mt == MAT_DIELECTRIC,
            jnp.where(pick_refl[..., None], _reflect(wi_l), wo_refr),
            w_diel,
            jnp.where(pick_refl, F_d, 1.0 - F_d),
            jnp.ones(L, bool),
            jnp.where(pick_refl, 1.0, jnp.where(ci > 0, p["eta_rel"], 1.0 / p["eta_rel"])),
        )

    if on(MAT_THINDIELECTRIC):
        # --- thin dielectric (delta R/T, thindielectric.cpp) --------------------
        R_t, _ = fresnel_dielectric_ext(jnp.abs(ci), p["eta_rel"])
        R_t = jnp.where(R_t < 1.0, 2.0 * R_t / (1.0 + R_t), R_t)
        pick_r = u1 <= R_t
        put(
            mt == MAT_THINDIELECTRIC,
            jnp.where(pick_r[..., None], _reflect(wi_l), -wi_l),
            jnp.where(pick_r[..., None], p["specular"], p["transmittance"]),
            jnp.where(pick_r, R_t, 1.0 - R_t),
            jnp.ones(L, bool),
        )

    if on(MAT_ROUGHCONDUCTOR):
        # --- rough conductor -----------------------------------------------------
        m_rc = MF.sample_visible(p["dist"], p["alpha_u"], p["alpha_v"], wi_l, u2)
        wo_rc = _reflect_m(wi_l, m_rc)
        f_rc, pdf_rc = _roughconductor_ep(p, wi_l, wo_rc)
        ok_rc = (ci > 0) & (wo_rc[..., 2] > 0) & (pdf_rc > 0)
        put(
            mt == MAT_ROUGHCONDUCTOR,
            wo_rc,
            jnp.where(ok_rc[..., None], f_rc / jnp.maximum(pdf_rc, 1e-30)[..., None], 0.0),
            jnp.where(ok_rc, pdf_rc, 0.0),
        )

    if on(MAT_PLASTIC):
        # --- plastic (delta + diffuse) -------------------------------------------
        Fi, _ = fresnel_dielectric_ext(ci, p["eta_rel"])
        prob_sp = (Fi * p["spec_weight"]) / jnp.maximum(
            Fi * p["spec_weight"] + (1 - Fi) * (1 - p["spec_weight"]), 1e-12
        )
        pick_sp = u1 < prob_sp
        u_re = jnp.stack(
            [jnp.clip((u1 - prob_sp) / jnp.maximum(1 - prob_sp, 1e-9), 0.0, 1.0 - 1e-7),
             u2b], -1)
        wo_pd = warp.square_to_cosine_hemisphere(u_re)
        Fo, _ = fresnel_dielectric_ext(wo_pd[..., 2], p["eta_rel"])
        diff = p["reflectance"]
        fdr = p["fdr_int"][..., None]
        diff = jnp.where(
            p["nonlinear"][..., None], diff / (1 - diff * fdr), diff / (1 - fdr)
        )
        w_pd = diff * (
            p["inv_eta2"] * (1 - Fi) * (1 - Fo) / jnp.maximum(1 - prob_sp, 1e-12)
        )[..., None]
        w_ps = p["specular"] * (Fi / jnp.maximum(prob_sp, 1e-12))[..., None]
        ok_p = ci > 0
        put(
            mt == MAT_PLASTIC,
            jnp.where(pick_sp[..., None], _reflect(wi_l), wo_pd),
            jnp.where(
                ok_p[..., None], jnp.where(pick_sp[..., None], w_ps, w_pd), 0.0
            ),
            jnp.where(
                ok_p,
                jnp.where(
                    pick_sp, prob_sp,
                    (1 - prob_sp) * warp.square_to_cosine_hemisphere_pdf(wo_pd),
                ),
                0.0,
            ),
            pick_sp,
        )

    if on(MAT_ROUGHPLASTIC):
        # --- rough plastic (glossy + diffuse) ------------------------------------
        t12 = _rt_lookup(p, ci)
        psp0 = 1.0 - t12
        psp = (psp0 * p["spec_weight"]) / jnp.maximum(
            psp0 * p["spec_weight"] + (1 - psp0) * (1 - p["spec_weight"]), 1e-12
        )
        pick_g = u2b < psp
        u_g = jnp.stack(
            [u1, jnp.clip(u2b / jnp.maximum(psp, 1e-9), 0.0, 1.0 - 1e-7)], -1
        )
        u_dd = jnp.stack(
            [u1, jnp.clip((u2b - psp) / jnp.maximum(1 - psp, 1e-9), 0.0, 1.0 - 1e-7)],
            -1,
        )
        alpha = p["alpha_u"]
        m_rp = MF.sample_visible(p["dist"], alpha, alpha, wi_l, u_g)
        wo_rp = jnp.where(
            pick_g[..., None],
            _reflect_m(wi_l, m_rp),
            warp.square_to_cosine_hemisphere(u_dd),
        )
        f_rp, pdf_rp = _roughplastic_ep(p, wi_l, wo_rp)
        ok_rp = (ci > 0) & (wo_rp[..., 2] > 0) & (pdf_rp > 0)
        put(
            mt == MAT_ROUGHPLASTIC,
            wo_rp,
            jnp.where(ok_rp[..., None], f_rp / jnp.maximum(pdf_rp, 1e-30)[..., None], 0.0),
            jnp.where(ok_rp, pdf_rp, 0.0),
        )

    if on(MAT_ROUGHDIELECTRIC):
        # --- rough dielectric -----------------------------------------------------
        wi_f = _z(wi_l, jnp.sign(ci))
        m_rd = MF.sample_visible(
            p["dist"], p["alpha_u"], p["alpha_v"], wi_f, u2[..., :2]
        )
        # back to true frame: microfacet normal on wi's side
        m_true = _z(m_rd, jnp.sign(ci))
        F_rd, cos_t_rd = fresnel_dielectric_ext(jnp.sum(wi_l * m_true, -1), p["eta_rel"])
        pick_r_rd = u3 <= F_rd  # independent lobe pick (roughdielectric.cpp)
        wo_rd_r = _reflect_m(wi_l, m_true)
        # refract about m_true
        eta_ratio = jnp.where(cos_t_rd < 0, 1.0 / p["eta_rel"], p["eta_rel"])
        dm = jnp.sum(wi_l * m_true, -1)
        wo_rd_t = m_true * (dm * eta_ratio + cos_t_rd)[..., None] - wi_l * eta_ratio[..., None]
        wo_rd = jnp.where(pick_r_rd[..., None], wo_rd_r, wo_rd_t)
        side_ok = jnp.where(
            pick_r_rd, wo_rd[..., 2] * ci > 0, wo_rd[..., 2] * ci < 0
        )
        f_rd, pdf_rd = _roughdielectric_ep(p, wi_l, wo_rd)
        ok_rd = side_ok & (pdf_rd > 0) & (ci != 0)
        eta_rd = jnp.where(
            pick_r_rd, 1.0, jnp.where(ci > 0, p["eta_rel"], 1.0 / p["eta_rel"])
        )
        put(
            mt == MAT_ROUGHDIELECTRIC,
            wo_rd,
            jnp.where(ok_rd[..., None], f_rd / jnp.maximum(pdf_rd, 1e-30)[..., None], 0.0),
            jnp.where(ok_rd, pdf_rd, 0.0),
            None,
            eta_rd,
        )

    if on(MAT_HK):
        # --- hk: delta transmission w.p. prob_t, else phase-function lobe
        #     around -wi (hk.cpp:305-374; hg.cpp:74-97 sampling) -------------
        tau_d, albedo, atten, prob_t = _hk_parts(p, wi_l)
        pick_t = u1 <= prob_t
        g = p["phase_g"]
        iso = jnp.abs(g) < 1e-6
        sqr = (1.0 - g * g) / jnp.maximum(
            1.0 - g + 2.0 * g * u2b, 1e-12)
        cos_hk = jnp.where(
            iso, 1.0 - 2.0 * u2b,
            (1.0 + g * g - sqr * sqr) / jnp.where(iso, 1.0, 2.0 * g))
        cos_hk = jnp.clip(cos_hk, -1.0, 1.0)
        sin_hk = jnp.sqrt(jnp.clip(1.0 - cos_hk * cos_hk, 0.0, 1.0))
        phi_hk = 2.0 * jnp.pi * u3
        # frame around -wi (HG samples relative to the propagation dir)
        ax = -wi_l
        up = jnp.where((jnp.abs(ax[..., 2]) < 0.999)[..., None],
                       jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), ax.shape),
                       jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), ax.shape))
        hx = jnp.cross(up, ax)
        hx = hx / jnp.maximum(jnp.linalg.norm(hx, axis=-1, keepdims=True),
                              1e-12)
        hy = jnp.cross(ax, hx)
        wo_ph = (hx * (sin_hk * jnp.cos(phi_hk))[..., None]
                 + hy * (sin_hk * jnp.sin(phi_hk))[..., None]
                 + ax * cos_hk[..., None])
        f_hk, pdf_hk = _hk_ep(p, wi_l, wo_ph)
        ok_hk = pdf_hk > 0
        wo_hk = jnp.where(pick_t[..., None], -wi_l, wo_ph)
        w_hk = jnp.where(
            pick_t[..., None],
            atten / jnp.maximum(prob_t, 1e-12)[..., None],
            jnp.where(ok_hk[..., None],
                      f_hk / jnp.maximum(pdf_hk, 1e-30)[..., None], 0.0))
        put(
            mt == MAT_HK,
            wo_hk,
            w_hk,
            jnp.where(pick_t, prob_t, pdf_hk),
            pick_t,
        )

    if on(MAT_NULL):
        # --- null ----------------------------------------------------------------
        put(
            mt == MAT_NULL,
            -wi_l,
            jnp.ones_like(wi),
            jnp.ones(L),
            jnp.ones(L, bool),
        )

    # un-flip for twosided lanes
    wo = _z(wo, sign)
    return wo, weight, pdf, delta, eta_out
