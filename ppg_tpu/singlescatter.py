"""Single scattering in media with refractive boundaries (reference
src/subsurface/singlescatter.cpp, Holzschuch 2014) — the fast path
(fastSingleScatter=true, the plugin default).

At a hit on a singlescatter shape the reference's Lo()
(singlescatter.cpp:1581-1640) splits into a delta-reflection branch
(F * integrator->Li along the mirrored ray) and a refraction branch
feeding LoSingle (:1322-1579): per interior segment it finds the exit
thickness, connects `fssSamples` exponentially-placed points on the
interior ray to one sampled emitter through the refractive boundary
(Fresnel + HG phase + per-channel attenuation + the Holzschuch D
geometry term, :1416-1488), recurses on the internal reflection with
weight F_exit * exp(-sigma_t * thickness) up to singleScatterDepth
(:1376-1403), and adds the boundary exit transmittance
(integrator->Li through the far side, :1344-1374).

TPU-native redesign: the interior recursion unrolls to a masked
wavefront loop (the internal reflection direction is specular, so the
"recursion" is a deterministic weight product — no stack), and the two
nested integrator->Li calls become continuations of the SAME wavefront
path: the caller stochastically picks the entry reflection (prob F_in,
carried weight 1) or the first-exit transmission (prob 1-F_in, carried
weight (1-F_exit) * exp(-sigma_t * t0); the eta^2 radiance-compression
factors of entry and exit cancel) and overrides the path's next
segment with it — full recursive Li via the standard loop. Documented
deviation: exit transmittance at interior depth >= 1 (a TIR bounce
that later exits) is dropped from the continuation — its single
scattering is still integrated, only its transmitted background
radiance is lost (bounded by F_exit1 * (1-F_exit2) * exp(-sigma_t *
(t0+t1)), third order in the usual optically-thick configurations).
The multi-shape interior walk (LoSingle's its2.shape != shapes[0]
branch) is also simplified to the owning shape's boundary everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .accel.traverse import any_hit, closest_hit
from .bsdf.fresnel import fresnel_dielectric_ext
from .core.vecmath import dot

INV_FOURPI = 1.0 / (4.0 * np.pi)


class SSSArrays:
    """Pytree: per-subsurface singlescatter constants.

    params [S, 12]: sigma_s(3) sigma_t(3) g(3) eta r_min pad
    tri_ss [T] i32 owning singlescatter id per packed triangle (-1 for
    triangles without one, including dipole-owned ones).
    fss / depth are STATIC (shared across rows: the loop trip counts).
    """

    FIELDS = ("params", "tri_ss")

    def __init__(self, params, tri_ss, num=0, fss=2, depth=4):
        self.params = params
        self.tri_ss = tri_ss
        self.num = num
        self.fss = fss
        self.depth = depth

    @classmethod
    def empty(cls):
        return cls(jnp.zeros((1, 12)), jnp.full(1, -1, jnp.int32), num=0)


jax.tree_util.register_pytree_node(
    SSSArrays,
    lambda s: (tuple(getattr(s, f) for f in SSSArrays.FIELDS),
               (s.num, s.fss, s.depth)),
    lambda aux, ch: SSSArrays(*ch, num=aux[0], fss=aux[1], depth=aux[2]),
)


def sss_params(row):
    """Host: one singlescatter spec dict -> the 12-float param row."""
    ss = np.asarray(row["sigma_s"], np.float64)
    sa = np.asarray(row["sigma_a"], np.float64)
    st = ss + sa
    g = np.asarray(row.get("g3", [row["g"]] * 3), np.float64)
    out = np.zeros(12, np.float32)
    out[0:3] = ss
    out[3:6] = st
    out[6:9] = g
    out[9] = float(row["eta"])
    # m_radius = min mean-free path (singlescatter.cpp configure())
    out[10] = float(np.min(1.0 / np.maximum(st, 1e-12)))
    return out


def build_sss(sc, dev):
    """Host: populate SSSArrays from the scene's singlescatter rows."""
    rows = [r for r in sc.subsurfaces
            if r.get("kind", "dipole") == "singlescatter"]
    if not rows:
        return SSSArrays.empty()
    # tri -> singlescatter enumeration in GLOBAL subsurface id space,
    # gated to single-kind rows (dipole tris map to -1)
    single_ids = np.full(len(sc.subsurfaces), -1, np.int32)
    params = []
    for i, r in enumerate(sc.subsurfaces):
        if r.get("kind", "dipole") == "singlescatter":
            single_ids[i] = len(params)
            params.append(sss_params(r))
    perm = np.asarray(dev.geom.perm)
    tri_global = (sc.tri_subsurf[perm] if len(perm)
                  else np.zeros(1, np.int32))
    tri_ss = np.where(tri_global >= 0, single_ids[tri_global], -1)
    fss = max(int(r.get("fss_samples", 2)) for r in rows)
    depth = max(int(r.get("ss_depth", 4)) for r in rows)
    return SSSArrays(jnp.asarray(np.stack(params)),
                     jnp.asarray(tri_ss.astype(np.int32)),
                     num=len(params), fss=max(fss, 1),
                     depth=max(min(depth, 8), 1))


def _hg(cos_theta, g):
    """Henyey-Greenstein phase per channel (singlescatter.cpp:39-42)."""
    temp = 1.0 + g * g + 2.0 * g * cos_theta[..., None]
    return INV_FOURPI * (1.0 - g * g) / (temp * jnp.sqrt(
        jnp.maximum(temp, 1e-12)))


def _atten(sigma_t, dist):
    """Per-channel Beer attenuation; channels with sigma_t == 0 pass
    through (singlescatter.cpp attenuation(), :200-207)."""
    a = jnp.exp(-sigma_t * dist[..., None])
    return jnp.where(sigma_t > 0, a, 1.0)


def _refract(wi, n, cos_i, cos_t, eta):
    """Specular refraction given the signed cosines from
    fresnel_dielectric_ext (bsdf.h refract semantics): wi points away
    from the surface, n is the outward normal, eta = int/ext."""
    scale = jnp.where(cos_i > 0, 1.0 / eta, eta)
    return (-scale[..., None] * wi
            + (scale * cos_i + cos_t)[..., None] * n)


def single_scatter(scene, cfg, ss_id, p, d, sh_n, geo_n, key):
    """Interior single-scattering sum + boundary continuation for lanes
    hitting a singlescatter shape.

    ss_id [L] i32 (-1 = not a singlescatter lane), p hit points, d the
    incoming ray direction (toward the surface), sh_n/geo_n shading and
    geometric normals (outward). Returns (L_ss [L,3] radiance to add at
    throughput weight, cont dict(o, d, w, delta) overriding the path's
    next segment).
    """
    sss = scene.sss
    L = p.shape[0]
    active = ss_id >= 0
    sid = jnp.maximum(ss_id, 0)
    prm = sss.params[sid]
    sigma_s, sigma_t, g = prm[:, 0:3], prm[:, 3:6], prm[:, 6:9]
    eta = prm[:, 9]
    r_mfp = jnp.maximum(prm[:, 10], 1e-12)
    eps = scene.eps

    # face-forward normals (the entry side)
    flip = jnp.sign(dot(sh_n, -d))
    n_out = sh_n * flip[..., None]
    gn_out = geo_n * jnp.sign(dot(geo_n, -d))[..., None]

    wi = -d
    cos_i = dot(n_out, wi)
    F_in, cos_t_in = fresnel_dielectric_ext(cos_i, eta)
    d_int = _refract(wi, n_out, cos_i, cos_t_in, eta)
    d_int = d_int / jnp.maximum(
        jnp.linalg.norm(d_int, axis=-1, keepdims=True), 1e-12)

    # per-segment uniforms: 2 (emitter) + fss (distances) + 1 (entry
    # branch choice, first segment only)
    n_u = sss.depth * (2 + sss.fss) + 1
    u_all = jax.random.uniform(key, (L, n_u))
    u_col = [0]

    def take(k=1):
        a = u_col[0]
        u_col[0] = a + k
        return u_all[:, a:a + k]

    from .integrators.wavefront import (_sample_emitters, decode_row,
                                        fetch_row)

    L_acc = jnp.zeros((L, 3))
    # segment state
    p_cur = p - gn_out * eps
    d_cur = d_int
    w_seg = jnp.full((L, 3), 1.0) * (1.0 - F_in)[..., None]
    seg_on = active & (F_in < 1.0)
    cont_o = jnp.zeros((L, 3))
    cont_d = jnp.zeros((L, 3))
    cont_w = jnp.zeros((L, 3))

    for dep in range(sss.depth):
        # -- exit thickness (LoSingle forwardRay, :1332-1339) -----------
        tri_x, t_x, bu_x, bv_x = closest_hit(
            scene.geom, p_cur, d_cur, jnp.zeros(L),
            jnp.where(seg_on, 3.4e38, -1.0))
        seg_ok = seg_on & (tri_x >= 0)
        thick = jnp.where(seg_ok, t_x, 1.0)
        p_x = p_cur + thick[..., None] * d_cur
        # exit surface normal from the packed shade row (flipped to
        # face the interior ray's origin side, i.e. inward)
        row_x = fetch_row(scene, jnp.maximum(tri_x, 0))
        n_x, gn_x = decode_row(row_x, bu_x, bv_x)[0:2]
        n_x = n_x * jnp.sign(dot(n_x, -d_cur))[..., None]
        gn_x_out = gn_x * jnp.sign(dot(gn_x, -d_cur))[..., None]

        # -- one emitter sample for this segment (:1405-1412) ------------
        u_em = take(2)
        ds, _ = _sample_emitters(scene, cfg, p_cur, jnp.zeros((L, 3)),
                                 u_em)
        em_ok = seg_ok & (ds["pdf"] > 0)
        # eta^2 light compression entering the medium (:1408-1410); the
        # camera side carries the matching 1/eta^2 — both folded into
        # `value` here so the continuation weights stay eta-free
        value = ds["value"] * (eta * eta)[..., None]
        L_pos = p_cur + ds["dist"][..., None] * ds["d"]

        s_max = 1.0 - jnp.exp(-thick / r_mfp)
        d_samples = s_max / sss.fss
        w0 = (d_samples * r_mfp * ds["dist"] * ds["dist"])[..., None] \
            * sigma_s

        for s in range(sss.fss):
            u_s = take(1)[:, 0]
            dist = -jnp.log(jnp.maximum(1.0 - u_s * s_max, 1e-30)) * r_mfp
            ok = em_ok & (dist <= thick)
            V = p_cur + dist[..., None] * d_cur
            # boundary crossing toward the light (:1440-1447)
            VL = L_pos - V
            dVL = jnp.maximum(jnp.linalg.norm(VL, axis=-1), 1e-12)
            vl = VL / dVL[..., None]
            tri_b, t_b, bu_b, bv_b = closest_hit(
                scene.geom, V, vl, jnp.zeros(L),
                jnp.where(ok, dVL * (1.0 - 1e-4), -1.0))
            ok = ok & (tri_b >= 0)
            P = V + t_b[..., None] * vl
            row_b = fetch_row(scene, jnp.maximum(tri_b, 0))
            n_b = decode_row(row_b, bu_b, bv_b)[0]

            # shadow ray from the crossing to the light (:1454-1459)
            omega_l = L_pos - P
            d_l = jnp.maximum(jnp.linalg.norm(omega_l, axis=-1), 1e-12)
            omega_l = omega_l / d_l[..., None]
            so = P + jnp.sign(dot(n_b, omega_l))[..., None] * n_b * eps
            blocked = any_hit(scene.geom, so, omega_l, jnp.zeros(L),
                              jnp.where(ok, d_l * (1.0 - 1e-4) - eps,
                                        -1.0))
            ok = ok & ~blocked

            omega_v = V - P
            d_v = jnp.maximum(jnp.linalg.norm(omega_v, axis=-1), 1e-12)
            omega_v = omega_v / d_v[..., None]
            cos_l = dot(omega_l, n_b)
            cos_v = dot(omega_v, n_b)
            ok = ok & (jnp.abs(cos_l) > 1e-7) & (jnp.abs(cos_v) > 1e-7)
            F_b, _ = fresnel_dielectric_ext(cos_l, eta)
            cos_int = dot(omega_v, d_cur)
            phase = _hg(cos_int, g) * _atten(sigma_t, dist + d_v)
            D = (d_v + eta * d_l) * (
                jnp.abs(cos_l / jnp.where(jnp.abs(cos_v) > 1e-7, cos_v,
                                          1.0)) * d_v
                + jnp.abs(cos_v / jnp.where(jnp.abs(cos_l) > 1e-7, cos_l,
                                            1.0)) * eta * d_l)
            w = (1.0 - F_b)[..., None] / jnp.maximum(D, 1e-12)[..., None] \
                * phase * value * w0 \
                * jnp.exp(dist / r_mfp)[..., None]
            L_acc = L_acc + jnp.where(ok[..., None], w_seg * w, 0.0)

        # -- exit event: Fresnel split at the far boundary ---------------
        cos_x = dot(n_x, -d_cur)  # positive (n_x faced toward interior
        # ray's origin side = inside); pass SIGNED inside-cos: negative
        F_x, cos_t_x = fresnel_dielectric_ext(-cos_x, eta)
        att_seg = _atten(sigma_t, thick)
        if dep == 0:
            # first-exit transmission continuation (Lo()'s
            # refraction branch feeding the transmittance term)
            d_out = _refract(-d_cur, -n_x, -cos_x, cos_t_x, eta)
            d_out = d_out / jnp.maximum(
                jnp.linalg.norm(d_out, axis=-1, keepdims=True), 1e-12)
            cont_o = p_x - gn_x_out * eps  # gn_x_out faces inside;
            # stepping OPPOSITE it exits the surface
            cont_d = d_out
            cont_w = jnp.where(
                seg_ok[..., None],
                (1.0 - F_x)[..., None] * att_seg, 0.0)
        # internal mirror reflection (:1376-1403)
        d_cur = d_cur + 2.0 * cos_x[..., None] * n_x
        d_cur = d_cur / jnp.maximum(
            jnp.linalg.norm(d_cur, axis=-1, keepdims=True), 1e-12)
        p_cur = p_x + gn_x_out * eps
        w_seg = w_seg * F_x[..., None] * att_seg
        seg_on = seg_ok & jnp.any(w_seg > 1e-7, axis=-1)

    # -- entry branch choice for the path continuation -------------------
    u_c = take(1)[:, 0]
    pick_refl = u_c < F_in
    d_refl = d - 2.0 * dot(d, n_out)[..., None] * n_out
    o_refl = p + gn_out * eps
    cont = dict(
        o=jnp.where(pick_refl[..., None], o_refl, cont_o),
        d=jnp.where(pick_refl[..., None], d_refl, cont_d),
        # one-sample weights: reflection F/F = 1, transmission
        # (1-F_in)(1-F_x) atten / (1-F_in) = (1-F_x) atten
        w=jnp.where(pick_refl[..., None], jnp.ones((L, 3)), cont_w),
        valid=active & jnp.where(pick_refl, F_in > 0,
                                 jnp.any(cont_w > 0, axis=-1)),
    )
    return jnp.where(active[..., None], L_acc, 0.0), cont
