"""Dipole subsurface scattering (reference src/subsurface/dipole.cpp +
irrtree/irrproc): Jensen et al. classical dipole diffusion of multiple
scattering.

The reference blue-noise-samples the surface, gathers per-point
irradiance with worker threads, and answers render-time queries through
a hierarchical octree. The TPU-native design replaces the octree with a
DENSE pairwise evaluation: every shading lane evaluates the dipole
kernel against every irradiance sample point in VPU-blocked [L, B]
tiles (a few GFLOP per bounce at 64k lanes x 2k points — cheaper than
any gather-heavy tree descent on this hardware), and the irradiance
precompute is one cosine-hemisphere wavefront render over the sample
points.

Dipole constants (dipole.cpp configure()):
  sigma_s' = sigma_s (1-g);  sigma_t' = sigma_s' + sigma_a
  Fdr = fresnelDiffuseReflectance(1/eta);  A = (1+Fdr)/(1-Fdr)
  sigma_tr = sqrt(3 sigma_a sigma_t');  zr = 1/sigma_t';  zv = zr(1+4A/3)
Per query point (IsotropicDipoleQuery::operator(), :41-58):
  dr = sqrt(r^2+zr^2), dv = sqrt(r^2+zv^2)
  dMo = 1/4pi [ zr(sigma_tr+1/dr) e^{-sigma_tr dr}/dr^2
              + zv(sigma_tr+1/dv) e^{-sigma_tr dv}/dv^2 ]
  Lo = (1/pi) (sum dMo E_i A_i) (1 - FrDielExt(cos, eta))   (Lo(), :336)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bsdf.fresnel import fresnel_dielectric_ext, fresnel_diffuse_reflectance

PT_BLOCK = 256  # dipole-kernel tile width (bounds [L, B] intermediates)


class SubsurfArrays:
    """Pytree: per-subsurface dipole constants + shared sample points.

    params [S, 12]: zr(3) zv(3) sigma_tr(3) eta pad pad
    pts [P, 3] sample positions;  E [P, 3] irradiance;  area [P];
    pt_ss [P] i32 owning subsurface id;  tri_ss [T] i32 per packed tri.
    """

    FIELDS = ("params", "pts", "E", "area", "pt_ss", "tri_ss")

    def __init__(self, params, pts, E, area, pt_ss, tri_ss, num=0):
        self.params = params
        self.pts = pts
        self.E = E
        self.area = area
        self.pt_ss = pt_ss
        self.tri_ss = tri_ss
        self.num = num

    @classmethod
    def empty(cls):
        z = jnp.zeros
        return cls(z((1, 12)), z((PT_BLOCK, 3)), z((PT_BLOCK, 3)),
                   z(PT_BLOCK), jnp.full(PT_BLOCK, -1, jnp.int32),
                   jnp.full(1, -1, jnp.int32), num=0)


jax.tree_util.register_pytree_node(
    SubsurfArrays,
    lambda s: (tuple(getattr(s, f) for f in SubsurfArrays.FIELDS), s.num),
    lambda num, ch: SubsurfArrays(*ch, num=num),
)


def dipole_params(row):
    """Host: one subsurface spec dict -> the 12-float param row."""
    ss = np.asarray(row["sigma_s"], np.float64)
    sa = np.asarray(row["sigma_a"], np.float64)
    g = float(row["g"])
    eta = float(row["eta"])
    ssp = ss * (1.0 - g)
    stp = ssp + sa
    mfp = 1.0 / np.maximum(stp, 1e-12)
    fdr = float(fresnel_diffuse_reflectance(1.0 / eta))
    A = (1 + fdr) / (1 - fdr)
    sigma_tr = np.sqrt(3.0 * sa * stp)
    zr = mfp
    zv = mfp * (1.0 + 4.0 / 3.0 * A)
    out = np.zeros(12, np.float32)
    out[0:3] = zr
    out[3:6] = zv
    out[6:9] = sigma_tr
    out[9] = eta
    return out


def sample_surface_points(positions, faces, tri_ids, n_points, rng):
    """Host: area-weighted random points on the given triangles
    (stand-in for the reference's blue-noise set; per-point area =
    total/N). Returns (pts [N,3], area [N])."""
    v = positions[faces[tri_ids]]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    total = areas.sum()
    pdf = areas / max(total, 1e-30)
    pick = rng.choice(len(tri_ids), size=n_points, p=pdf)
    u = rng.random((n_points, 2))
    su = np.sqrt(u[:, 0])
    b1 = 1.0 - su
    b2 = u[:, 1] * su
    pts = (v[pick, 0] + e1[pick] * b1[:, None] + e2[pick] * b2[:, None])
    return pts, np.full(n_points, total / n_points, np.float32)


def lo_sub(ss: SubsurfArrays, ss_id, p, cos_o):
    """Diffuse subsurface exitance per lane (dipole.cpp Lo()).

    ss_id [L] i32 (-1 = none), p [L,3] hit points, cos_o [L] = n.wo.
    Scans the sample points in PT_BLOCK tiles to bound memory."""
    L = p.shape[0]
    active = (ss_id >= 0) & (cos_o > 0.0)
    sid = jnp.maximum(ss_id, 0)
    prm = ss.params[sid]                     # [L,12]
    zr = prm[:, 0:3]
    zv = prm[:, 3:6]
    s_tr = prm[:, 6:9]
    eta = prm[:, 9]
    P = ss.pts.shape[0]
    n_blk = P // PT_BLOCK

    def blk(acc, b):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b * PT_BLOCK,
                                                    PT_BLOCK, axis=0)
        q = sl(ss.pts)                        # [B,3]
        Eb = sl(ss.E) * sl(ss.area)[:, None]  # [B,3] E*A
        owner = sl(ss.pt_ss)                  # [B]
        d2 = jnp.sum((p[:, None, :] - q[None, :, :]) ** 2, -1)  # [L,B]
        own = (owner[None, :] == ss_id[:, None]) & active[:, None]
        contrib = jnp.zeros((L, 3))
        for c in range(3):
            dr = jnp.sqrt(d2 + zr[:, c:c + 1] ** 2)
            dv = jnp.sqrt(d2 + zv[:, c:c + 1] ** 2)
            st = s_tr[:, c:c + 1]
            dmo = (1.0 / (4.0 * np.pi)) * (
                zr[:, c:c + 1] * (st + 1.0 / dr) * jnp.exp(-st * dr)
                / (dr * dr)
                + zv[:, c:c + 1] * (st + 1.0 / dv) * jnp.exp(-st * dv)
                / (dv * dv))
            contrib = contrib.at[:, c].set(
                jnp.sum(jnp.where(own, dmo * Eb[None, :, c], 0.0), axis=1))
        return acc + contrib, None

    acc, _ = jax.lax.scan(blk, jnp.zeros((L, 3)), jnp.arange(n_blk))
    fr = 1.0 - fresnel_dielectric_ext(jnp.maximum(cos_o, 0.0), eta)[0]
    lo = acc * (1.0 / np.pi) * jnp.where(eta != 1.0, fr, 1.0)[:, None]
    return jnp.where(active[:, None], lo, 0.0)


def build_subsurface(sc, dev, n_points=2048, seed=17):
    """Precompute the irradiance point cloud for every subsurface in the
    scene and return the populated SubsurfArrays (the irrproc/irrtree
    stage of the reference, as one cosine-hemisphere wavefront render
    per point batch)."""
    from .integrators.driver import make_config
    from .integrators.wavefront import trace_paths

    rng = np.random.default_rng(seed)
    rows, all_pts, all_area, all_ss = [], [], [], []
    for i, row in enumerate(sc.subsurfaces):
        rows.append(dipole_params(row))
        tri_ids = np.arange(row["tri_start"],
                            row["tri_start"] + row["n_tris"])
        n_i = int(n_points * row.get("sample_mult", 1.0))
        n_i = max(PT_BLOCK, (n_i // PT_BLOCK) * PT_BLOCK)
        pts, area = sample_surface_points(
            sc.positions, sc.faces, tri_ids, n_i, rng)
        all_pts.append(pts)
        all_area.append(area)
        all_ss.append(np.full(n_i, i, np.int32))
        irr_samples = row["irr_samples"]

    pts = np.concatenate(all_pts).astype(np.float32)
    area = np.concatenate(all_area)
    pt_ss = np.concatenate(all_ss)
    P = len(pts)

    # per-point normals: nearest-triangle geometric normal via the tracer
    # is overkill; use the owning shape's closest sample triangle normal.
    # Instead gather irradiance over the FULL sphere halved by the local
    # normal: shoot cosine rays about the interpolated normal of the
    # triangle each point was sampled from.
    # (points came ordered per subsurface; recompute normals per point)
    norms = []
    for i, row in enumerate(sc.subsurfaces):
        tri_ids = np.arange(row["tri_start"],
                            row["tri_start"] + row["n_tris"])
        v = sc.positions[sc.faces[tri_ids]]
        fn = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
        # nearest sample triangle per point (cheap: points were sampled
        # from these tris; use nearest centroid)
        cent = v.mean(axis=1)
        mask = pt_ss == i
        d = np.linalg.norm(pts[mask][:, None, :] - cent[None], axis=-1)
        norms.append(fn[np.argmin(d, axis=1)])
    nrm = np.concatenate(norms).astype(np.float32)

    # irradiance: E = pi * mean(Li) over cosine-sampled directions
    cfg = make_config(sc, guiding=False, record_vertices=False,
                      has_subsurf=False)
    S = irr_samples
    key = jax.random.key(seed)
    E = np.zeros((P, 3), np.float32)
    eps = float(np.asarray(dev.eps))
    chunk = max(1, (1 << 16) // S)
    from .core.vecmath import build_frame
    from .core import warp

    @jax.jit
    def irr_chunk(k, o_rep, n_rep):
        n_lanes = o_rep.shape[0]
        u = jax.random.uniform(k, (n_lanes, 2))
        d_loc = warp.square_to_cosine_hemisphere(u)
        s_ax, t_ax = build_frame(n_rep)
        d = (s_ax * d_loc[:, 0:1] + t_ax * d_loc[:, 1:2]
             + n_rep * d_loc[:, 2:3])
        o = o_rep + n_rep * eps
        out = trace_paths(dev, cfg, k, o, d,
                          jnp.zeros(n_lanes), jnp.full(n_lanes, 3.4e38))
        return out["li"]

    for c0 in range(0, P, chunk):
        c1 = min(c0 + chunk, P)
        o_rep = jnp.asarray(np.repeat(pts[c0:c1], S, axis=0))
        n_rep = jnp.asarray(np.repeat(nrm[c0:c1], S, axis=0))
        li = np.asarray(irr_chunk(jax.random.fold_in(key, c0),
                                  o_rep, n_rep))
        E[c0:c1] = np.pi * li.reshape(c1 - c0, S, 3).mean(axis=1)

    perm = np.asarray(dev.geom.perm)
    tri_ss = (sc.tri_subsurf[perm] if len(perm)
              else np.zeros(1, np.int32))
    return SubsurfArrays(
        jnp.asarray(np.stack(rows)), jnp.asarray(pts), jnp.asarray(E),
        jnp.asarray(area.astype(np.float32)), jnp.asarray(pt_ss),
        jnp.asarray(tri_ss.astype(np.int32)), num=len(rows))
