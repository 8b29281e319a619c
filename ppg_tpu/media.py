"""Participating media: homogeneous medium + isotropic / Henyey-Greenstein
phase functions (reference src/medium/homogeneous.cpp, src/phase/{isotropic,
hg}.cpp), integrated into the wavefront the way guided_path.cpp:1803-1893
handles media inside Li() — distance sampling against the surface hit,
phase sampling for in-medium scattering, transmittance-weighted NEE.
Guiding deliberately ignores media (README "No Support for Participating
Media"): medium vertices are never recorded into the SD-tree.

Medium rows [M, 8]: sigma_t(3) albedo(3) g pad. A lane's current medium
is an index (-1 = vacuum); shapes carry an interior-medium id and
transitions happen on transmission through their boundary.

Distance sampling follows HomogeneousMedium's 'balance' strategy:
a channel is picked uniformly, t = -ln(1-u)/sigma_t[ch]; the returned
weights use the balance-heuristic pdf over channels
(homogeneous.cpp sampleDistance/eval).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INV_4PI = 1.0 / (4.0 * np.pi)


class MediaArrays:
    FIELDS = ("rows",)

    def __init__(self, rows, num=None):
        self.rows = rows
        self.num = rows.shape[0] if num is None else num

    @classmethod
    def from_table(cls, table):
        """table: list of dicts(sigma_t rgb, albedo rgb, g)."""
        M = len(table)
        rows = np.zeros((max(M, 1), 8), np.float32)
        for i, m in enumerate(table):
            rows[i, 0:3] = m["sigma_t"]
            rows[i, 3:6] = m["albedo"]
            rows[i, 6] = m.get("g", 0.0)
        out = cls(jnp.asarray(rows))
        out.num = M
        return out

    @classmethod
    def empty(cls):
        return cls(jnp.zeros((1, 8), jnp.float32), num=0)


jax.tree_util.register_pytree_node(
    MediaArrays,
    lambda m: ((m.rows,), m.num),
    lambda num, ch: MediaArrays(ch[0], num=num),
)


def fetch(media: MediaArrays, mid):
    row = media.rows[jnp.clip(mid, 0, media.rows.shape[0] - 1)]
    in_medium = mid >= 0
    sigma_t = jnp.where(in_medium[..., None], row[:, 0:3], 0.0)
    albedo = jnp.where(in_medium[..., None], row[:, 3:6], 0.0)
    g = jnp.where(in_medium, row[:, 6], 0.0)
    return sigma_t, albedo, g


def transmittance(sigma_t, dist):
    """e^{-sigma_t * d} per channel."""
    return jnp.exp(-sigma_t * jnp.maximum(dist, 0.0)[..., None])


def sample_distance(sigma_t, albedo, t_surf, u_chan, u_dist):
    """HomogeneousMedium::sampleDistance with the balance channel
    strategy. Returns (is_medium, t, weight[3]) where weight already
    folds sigma_s/pdf (medium) or T/pdf_surf (surface)."""
    ch = jnp.clip((u_chan * 3).astype(jnp.int32), 0, 2)
    st_ch = jnp.take_along_axis(sigma_t, ch[..., None], -1)[..., 0]
    active = st_ch > 0
    t = jnp.where(active,
                  -jnp.log(jnp.maximum(1.0 - u_dist, 1e-38))
                  / jnp.maximum(st_ch, 1e-38), jnp.inf)
    is_medium = active & (t < t_surf)

    tr_t = transmittance(sigma_t, t)
    tr_s = transmittance(sigma_t, t_surf)
    # balance-heuristic pdfs averaged over the 3 channels
    pdf_medium = jnp.mean(sigma_t * tr_t, -1)
    pdf_surf = jnp.mean(tr_s, -1)
    sigma_s = sigma_t * albedo
    w_medium = sigma_s * tr_t / jnp.maximum(pdf_medium, 1e-38)[..., None]
    w_surf = tr_s / jnp.maximum(pdf_surf, 1e-38)[..., None]
    w = jnp.where(is_medium[..., None], w_medium, w_surf)
    # vacuum lanes: weight 1, never a medium event
    vac = jnp.all(sigma_t <= 0, -1)
    w = jnp.where(vac[..., None], 1.0, w)
    return is_medium & ~vac, jnp.where(is_medium, t, t_surf), w


def hg_eval_pdf(g, cos_theta):
    """HG phase value (= pdf, normalized over the sphere). cos_theta is
    measured from the PROPAGATION direction (forward peak for g > 0);
    hg.cpp uses dot(wi, wo) with wi pointing backwards, i.e. the same
    distribution with flipped sign."""
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    iso = jnp.abs(g) < 1e-4
    hg = INV_4PI * (1.0 - g * g) / jnp.maximum(
        denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)
    return jnp.where(iso, INV_4PI, hg)


def hg_sample(g, d_in, u2):
    """Sample the outgoing direction around d_in (hg.cpp:sample).
    Returns (d_out, pdf)."""
    iso = jnp.abs(g) < 1e-4
    sq = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
    ct_hg = (1.0 + g * g - sq * sq) / jnp.maximum(2.0 * g, 1e-8)
    ct_iso = 1.0 - 2.0 * u2[..., 0]
    cos_theta = jnp.where(iso, ct_iso, jnp.clip(ct_hg, -1.0, 1.0))
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta**2, 0.0, 1.0))
    phi = 2.0 * np.pi * u2[..., 1]
    # frame around d_in
    up = jnp.where((jnp.abs(d_in[..., 2]) < 0.999)[..., None],
                   jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), d_in.shape),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), d_in.shape))
    sx = jnp.cross(up, d_in)
    sx = sx / jnp.maximum(jnp.linalg.norm(sx, axis=-1, keepdims=True), 1e-12)
    sy = jnp.cross(d_in, sx)
    d_out = (sx * (sin_theta * jnp.cos(phi))[..., None]
             + sy * (sin_theta * jnp.sin(phi))[..., None]
             + d_in * cos_theta[..., None])
    return d_out, hg_eval_pdf(g, cos_theta)
