"""Participating media: homogeneous + heterogeneous media with
isotropic / Henyey-Greenstein phase functions (reference
src/medium/{homogeneous,heterogeneous}.cpp, src/phase/{isotropic,hg}.cpp,
src/volume/{gridvolume,constvolume}.cpp), integrated into the wavefront
the way guided_path.cpp:1803-1893 handles media inside Li() — distance
sampling against the surface hit, phase sampling for in-medium
scattering, transmittance-weighted NEE. Guiding deliberately ignores
media (README "No Support for Participating Media"): medium vertices
are never recorded into the SD-tree.

Medium rows [M, 28]: sigma_t(3) albedo(3) g hetero majorant scale
grid_offset res(3) world_to_grid(3x4). A lane's current medium is an
index (-1 = vacuum); shapes carry an interior-medium id and transitions
happen on transmission through their boundary.

Homogeneous distance sampling follows HomogeneousMedium's 'balance'
strategy: a channel is picked uniformly, t = -ln(1-u)/sigma_t[ch]; the
returned weights use the balance-heuristic pdf over channels
(homogeneous.cpp sampleDistance/eval).

Heterogeneous media use stochastic Woodcock (delta) tracking against
the scale*maxDensity majorant (heterogeneous.cpp EWoodcockTracking,
m_maxDensity at :239), restructured as blocked lax.scans under a
while_loop per wavefront bounce: each block is a fixed-trip scan (so
the common case costs one block with no per-event condition checks) and
the loop runs until every lane has decided, so the estimate is never
budget-truncated. Shadow transmittance uses ratio tracking with the
same structure. Density grids are spectrally uniform scalars like
the reference (heterogeneous.cpp:109); albedo is a constant spectrum
(constvolume) — gridvolume albedo is not supported yet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INV_4PI = 1.0 / (4.0 * np.pi)
ROW_W = 36
KKAY_G = 3.0  # g-slot sentinel: Kajiya-Kay fiber phase (kkay.cpp)
MICROFLAKE_G = 5.0  # g-slot sentinel: SGGX microflake fiber phase


def kkay_normalization(exponent):
    """Simpson-quadrature normalization for perpendicular illumination
    (kkay.cpp configure(), 1000 intervals)."""
    n = 1000
    h = np.pi / n
    theta = h * np.arange(1, n)
    vals = np.cos(theta - np.pi / 2) ** exponent * np.sin(theta)
    coef = np.where(np.arange(1, n) % 2 == 1, 4.0, 2.0)
    integral = np.sum(vals * coef) * h / 3.0
    return float(1.0 / (integral * 2.0 * np.pi))
WOODCOCK_STEPS = 64  # fixed majorant-interaction budget per bounce


class MediaArrays:
    FIELDS = ("rows", "grid")

    def __init__(self, rows, grid=None, num=None, has_orient=False):
        self.rows = rows
        self.grid = grid if grid is not None else jnp.zeros(1, jnp.float32)
        self.num = rows.shape[0] if num is None else num
        # static: any medium carries an orientation volume (pytree aux —
        # fetch() gates the grid lookup on it at trace time)
        self.has_orient = bool(has_orient)

    @classmethod
    def from_table(cls, table):
        """table: list of dicts(sigma_t rgb, albedo rgb, g) for
        homogeneous media, plus (hetero=True, density [Z,Y,X] f32,
        bbox_min/bbox_max, to_world 4x4, scale) for heterogeneous."""
        M = len(table)
        rows = np.zeros((max(M, 1), ROW_W), np.float32)
        grids = [np.zeros(1, np.float32)]
        goff = 1
        for i, m in enumerate(table):
            rows[i, 3:6] = m["albedo"]
            rows[i, 6] = m.get("g", 0.0)
            # Kajiya-Kay fiber phase (g sentinel KKAY_G): constant fiber
            # orientation + (ks, kd, exponent, normalization)
            if m.get("g", 0.0) == KKAY_G:
                o = np.asarray(m.get("orientation", [0.0, 0.0, 1.0]),
                               np.float64)
                ln = np.linalg.norm(o)
                rows[i, 28:31] = o / ln if ln > 0 else 0.0
                rows[i, 31] = m.get("ks", 0.4)
                rows[i, 32] = m.get("kd", 0.2)
                rows[i, 33] = m.get("exponent", 4.0)
                rows[i, 34] = kkay_normalization(m.get("exponent", 4.0))
            # SGGX microflake fiber phase (src/phase/microflake.cpp):
            # fiber-aligned flake distribution S = I - (1-beta^2) m m^T;
            # the reference's gaussian-fiber stddev maps to beta by the
            # small-sigma moment match beta = stddev*sqrt(pi/2)
            if m.get("g", 0.0) == MICROFLAKE_G:
                o = np.asarray(m.get("orientation", [0.0, 0.0, 1.0]),
                               np.float64)
                ln = np.linalg.norm(o)
                rows[i, 28:31] = o / ln if ln > 0 else (0.0, 0.0, 1.0)
                beta = float(m.get("stddev", 0.25)) * np.sqrt(np.pi / 2)
                rows[i, 31] = min(max(beta, 1e-3), 1.0)
                ogrid = m.get("orientation_grid")
                if ogrid is not None:
                    og = np.asarray(ogrid, np.float32)  # [Z,Y,X,3]
                    if og.ndim != 4 or og.shape[-1] != 3:
                        raise ValueError("orientation volume must be "
                                         "3-channel [Z,Y,X,3]")
                    rows[i, 35] = float(goff)
                    grids.append(og.reshape(-1))
                    goff += og.size
            if not m.get("hetero"):
                rows[i, 0:3] = m["sigma_t"]
                continue
            dens = np.asarray(m["density"], np.float32)  # [Z,Y,X]
            zr, yr, xr = dens.shape
            scale = float(m.get("scale", 1.0))
            rows[i, 7] = 1.0
            rows[i, 8] = scale * float(dens.max())
            rows[i, 9] = scale
            rows[i, 10] = float(goff)
            rows[i, 11:14] = (xr, yr, zr)
            # world -> grid-index affine (gridvolume.cpp:188-196):
            # scale((res-1)/extent) . translate(-bbox_min) . worldToVolume
            ext = np.asarray(m["bbox_max"], np.float64) - np.asarray(
                m["bbox_min"], np.float64)
            s = np.diag(np.append((np.array([xr, yr, zr]) - 1)
                                  / np.maximum(ext, 1e-30), 1.0))
            t = np.eye(4)
            t[:3, 3] = -np.asarray(m["bbox_min"], np.float64)
            w2v = np.linalg.inv(np.asarray(m.get("to_world", np.eye(4)),
                                           np.float64))
            w2g = s @ t @ w2v
            rows[i, 14:26] = w2g[:3, :].reshape(-1)
            grids.append(dens.reshape(-1))
            goff += dens.size
        out = cls(jnp.asarray(rows), jnp.asarray(np.concatenate(grids)),
                  has_orient=bool(np.any(rows[:, 35] > 0)))
        out.num = M
        return out

    @classmethod
    def empty(cls):
        return cls(jnp.zeros((1, ROW_W), jnp.float32), num=0)

    @property
    def any_hetero(self):
        return bool(np.any(np.asarray(self.rows[:, 7]) > 0))


jax.tree_util.register_pytree_node(
    MediaArrays,
    lambda m: ((m.rows, m.grid), (m.num, m.has_orient)),
    lambda aux, ch: MediaArrays(
        ch[0], ch[1],
        num=aux[0] if isinstance(aux, tuple) else aux,
        has_orient=aux[1] if isinstance(aux, tuple) else False),
)


def fetch(media: MediaArrays, mid, x=None):
    """Per-lane medium data. `x` ([L,3] world positions, optional):
    fiber phases (kkay / microflake) with an orientation volume resolve
    their local axis at x via the density grid's world->grid transform
    (the reference samples the medium's orientation volume at the
    interaction point, heterogeneous.cpp lookupVector)."""
    row = media.rows[jnp.clip(mid, 0, media.rows.shape[0] - 1)]
    in_medium = mid >= 0
    sigma_t = jnp.where(in_medium[..., None], row[:, 0:3], 0.0)
    albedo = jnp.where(in_medium[..., None], row[:, 3:6], 0.0)
    g = jnp.where(in_medium, row[:, 6], 0.0)
    axis = row[:, 28:31]
    if x is not None and media.has_orient:
        vax = _orientation_lookup(media, row, x)
        ln = jnp.linalg.norm(vax, axis=-1, keepdims=True)
        ok = (row[:, 35] > 0) & (ln[..., 0] > 1e-6)
        axis = jnp.where(ok[..., None], vax / jnp.maximum(ln, 1e-12), axis)
    return sigma_t, albedo, PhaseParams(g, row, axis)


def _orientation_lookup(media: MediaArrays, row, x):
    """Nearest-cell orientation fetch through the density grid's
    world->grid affine (vectors are directions: nearest sampling avoids
    interpolating across opposed fibers, matching the reference's
    lookupVector usage for microflakes)."""
    w2g = row[:, 14:26].reshape(-1, 3, 4)
    gpos = jnp.einsum("lij,lj->li", w2g[:, :, :3], x) + w2g[:, :, 3]
    res = row[:, 11:14]  # (xr, yr, zr)
    gi = jnp.clip(jnp.round(gpos), 0, jnp.maximum(res - 1, 0)).astype(
        jnp.int32)
    xr = res[:, 0].astype(jnp.int32)
    yr = res[:, 1].astype(jnp.int32)
    off = row[:, 35].astype(jnp.int32)
    lin = ((gi[:, 2] * yr + gi[:, 1]) * xr + gi[:, 0]) * 3
    base = jnp.clip(off + lin, 0, media.grid.shape[0] - 3)
    return jnp.stack([media.grid[base], media.grid[base + 1],
                      media.grid[base + 2]], axis=-1)


class PhaseParams:
    """Per-lane phase dispatch data (pytree): the g slot doubles as a
    type sentinel (|g|<=1 HG/iso, RAYLEIGH_G, KKAY_G, MICROFLAKE_G);
    fiber lanes read their axis from `axis` (constant row orientation,
    or the orientation volume resolved at the interaction point) and
    kkay ks/kd/exponent/normalization from the row."""

    def __init__(self, g, row, axis=None):
        self.g = g
        self.row = row
        self.axis = row[:, 28:31] if axis is None else axis


jax.tree_util.register_pytree_node(
    PhaseParams,
    lambda p: ((p.g, p.row, p.axis), None),
    lambda aux, ch: PhaseParams(*ch),
)


def fetch_row(media: MediaArrays, mid):
    return media.rows[jnp.clip(mid, 0, media.rows.shape[0] - 1)]


def density(media: MediaArrays, row, p):
    """Trilinear scalar density lookup (gridvolume.cpp lookupFloat);
    out-of-grid points return 0. row: [L, ROW_W] medium rows, p: [L,3]."""
    w2g = row[:, 14:26].reshape(-1, 3, 4)
    g = jnp.einsum("lij,lj->li", w2g[:, :, :3], p) + w2g[:, :, 3]
    res = row[:, 11:14]
    off = row[:, 10].astype(jnp.int32)
    # insideness is tested on the CONTINUOUS grid coordinate (the full
    # bbox, matching gridvolume lookupFloat); points in the last cell or
    # exactly on the max face interpolate via the clamped base cell
    inside = jnp.all((g >= 0) & (g <= res - 1), -1)
    x1 = jnp.floor(g).astype(jnp.int32)
    nx = res[:, 0].astype(jnp.int32)
    ny = res[:, 1].astype(jnp.int32)
    x1c = jnp.clip(x1, 0, jnp.maximum(res.astype(jnp.int32) - 2, 0))
    f = g - x1c  # fractional offset from the CLAMPED cell (1.0 at max face)

    def at(dx, dy, dz):
        idx = ((x1c[:, 2] + dz) * ny + (x1c[:, 1] + dy)) * nx + (x1c[:, 0] + dx)
        return media.grid[off + idx]

    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    d = (((at(0, 0, 0) * (1 - fx) + at(1, 0, 0) * fx) * (1 - fy)
          + (at(0, 1, 0) * (1 - fx) + at(1, 1, 0) * fx) * fy) * (1 - fz)
         + ((at(0, 0, 1) * (1 - fx) + at(1, 0, 1) * fx) * (1 - fy)
            + (at(0, 1, 1) * (1 - fx) + at(1, 1, 1) * fx) * fy) * fz)
    return jnp.where(inside, d, 0.0)


WOODCOCK_MAX_BLOCKS = 1024  # watchdog bound on majorant-event blocks


def woodcock_sample(media: MediaArrays, mid, o, d, t_surf, key,
                    n_steps=WOODCOCK_STEPS):
    """Delta tracking along o + t d up to t_surf. Returns
    (is_medium, t, weight[3]) — weight is the single-scattering albedo
    at a scatter event, 1 for surface escape (the acceptance test makes
    the transmittance estimate unbiased). Lanes whose majorant is 0
    always escape.

    Majorant events are consumed in `n_steps`-iteration blocks inside a
    while_loop that runs until every lane has decided (scatter or
    surface), so a poor majorant bound (one dense voxel over a thin
    grid) or a long maj*segment cannot exhaust a fixed budget and bias
    the medium toward transparency. The block structure amortizes the
    loop-condition cost the same way trace_regen's BLK scan does."""
    L = o.shape[0]
    row = fetch_row(media, mid)
    maj = row[:, 8]
    alb = row[:, 3:6]
    scale = row[:, 9]
    active0 = (mid >= 0) & (row[:, 7] > 0) & (maj > 0)

    def step(carry, uk):
        t, alive, hit_med = carry
        t2 = t - jnp.log(jnp.maximum(1.0 - uk[:, 0], 1e-38)) / jnp.maximum(
            maj, 1e-38)
        past = t2 >= t_surf
        dens = density(media, row, o + t2[:, None] * d) * scale
        accept = uk[:, 1] * maj < dens
        new_hit = alive & ~past & accept
        t = jnp.where(alive & ~past, t2, t)
        hit_med = hit_med | new_hit
        alive = alive & ~past & ~accept
        return (t, alive, hit_med), None

    def w_cond(st):
        (t, alive, hit_med), blk = st
        return jnp.any(alive) & (blk < WOODCOCK_MAX_BLOCKS)

    def w_body(st):
        carry, blk = st
        u = jax.random.uniform(jax.random.fold_in(key, blk),
                               (n_steps, L, 2))
        carry, _ = jax.lax.scan(step, carry, u)
        return carry, blk + 1

    (t, alive, hit_med), _ = jax.lax.while_loop(
        w_cond, w_body,
        ((jnp.zeros(L), active0, jnp.zeros(L, bool)), jnp.int32(0)))
    is_med = hit_med
    w = jnp.where(is_med[:, None], alb, 1.0)
    return is_med, jnp.where(is_med, t, t_surf), w


def ratio_transmittance(media: MediaArrays, mid, o, d, dist, key,
                        n_steps=WOODCOCK_STEPS):
    """Ratio-tracking transmittance estimate through a heterogeneous
    medium over [0, dist] (unbiased; heterogeneous.cpp uses analytic
    Simpson quadrature for the deterministic variant). Blocks of
    `n_steps` events run under a while_loop until every lane has crossed
    `dist` (see woodcock_sample) so the product is never truncated."""
    L = o.shape[0]
    row = fetch_row(media, mid)
    maj = row[:, 8]
    scale = row[:, 9]
    active0 = (mid >= 0) & (row[:, 7] > 0) & (maj > 0)

    def step(carry, uk):
        t, T, alive = carry
        t2 = t - jnp.log(jnp.maximum(1.0 - uk, 1e-38)) / jnp.maximum(
            maj, 1e-38)
        past = t2 >= dist
        dens = density(media, row, o + t2[:, None] * d) * scale
        T = jnp.where(alive & ~past,
                      T * jnp.maximum(1.0 - dens / jnp.maximum(maj, 1e-38),
                                      0.0),
                      T)
        t = jnp.where(alive & ~past, t2, t)
        alive = alive & ~past
        return (t, T, alive), None

    def w_cond(st):
        (t, T, alive), blk = st
        return jnp.any(alive) & (blk < WOODCOCK_MAX_BLOCKS)

    def w_body(st):
        carry, blk = st
        u = jax.random.uniform(jax.random.fold_in(key, blk), (n_steps, L))
        carry, _ = jax.lax.scan(step, carry, u)
        return carry, blk + 1

    (_, T, _), _ = jax.lax.while_loop(
        w_cond, w_body,
        ((jnp.zeros(L), jnp.ones(L), active0), jnp.int32(0)))
    return jnp.where(active0, T, 1.0)


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


def _dir_around(d_in, cos_theta, phi):
    """Direction at (cos_theta, phi) in a frame around d_in."""
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta**2, 0.0, 1.0))
    up = jnp.where((jnp.abs(d_in[..., 2]) < 0.999)[..., None],
                   jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), d_in.shape),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), d_in.shape))
    sx = jnp.cross(up, d_in)
    sx = sx / jnp.maximum(jnp.linalg.norm(sx, axis=-1, keepdims=True), 1e-12)
    sy = jnp.cross(d_in, sx)
    return (sx * (sin_theta * jnp.cos(phi))[..., None]
            + sy * (sin_theta * jnp.sin(phi))[..., None]
            + d_in * cos_theta[..., None])


def hg_sample(g, d_in, u2):
    """Sample the outgoing direction around d_in (hg.cpp:sample).
    Returns (d_out, pdf)."""
    iso = jnp.abs(g) < 1e-4
    sq = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
    ct_hg = (1.0 + g * g - sq * sq) / jnp.maximum(2.0 * g, 1e-8)
    ct_iso = 1.0 - 2.0 * u2[..., 0]
    cos_theta = jnp.where(iso, ct_iso, jnp.clip(ct_hg, -1.0, 1.0))
    d_out = _dir_around(d_in, cos_theta, 2.0 * np.pi * u2[..., 1])
    return d_out, hg_eval_pdf(g, cos_theta)


# phase-type sentinel carried in the per-medium g slot: |g| <= 1 is
# HG/isotropic, RAYLEIGH_G selects the Rayleigh phase (rayleigh.cpp)
RAYLEIGH_G = 2.0


def rayleigh_eval_pdf(cos_theta):
    """Rayleigh phase value (= pdf): 3/(16 pi) (1 + cos^2)."""
    return 3.0 / (16.0 * np.pi) * (1.0 + cos_theta * cos_theta)


def rayleigh_sample_ct(u):
    """Invert the Rayleigh CDF over cos_theta: c^3 + 3c + (4 - 8u) = 0,
    solved in closed form (Cardano with p=3: c = z - 1/z)."""
    d = 4.0 - 8.0 * u
    s = jnp.sqrt(d * d * 0.25 + 1.0)
    z = jnp.cbrt(-0.5 * d + s)
    return jnp.clip(z - 1.0 / z, -1.0, 1.0)


def phase_eval_pdf(g, cos_theta):
    """Per-lane phase dispatch over the g slot (HG/iso vs Rayleigh)."""
    ray = g > 1.5
    return jnp.where(ray, rayleigh_eval_pdf(cos_theta),
                     hg_eval_pdf(jnp.where(ray, 0.0, g), cos_theta))


def phase_sample(g, d_in, u2):
    ray = g > 1.5
    g_hg = jnp.where(ray, 0.0, g)
    iso = jnp.abs(g_hg) < 1e-4
    sq = (1.0 - g_hg * g_hg) / (1.0 - g_hg + 2.0 * g_hg * u2[..., 0])
    # sign-preserving guard: a plain maximum() clamp would flip the
    # division for g < 0 and mirror every backward-scattering lobe
    den = 2.0 * g_hg
    den = jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)
    ct_hg = (1.0 + g_hg * g_hg - sq * sq) / den
    ct_iso = 1.0 - 2.0 * u2[..., 0]
    cos_theta = jnp.where(iso, ct_iso, jnp.clip(ct_hg, -1.0, 1.0))
    cos_theta = jnp.where(ray, rayleigh_sample_ct(u2[..., 0]), cos_theta)
    d_out = _dir_around(d_in, cos_theta, 2.0 * np.pi * u2[..., 1])
    return d_out, phase_eval_pdf(g, cos_theta)


def kkay_eval(pp, d_in, d_out):
    """Kajiya-Kay phase value (kkay.cpp eval): specular lobe around the
    fiber-preserving "reflected" direction + diffuse floor. d_in points
    ALONG propagation (pRec.wi points backwards, hence the sign)."""
    axis = pp.axis
    ks = pp.row[:, 31]
    kd = pp.row[:, 32]
    expn = pp.row[:, 33]
    norm = pp.row[:, 34]
    has_axis = jnp.sum(axis * axis, -1) > 0
    # frame.toLocal with n = axis: build tangent frame
    up = jnp.where((jnp.abs(axis[..., 2]) < 0.999)[..., None],
                   jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), axis.shape),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), axis.shape))
    sx = jnp.cross(up, axis)
    sx = sx / jnp.maximum(jnp.linalg.norm(sx, axis=-1, keepdims=True), 1e-12)
    sy = jnp.cross(axis, sx)
    lx = jnp.sum(d_out * sx, -1)
    ly = jnp.sum(d_out * sy, -1)
    # reference: reflectedLocal.z = -dot(wi, n); our d_in = -wi
    lz = jnp.sum(d_in * axis, -1)
    denom = jnp.maximum(lx * lx + ly * ly, 1e-12)
    a = jnp.sqrt(jnp.clip((1.0 - lz * lz) / denom, 0.0, 1e12))
    R = (sx * (lx * a)[..., None] + sy * (ly * a)[..., None]
         + axis * lz[..., None])
    spec = jnp.maximum(jnp.sum(R * d_out, -1), 0.0) ** expn * norm * ks
    val = spec + kd * INV_4PI
    return jnp.where(has_axis, val, kd * INV_4PI)


# ---------------------------------------------------------------------------
# SGGX microflake fiber phase (src/phase/microflake.cpp role)
#
# Specular SGGX [Heitz et al. 2015, "The SGGX Microflake Distribution"]
# with the fiber-aligned matrix S = I - (1 - beta^2) m m^T (eigenvalues
# beta^2 along the fiber m, 1 across it), which closed-forms everything:
#   sigma(w)      = sqrt(1 - (1-beta^2) <w,m>^2)       (projected area)
#   D(wm)         = 1 / (pi beta (<wm,m>^2/beta^2 + 1 - <wm,m>^2)^2)
#   p(wi -> wo)   = D(wh) / (4 sigma(wi)),  wh = normalize(wi + wo)
# Sampling draws a visible normal from the projected SGGX (the paper's
# Cholesky construction in the (wk, wj, wi) frame) and mirror-reflects —
# a perfect importance sampler (pdf == phase value, weight 1). The
# reference's gaussian-fiber stddev maps to beta = stddev*sqrt(pi/2)
# (small-sigma moment match of the projected areas). Deviation: the
# extinction coefficient stays directionally uniform (the reference
# scales sigma_t by sigma(w)); recorded in STATUS.md.
# ---------------------------------------------------------------------------

def _sggx_sigma(beta, cm):
    return jnp.sqrt(jnp.maximum(1.0 - (1.0 - beta * beta) * cm * cm, 1e-12))


def _sggx_D(beta, cm):
    q = cm * cm / jnp.maximum(beta * beta, 1e-12) + (1.0 - cm * cm)
    return 1.0 / jnp.maximum(np.pi * beta * q * q, 1e-24)


def sggx_eval(pp, d_in, d_out):
    """Phase value = sampling pdf (specular SGGX is self-importance-
    sampled). d_in points along propagation; wi = -d_in."""
    m = pp.axis
    beta = pp.row[:, 31]
    wi = -d_in
    wh = wi + d_out
    hn = jnp.linalg.norm(wh, axis=-1, keepdims=True)
    wh = wh / jnp.maximum(hn, 1e-12)
    cm = jnp.sum(wh * m, -1)
    ci = jnp.sum(wi * m, -1)
    val = _sggx_D(beta, cm) / (4.0 * _sggx_sigma(beta, ci))
    # wh undefined for wo == -wi (grazing through): value -> 0
    return jnp.where(hn[..., 0] > 1e-6, val, 0.0)


def sggx_sample(pp, d_in, u2):
    """Visible-normal sampling of the SGGX fiber distribution in the
    (wk, wj, wi) frame (Heitz et al. 2015, supplemental listing), then
    specular reflection. Returns (d_out, pdf)."""
    m = pp.axis
    beta = pp.row[:, 31]
    wi = -d_in
    # orthonormal frame around wi
    up = jnp.where((jnp.abs(wi[..., 2]) < 0.999)[..., None],
                   jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wi.shape),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), wi.shape))
    wk = jnp.cross(up, wi)
    wk = wk / jnp.maximum(jnp.linalg.norm(wk, axis=-1, keepdims=True),
                          1e-12)
    wj = jnp.cross(wi, wk)
    # S in the (k, j, i) frame: S_ab = <a,b> - c <a,m><b,m>, c = 1-beta^2
    c = 1.0 - beta * beta
    mk = jnp.sum(wk * m, -1)
    mj = jnp.sum(wj * m, -1)
    mi = jnp.sum(wi * m, -1)
    S_kk = 1.0 - c * mk * mk
    S_jj = 1.0 - c * mj * mj
    S_ii = 1.0 - c * mi * mi
    S_kj = -c * mk * mj
    S_ki = -c * mk * mi
    S_ji = -c * mj * mi
    # Cholesky-style construction of the projected-distribution matrix
    det = (S_kk * S_jj * S_ii - S_kj * S_kj * S_ii - S_ki * S_ki * S_jj
           - S_ji * S_ji * S_kk + 2.0 * S_kj * S_ki * S_ji)
    sqrt_det = jnp.sqrt(jnp.maximum(det, 1e-24))
    inv_sqrt_Sii = 1.0 / jnp.sqrt(jnp.maximum(S_ii, 1e-12))
    tmp = jnp.sqrt(jnp.maximum(S_jj * S_ii - S_ji * S_ji, 1e-24))
    Mk = jnp.stack([sqrt_det / tmp, jnp.zeros_like(tmp),
                    jnp.zeros_like(tmp)], -1)
    Mj = jnp.stack([-inv_sqrt_Sii * (S_ki * S_ji - S_kj * S_ii) / tmp,
                    inv_sqrt_Sii * tmp, jnp.zeros_like(tmp)], -1)
    Mi = jnp.stack([inv_sqrt_Sii * S_ki, inv_sqrt_Sii * S_ji,
                    inv_sqrt_Sii * S_ii], -1)
    # uniform point on the visible hemisphere
    r = jnp.sqrt(u2[..., 0])
    phi = 2.0 * np.pi * u2[..., 1]
    uu = r * jnp.cos(phi)
    vv = r * jnp.sin(phi)
    ww = jnp.sqrt(jnp.maximum(1.0 - uu * uu - vv * vv, 0.0))
    wm_kji = (uu[..., None] * Mk + vv[..., None] * Mj + ww[..., None] * Mi)
    wm_kji = wm_kji / jnp.maximum(
        jnp.linalg.norm(wm_kji, axis=-1, keepdims=True), 1e-12)
    wm = (wm_kji[..., 0:1] * wk + wm_kji[..., 1:2] * wj
          + wm_kji[..., 2:3] * wi)
    d_out = 2.0 * jnp.sum(wi * wm, -1, keepdims=True) * wm - wi
    return d_out, sggx_eval(pp, d_in, d_out)


def phase_eval(pp, d_in, d_out):
    """Full-vector phase eval with per-lane type dispatch."""
    ct = jnp.sum(d_in * d_out, -1)
    base = phase_eval_pdf(jnp.where(pp.g > 2.5, 0.0, pp.g), ct)
    base = jnp.where(pp.g > 2.5, kkay_eval(pp, d_in, d_out), base)
    return jnp.where(pp.g > 4.5, sggx_eval(pp, d_in, d_out), base)


def phase_pdf(pp, d_in, d_out):
    """Sampling pdf of phase_sample_full (kkay samples the uniform
    sphere, kkay.cpp pdf(); SGGX importance-samples itself)."""
    ct = jnp.sum(d_in * d_out, -1)
    base = phase_eval_pdf(jnp.where(pp.g > 2.5, 0.0, pp.g), ct)
    base = jnp.where(pp.g > 2.5, INV_4PI, base)
    return jnp.where(pp.g > 4.5, sggx_eval(pp, d_in, d_out), base)


def phase_sample_full(pp, d_in, u2):
    """(d_out, pdf, weight): HG/rayleigh importance-sample their own
    density (weight 1); kkay samples the uniform sphere with weight
    eval * 4pi (kkay.cpp sample); SGGX visible-normal samples itself
    (weight 1)."""
    kk = pp.g > 2.5
    mf = pp.g > 4.5
    d_hg, pdf_hg = phase_sample(jnp.where(kk, 0.0, pp.g), d_in, u2)
    ct = 1.0 - 2.0 * u2[..., 0]
    d_uni = _dir_around(d_in, ct, 2.0 * np.pi * u2[..., 1])
    d_sggx, pdf_sggx = sggx_sample(pp, d_in, u2)
    d_out = jnp.where(kk[..., None], jnp.where(mf[..., None], d_sggx,
                                               d_uni), d_hg)
    pdf = jnp.where(kk, jnp.where(mf, pdf_sggx, INV_4PI), pdf_hg)
    w = jnp.where(kk & ~mf, kkay_eval(pp, d_in, d_out) * (4.0 * np.pi),
                  1.0)
    return d_out, pdf, w
