"""Environment emitter: lat-long radiance map with luminance-CDF direct
sampling (device arrays + host precompute).

Semantics replicate the reference's envmap plugin
(mitsuba/src/emitters/envmap.cpp):
  * direction convention d = (sin(phi)sin(theta), cos(theta),
    -cos(phi)sin(theta)) in emitter-local space (sunmodel.h toSphere),
    uv = (atan2(x,-z)/2pi, acos(y)/pi)
  * sampling (envmap.cpp:567-601): discrete (row, col) pick from
    sin(theta)-weighted luminance CDFs with sample reuse, tent-filter
    jitter for a linearly-interpolated strategy, bilinear value/pdf
  * pdf (envmap.cpp:604-631): bilinear luminance * rowWeight *
    normalization / sin(theta)
  * sampleDirect intersects the scene bounding sphere (radius * 1.5,
    envmap.cpp:333-337) for the NEE visibility distance

The per-lane CDF inversions use binary searches with single-element
gathers (TPU gather cost is per-op): ~log2(H)+log2(W) scalar gathers per
NEE sample instead of materializing whole CDF rows per lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INV_PI = 1.0 / np.pi
INV_TWOPI = 0.5 / np.pi
EPS = 1e-4  # Mitsuba Epsilon


def _luminance(rgb):
    return rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169


class EnvmapArrays:
    """Device-side environment map tables (pytree).

    img_flat   [H*W, 3]  radiance (scale baked in)
    row_cdf    [H+1]     normalized marginal CDF over rows
    col_cdf    [H*(W+1)] per-row conditional CDFs (flattened)
    row_w      [H]       sin((y+.5)pi/H)
    norm       []        1 / (rowSum * pixelSolidAngle)
    rot        [3,3]     emitter-local -> world rotation
    rot_inv    [3,3]
    bs_center  [3], bs_radius []  scene bounding sphere
    """

    FIELDS = ("img_flat", "row_cdf", "col_cdf", "row_w", "norm", "rot",
              "rot_inv", "bs_center", "bs_radius")

    def __init__(self, **kw):
        for f in self.FIELDS:
            setattr(self, f, kw[f])
        self.H = int(kw["row_w"].shape[0])
        self.W = int(kw["img_flat"].shape[0]) // self.H

    @classmethod
    def dummy(cls):
        """1x1 black map placeholder keeping the pytree structure static."""
        return cls.from_image(np.zeros((1, 1, 3), np.float32), np.eye(3),
                              np.zeros(3), np.ones(3), allow_black=True)

    @classmethod
    def from_image(cls, img, to_world_rot, aabb_min, aabb_max,
                   allow_black=False):
        img = np.asarray(img, np.float32)
        H, W = img.shape[:2]
        lum = np.asarray(_luminance(img), np.float64)
        row_w = np.sin((np.arange(H) + 0.5) * np.pi / H)

        col_sum = lum.sum(axis=1)  # [H]
        col_cdf = np.zeros((H, W + 1), np.float64)
        col_cdf[:, 1:] = np.cumsum(lum, axis=1)
        safe = np.maximum(col_sum, 1e-300)
        col_cdf /= safe[:, None]
        col_cdf[:, -1] = 1.0

        row_sum = float((col_sum * row_w).sum())
        if row_sum <= 0 and not allow_black:
            raise ValueError("environment map is completely black")
        row_cdf = np.zeros(H + 1, np.float64)
        row_cdf[1:] = np.cumsum(col_sum * row_w)
        row_cdf /= max(row_sum, 1e-300)
        row_cdf[-1] = 1.0

        norm = 1.0 / (max(row_sum, 1e-300) * (2 * np.pi / W) * (np.pi / H))
        center = (np.asarray(aabb_min) + np.asarray(aabb_max)) * 0.5
        radius = float(np.linalg.norm(np.asarray(aabb_max) - center))
        radius = max(EPS, radius * 1.5)

        rot = np.asarray(to_world_rot, np.float64)[:3, :3]
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            img_flat=f32(img.reshape(H * W, 3)),
            row_cdf=f32(row_cdf),
            col_cdf=f32(col_cdf.reshape(-1)),
            row_w=f32(row_w),
            norm=f32(norm),
            rot=f32(rot),
            rot_inv=f32(np.linalg.inv(rot)),
            bs_center=f32(center),
            bs_radius=f32(radius),
        )


jax.tree_util.register_pytree_node(
    EnvmapArrays,
    lambda e: (tuple(getattr(e, f) for f in EnvmapArrays.FIELDS), None),
    lambda aux, ch: EnvmapArrays(**dict(zip(EnvmapArrays.FIELDS, ch))),
)


def build_env_from_spec(spec, scene_dir, aabb_min, aabb_max):
    """Construct EnvmapArrays from an <emitter> PluginSpec of type
    envmap / constant / sky / sun / sunsky."""
    t = spec.otype
    p = spec.props
    rot = np.asarray(p.get("toWorld", np.eye(4)))[:3, :3]
    if t in ("sky", "sun", "sunsky"):
        from .sunsky import rasterize_sun_sky

        img = rasterize_sun_sky(p, t)
    elif t == "envmap":
        import os

        from ..scene.textures import load_texture

        fn = p["filename"]
        path = fn if os.path.isabs(fn) else os.path.join(scene_dir, fn)
        img = load_texture(path, float(p.get("gamma", 0.0)))
        img = img * float(p.get("scale", 1.0))
    elif t == "constant":
        rad = p.get("radiance", 1.0)
        rad = [float(rad)] * 3 if np.isscalar(rad) else np.asarray(rad)
        img = np.broadcast_to(np.asarray(rad, np.float32), (32, 64, 3)).copy()
    else:
        raise NotImplementedError(f"environment emitter type {t!r}")
    return EnvmapArrays.from_image(img, rot, aabb_min, aabb_max)


def _texel(env: EnvmapArrays, x, y):
    """Texel fetch, wrap in x / clamp in y (MIPMap ERepeat/EClamp)."""
    W, H = env.W, env.H
    x = jnp.mod(x, W)
    y = jnp.clip(y, 0, H - 1)
    return env.img_flat[y * W + x]


def _bilerp_rows(env, x0, y, dx1):
    """One bilinear row: texel(x0,y)*(1-dx1) + texel(x0+1,y)*dx1."""
    a = _texel(env, x0, y)
    b = _texel(env, x0 + 1, y)
    return a * (1.0 - dx1)[..., None] + b * dx1[..., None]


def _dir_to_uv(env: EnvmapArrays, d_world):
    dl = d_world @ env.rot_inv.T
    u = jnp.arctan2(dl[..., 0], -dl[..., 2]) * INV_TWOPI
    u = jnp.where(u < 0, u + 1.0, u)
    v = jnp.arccos(jnp.clip(dl[..., 1], -1.0, 1.0)) * INV_PI
    return u, v, dl


def eval_env(env: EnvmapArrays, d_world):
    """Radiance for a ray escaping in d_world (bilinear lookup)."""
    u, v, _ = _dir_to_uv(env, d_world)
    x = u * env.W - 0.5
    y = v * env.H - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx1 = x - x0
    dy1 = y - y0
    v1 = _bilerp_rows(env, x0, y0, dx1)
    v2 = _bilerp_rows(env, x0, y0 + 1, dx1)
    return v1 * (1.0 - dy1)[..., None] + v2 * dy1[..., None]


def _sample_cdf(cdf_flat, base, size, u, n_steps):
    """Per-lane inversion of cdf_flat[base : base+size+1] (ascending,
    0..1): returns (index, rescaled remainder) a la DiscretePDF
    sampleReuse (envmap.cpp:681-687)."""
    lo = jnp.zeros_like(base)
    hi = jnp.full_like(base, size)
    # invariant: cdf[lo] <= u < cdf[hi] (with clamping at the ends)
    for _ in range(n_steps):
        mid = (lo + hi) >> 1
        c = cdf_flat[base + mid]
        go_hi = u >= c
        lo = jnp.where(go_hi & (mid > lo), mid, lo)
        hi = jnp.where(~go_hi & (mid < hi), mid, hi)
    idx = jnp.clip(lo, 0, size - 1)
    c0 = cdf_flat[base + idx]
    c1 = cdf_flat[base + idx + 1]
    rem = jnp.clip((u - c0) / jnp.maximum(c1 - c0, 1e-20), 0.0, 1.0)
    return idx, rem


def _interval_to_tent(x):
    """warp::intervalToTent: inverse-CDF of the tent on [-1, 1]."""
    neg = x < 0.5
    x2 = jnp.where(neg, 1.0 - 2.0 * x, 2.0 * x - 1.0)
    t = 1.0 - jnp.sqrt(jnp.clip(1.0 - x2, 0.0, 1.0))
    return jnp.where(neg, -t, t)


def sample_direct(env: EnvmapArrays, ref_p, u2):
    """NEE sample toward the environment (envmap.cpp sampleDirect +
    internalSampleDirection). Returns dict(d, dist, pdf, value) where pdf
    EXCLUDES the emitter-selection probability (caller divides)."""
    H, W = env.H, env.W
    nH = max(1, int(np.ceil(np.log2(max(H, 2)))) + 1)
    nW = max(1, int(np.ceil(np.log2(max(W, 2)))) + 1)
    zero = jnp.zeros(u2.shape[:-1], jnp.int32)
    row, ry = _sample_cdf(env.row_cdf, zero, H, u2[..., 1], nH)
    col, rx = _sample_cdf(env.col_cdf, row * (W + 1), W, u2[..., 0], nW)

    px = col.astype(jnp.float32) + _interval_to_tent(rx)
    py = row.astype(jnp.float32) + _interval_to_tent(ry)

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    dx1 = px - x0
    dy1 = py - y0
    # value1/value2 carry the vertical lerp factor too (envmap.cpp:581-584)
    v1 = _bilerp_rows(env, x0, y0, dx1) * (1.0 - dy1)[..., None]
    v2 = _bilerp_rows(env, x0, y0 + 1, dx1) * dy1[..., None]
    value = v1 + v2

    rw0 = env.row_w[jnp.clip(y0, 0, H - 1)]
    rw1 = env.row_w[jnp.clip(y0 + 1, 0, H - 1)]
    pdf = (_luminance(v1) * rw0 + _luminance(v2) * rw1) * env.norm

    phi = (px + 0.5) * (2 * np.pi / W)
    theta = (py + 0.5) * (np.pi / H)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    dl = jnp.stack([sp * st, ct, -cp * st], -1)
    pdf = pdf / jnp.maximum(jnp.abs(st), EPS)
    d = dl @ env.rot.T

    # scene-bsphere far intersection for the shadow-ray length
    oc = ref_p - env.bs_center
    b = jnp.sum(oc * d, -1)
    c = jnp.sum(oc * oc, -1) - env.bs_radius * env.bs_radius
    disc = b * b - c
    ok = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    near_t, far_t = -b - sq, -b + sq
    ok = ok & (near_t < 0) & (far_t > 0) & (pdf > 0)

    pdf = jnp.where(ok, pdf, 0.0)
    value = jnp.where(
        ok[..., None], value / jnp.maximum(pdf, 1e-30)[..., None], 0.0
    )
    return dict(d=d, dist=far_t, pdf=pdf, value=value)


def pdf_direct(env: EnvmapArrays, d_world):
    """Solid-angle pdf of sample_direct having produced d_world
    (internalPdfDirection), excluding emitter selection."""
    H, W = env.H, env.W
    u, v, dl = _dir_to_uv(env, d_world)
    x = u * W - 0.5
    y = v * H - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx1 = x - x0
    dy1 = y - y0
    v1 = _bilerp_rows(env, x0, y0, dx1) * (1.0 - dy1)[..., None]
    v2 = _bilerp_rows(env, x0, y0 + 1, dx1) * dy1[..., None]
    rw0 = env.row_w[jnp.clip(y0, 0, H - 1)]
    rw1 = env.row_w[jnp.clip(y0 + 1, 0, H - 1)]
    lum = _luminance(v1) * rw0 + _luminance(v2) * rw1
    st = jnp.sqrt(jnp.clip(1.0 - dl[..., 1] * dl[..., 1], 0.0, 1.0))
    return lum * env.norm / jnp.maximum(st, EPS)
