"""Bitmap texture atlas: host packing + device bilinear sampling.

The reference's bitmap texture plugin (mitsuba/src/textures/bitmap.cpp)
MIP-maps each image and filters with EWA/trilinear using ray
differentials. This module mirrors that: each bitmap gets a full MIP
pyramid packed into the same atlas; primary (camera) hits carry ray
differentials from the sensor — trilinear minification by default, and
the full-Jacobian EWA anisotropic path (uv_differentials +
sample_atlas's duv argument, mipmap.h:640-713) for textures with
filterType=ewa. Bounce lanes sample the base level bilinearly with
repeat wrapping, matching the reference path tracer's camera-only
differentials.

8-bit PNG/JPG sources are converted sRGB -> linear exactly as
Bitmap::setGamma/fromLinearRGB does for gamma=-1 (srgb).

All textures live in ONE flat [sumPixels, 3] device array; a [N, 3] i32
table stores (offset, width, height). A lane's lookup is 4 single-row
gathers (bilinear corners) — TPU gather cost is per-op, not per-byte.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _srgb_to_linear(x):
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def rasterize_procedural(otype, p, res=128):
    """checkerboard.cpp: 2x2 tiles of color0/color1 per uv unit;
    gridtexture.cpp: color1 lines of lineWidth on a color0 field."""
    def rgb(v, default):
        if v is None:
            return np.full(3, default, np.float32)
        a = np.asarray(getattr(v, "rgb", v), np.float64).reshape(-1)
        return (np.full(3, float(a[0])) if a.size == 1 else a[:3]).astype(
            np.float32)

    c0 = rgb(p.get("color0"), 0.4)
    c1 = rgb(p.get("color1"), 0.2)
    u = (np.arange(res) + 0.5) / res
    uu, vv = np.meshgrid(u, u)
    if otype == "checkerboard":
        mask = ((uu * 2).astype(int) + (vv * 2).astype(int)) % 2 == 0
    else:
        lw = float(p.get("lineWidth", 0.01))
        fu = uu - np.floor(uu)
        fv = vv - np.floor(vv)
        mask = ~((np.minimum(fu, 1 - fu) < lw) | (np.minimum(fv, 1 - fv) < lw))
    img = np.where(mask[..., None], c0[None, None], c1[None, None])
    return img.astype(np.float32)


def load_texture(path, gamma=0.0):
    """Decode an image file to linear float32 RGB [H, W, 3]."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        from ..io import exr

        img = exr.read(path)[0]
        return np.asarray(img, np.float32)[..., :3]
    from PIL import Image

    im = Image.open(path)
    arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    arr = arr[..., :3]
    if arr.dtype == np.uint8:
        x = arr.astype(np.float64) / 255.0
        if gamma == 0.0 or gamma == -1.0:  # srgb (bitmap.cpp default)
            x = _srgb_to_linear(x)
        elif gamma != 1.0:
            x = x ** gamma
        return x.astype(np.float32)
    return arr.astype(np.float32)


class TextureAtlas:
    """Device-side packed texture set (pytree).

    pixels [P, 12] f16 = (texel rgb, right, down, down-right neighbors,
    all repeat-wrapped): the duplicated neighbors make ONE row gather
    serve all four taps of a bilinear lookup (TPU gathers cost per-op,
    not per-byte — measured ~2.3 ms per 64k-lane gather on the kitchen
    atlas, so quad-packing halves what neighbor-pair packing already
    halved), and f16 storage (10-bit mantissa) is exact enough for
    8-bit/sRGB-decoded sources. meta [N, 3] i32 = (offset, W, H);
    uvx [N, 4] f32 = (uscale, vscale, uoffset, voffset). Slot 0 is a
    1x1 white dummy; material rows store spec-index + 1 (0 = none).
    """

    FIELDS = ("pixels", "meta", "uvx", "vcflag", "wfp", "mip_meta", "filt")
    MAX_LEVELS = 13
    # filterType codes (src/textures/bitmap.cpp:213-229; default ewa)
    F_EWA, F_TRILINEAR, F_BILINEAR, F_NEAREST = 0.0, 1.0, 2.0, 3.0

    def __init__(self, pixels, meta, uvx, vcflag=None, wfp=None,
                 mip_meta=None, filt=None):
        self.pixels = pixels
        self.meta = meta
        self.uvx = uvx
        # per-slot (filterType code, maxAnisotropy); trilinear default
        # for the dummy slot
        self.filt = (filt if filt is not None
                     else jnp.tile(jnp.asarray([[1.0, 20.0]], jnp.float32),
                                   (meta.shape[0], 1)))
        # per-slot marker: slot resolves to interpolated mesh vertex
        # colors (src/textures/vertexcolors.cpp) instead of atlas pixels
        self.vcflag = (vcflag if vcflag is not None
                       else jnp.zeros(meta.shape[0], bool))
        # per-slot wireframe params (src/textures/wireframe.cpp):
        # [lineWidth (<0 = not wireframe), stepWidth, edge rgb,
        #  interior rgb, pad]
        self.wfp = (wfp if wfp is not None
                    else jnp.full((meta.shape[0], 8), -1.0, jnp.float32))
        # MIP pyramid metadata [N * MAX_LEVELS, 3] = (offset, W, H) per
        # (slot, level); levels past a texture's last repeat its 1x1 top
        # (bitmap.cpp MIP chain; trilinear isotropic filtering instead of
        # EWA — documented deviation)
        if mip_meta is None:
            mip_meta = jnp.reshape(
                jnp.tile(meta[:, None, :], (1, self.MAX_LEVELS, 1)),
                (meta.shape[0] * self.MAX_LEVELS, 3))
        self.mip_meta = mip_meta

    @classmethod
    def build(cls, specs, scene_dir):
        """specs: list of texture Properties dicts ({type, filename, gamma,
        uscale, vscale, uoffset, voffset, color0/color1/lineWidth}).
        Procedural textures (checkerboard / gridtexture — the reference's
        src/textures/{checkerboard,gridtexture}.cpp) rasterize into the
        atlas at build time, so the device path is uniform."""
        imgs = [np.ones((1, 1, 3), np.float32)]  # dummy slot 0
        uvx = [np.array([1.0, 1.0, 0.0, 0.0], np.float32)]

        def build_one(p):
            """One spec -> (linear image, uv transform); `scale` wrappers
            (src/textures/scale.cpp) multiply the nested texture's pixels
            at build time."""
            otype = p.get("_otype", "bitmap")
            x4 = np.array([
                float(p.get("uscale", 1.0)), float(p.get("vscale", 1.0)),
                float(p.get("uoffset", 0.0)), float(p.get("voffset", 0.0)),
            ], np.float32)
            if otype == "scale":
                nested = None
                for c in p.get("_children", ()):
                    if getattr(c, "cls", None) == "texture":
                        nested = c
                if nested is None:
                    raise ValueError("scale texture: missing nested texture")
                img, x4 = build_one(dict(nested.props, _otype=nested.otype,
                                         _children=nested.children))
                s = p.get("scale", 1.0)
                s = np.asarray(getattr(s, "rgb", s), np.float32).reshape(-1)
                return img * (np.full(3, s[0]) if s.size == 1 else s[:3]), x4
            if otype in ("checkerboard", "gridtexture"):
                return rasterize_procedural(otype, p), x4
            fn = p.get("filename", "")
            path = fn if os.path.isabs(fn) else os.path.join(scene_dir, fn)
            return load_texture(path, float(p.get("gamma", 0.0))), x4

        for p in specs:
            if p.get("_otype") in ("vertexcolors", "curvature", "wireframe"):
                # handled lane-side (vertex colors / baked curvature
                # colors / barycentric edge distance); keep a white
                # placeholder so slot indices stay aligned
                imgs.append(np.ones((1, 1, 3), np.float32))
                uvx.append(np.array([1, 1, 0, 0], np.float32))
                continue
            img, x4 = build_one(p)
            imgs.append(img)
            uvx.append(x4)
        meta = np.zeros((len(imgs), 3), np.int32)
        mip_meta = np.zeros((len(imgs), cls.MAX_LEVELS, 3), np.int32)
        off = 0
        flats = []
        for i, im in enumerate(imgs):
            for lvl in range(cls.MAX_LEVELS):
                H, W = im.shape[:2]
                if lvl == 0:
                    meta[i] = (off, W, H)
                mip_meta[i, lvl] = (off, W, H)
                right = np.roll(im, -1, axis=1)
                flats.append(np.concatenate(
                    [im, right, np.roll(im, -1, axis=0),
                     np.roll(right, -1, axis=0)], -1).reshape(-1, 12))
                off += H * W
                if W == 1 and H == 1:
                    # repeat the 1x1 top for the remaining levels
                    mip_meta[i, lvl + 1:] = mip_meta[i, lvl]
                    break
                im = _downsample2(im)
        vcflag = np.zeros(len(imgs), bool)
        wfp = np.full((len(imgs), 8), -1.0, np.float32)
        for i, p in enumerate(specs):
            if p.get("_otype") in ("vertexcolors", "curvature"):
                # curvature colors are baked into mesh vertex colors at
                # scene build (scene.py) and read through the
                # vertexcolors lane path — documented deviation: the
                # red/blue gradient interpolates per-vertex instead of
                # per-curvature-sample (curvature.cpp:74-87)
                vcflag[i + 1] = True
            elif p.get("_otype") == "wireframe":
                def rgb3(v, d):
                    a = np.asarray(getattr(v, "rgb", v if v is not None
                                           else d), np.float32).reshape(-1)
                    return np.full(3, a[0]) if a.size == 1 else a[:3]

                wfp[i + 1, 0] = float(p.get("lineWidth", 0.0))
                wfp[i + 1, 1] = min(max(float(p.get("stepWidth", 0.5)),
                                        0.0), 1.0)
                wfp[i + 1, 2:5] = rgb3(p.get("edgeColor"), [0.1] * 3)
                wfp[i + 1, 5:8] = rgb3(p.get("interiorColor"), [0.5] * 3)
        # per-slot filter mode + anisotropy clamp (bitmap.cpp:213-232:
        # filterType default "ewa", maxAnisotropy default 20)
        fmap = {"ewa": cls.F_EWA, "trilinear": cls.F_TRILINEAR,
                "bilinear": cls.F_BILINEAR, "nearest": cls.F_NEAREST}
        filt = np.tile(np.array([[cls.F_TRILINEAR, 20.0]], np.float32),
                       (len(imgs), 1))
        for i, p in enumerate(specs):
            # filterType is a bitmap parameter (default ewa); procedural
            # textures are point-evaluated in the reference, so their
            # atlas rasterizations default to trilinear
            dflt = "ewa" if p.get("_otype", "bitmap") == "bitmap" \
                else "trilinear"
            filt[i + 1, 0] = fmap.get(
                str(p.get("filterType", dflt)).lower(), cls.F_EWA)
            filt[i + 1, 1] = float(p.get("maxAnisotropy", 20.0))
        # clamp into f16's finite range: HDR EXR sources can exceed
        # 65504 and would otherwise overflow to inf in the cast
        packed = np.clip(np.concatenate(flats, 0), -65504.0, 65504.0)
        return cls(jnp.asarray(packed, jnp.float16),
                   jnp.asarray(meta), jnp.asarray(np.stack(uvx)),
                   jnp.asarray(vcflag), jnp.asarray(wfp),
                   jnp.asarray(mip_meta.reshape(-1, 3)),
                   jnp.asarray(filt))

    @classmethod
    def empty(cls):
        return cls(jnp.ones((1, 12), jnp.float32),
                   jnp.asarray([[0, 1, 1]], jnp.int32),
                   jnp.asarray([[1.0, 1.0, 0.0, 0.0]], jnp.float32),
                   jnp.zeros(1, bool))


jax.tree_util.register_pytree_node(
    TextureAtlas,
    lambda t: (tuple(getattr(t, f) for f in TextureAtlas.FIELDS), None),
    lambda aux, ch: TextureAtlas(*ch),
)


def _downsample2(im):
    """2x box downsample with odd-dimension truncation handling."""
    H, W = im.shape[:2]
    H2, W2 = max(H // 2, 1), max(W // 2, 1)
    im = im[:H2 * 2 if H > 1 else 1, :W2 * 2 if W > 1 else 1]
    if H > 1:
        im = 0.5 * (im[0::2] + im[1::2])
    if W > 1:
        im = 0.5 * (im[:, 0::2] + im[:, 1::2])
    return im


def _bilinear(atlas, off, W, H, x4, uv):
    Wf = W.astype(jnp.float32)
    Hf = H.astype(jnp.float32)
    # bitmap.cpp eval: uv transform, then pixel space, half-texel centered
    u = uv[..., 0] * x4[..., 0] + x4[..., 2]
    v = uv[..., 1] * x4[..., 1] + x4[..., 3]
    x = u * Wf - 0.5
    y = v * Hf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]

    # ONE gather returns all four taps thanks to the packed
    # right/down/diagonal neighbor columns (wrap baked in at build time)
    xi = jnp.remainder(x0, W)
    yi = jnp.remainder(y0, H)
    row = atlas.pixels[off + yi * W + xi].astype(jnp.float32)
    a00, a10, a01, a11 = (row[..., 0:3], row[..., 3:6],
                          row[..., 6:9], row[..., 9:12])
    return ((a00 * (1 - dx) + a10 * dx) * (1 - dy)
            + (a01 * (1 - dx) + a11 * dx) * dy)


def _trilinear(atlas, tid, x4, uv, lod):
    """Two-level MIP blend at a per-lane lod (mipmap.h trilinear)."""
    LMAX = TextureAtlas.MAX_LEVELS
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0)[..., None]
    ma = atlas.mip_meta[tid * LMAX + l0]
    mb = atlas.mip_meta[tid * LMAX + jnp.minimum(l0 + 1, LMAX - 1)]
    va = _bilinear(atlas, ma[..., 0], ma[..., 1], ma[..., 2], x4, uv)
    vb = _bilinear(atlas, mb[..., 0], mb[..., 1], mb[..., 2], x4, uv)
    return va * (1 - frac) + vb * frac


def sample_atlas(atlas: TextureAtlas, tex_id, uv, foot_uv=None, duv=None,
                 taps=4):
    """Filtered lookup with repeat wrap. tex_id [L] i32 (PLUS ONE vs the
    builder's spec index; <=0 lanes return white), uv [L, 2].

    foot_uv (optional [L,2]): isotropic uv-space footprint of the
    sample (primary-hit ray differentials mapped through dpdu/dpdv);
    selects a MIP level pair for trilinear filtering, lod =
    log2(max footprint in texels). None or 0 -> base level, matching
    the reference path tracer where only camera rays carry
    differentials (bitmap.cpp eval / mipmap.h).

    duv (optional ([L,2], [L,2])): the full uv-space Jacobian (duv/dx,
    duv/dy) from ray differentials — enables per-texture filterType
    dispatch incl. anisotropic EWA (mipmap.h:640-713). The TPU
    formulation replaces the reference's variable-texel Gaussian loop
    with `taps` fixed trilinear probes spaced along the ellipse's major
    axis at the minor-axis MIP level (hardware-AF-style footprint
    assembly: bounded gather count, anisotropy preserved up to
    maxAnisotropy) — documented deviation. Non-EWA lanes collapse to
    exact trilinear/bilinear/nearest (all probes coincide)."""
    tid = jnp.clip(tex_id, 0, atlas.meta.shape[0] - 1)
    x4 = atlas.uvx[tid]
    if duv is not None:
        v = _sample_ewa(atlas, tid, x4, uv, duv, taps)
        return jnp.where((tex_id > 0)[..., None], v, 1.0)
    if foot_uv is None:
        m = atlas.meta[tid]
        v = _bilinear(atlas, m[..., 0], m[..., 1], m[..., 2], x4, uv)
        return jnp.where((tex_id > 0)[..., None], v, 1.0)

    LMAX = TextureAtlas.MAX_LEVELS
    m0 = atlas.meta[tid]
    texels = jnp.maximum(
        jnp.abs(foot_uv[..., 0] * x4[..., 0]) *
        m0[..., 1].astype(jnp.float32),
        jnp.abs(foot_uv[..., 1] * x4[..., 1]) *
        m0[..., 2].astype(jnp.float32))
    lod = jnp.clip(jnp.log2(jnp.maximum(texels, 1e-9)), 0.0, LMAX - 1.0)
    v = _trilinear(atlas, tid, x4, uv, lod)
    return jnp.where((tex_id > 0)[..., None], v, 1.0)


def _sample_ewa(atlas, tid, x4, uv, duv, taps):
    """filterType dispatch from the full uv Jacobian; see sample_atlas."""
    LMAX = TextureAtlas.MAX_LEVELS
    m0 = atlas.meta[tid]
    W0 = m0[..., 1].astype(jnp.float32)
    H0 = m0[..., 2].astype(jnp.float32)
    mode = atlas.filt[tid, 0]
    max_aniso = jnp.maximum(atlas.filt[tid, 1], 1.0)
    su = x4[..., 0] * W0  # uv -> level-0 texel scale
    sv = x4[..., 1] * H0

    # implicit ellipse from the texel-space Jacobian (mipmap.h:640-652)
    du0 = duv[0][..., 0] * su
    dv0 = duv[0][..., 1] * sv
    du1 = duv[1][..., 0] * su
    dv1 = duv[1][..., 1] * sv
    A = dv0 * dv0 + dv1 * dv1
    B = -2.0 * (du0 * dv0 + du1 * dv1)
    C = du0 * du0 + du1 * du1
    F = A * C - 0.25 * B * B
    root = jnp.hypot(A - C, B)
    Ap = 0.5 * (A + C - root)
    Cp = 0.5 * (A + C + root)
    major = jnp.sqrt(jnp.maximum(F, 0.0) / jnp.maximum(Ap, 1e-20))
    minor = jnp.sqrt(jnp.maximum(F, 0.0) / jnp.maximum(Cp, 1e-20))

    is_ewa = (mode == TextureAtlas.F_EWA) & (F > 0) & (minor > 0) \
        & (major > 0)
    # anisotropy clamp: enlarge the minor radius (extra blur) rather
    # than taking unbounded samples (mipmap.h:671-676)
    minor_c = jnp.maximum(minor, major / max_aniso)
    lod_tri = jnp.log2(jnp.maximum(major, 1e-9))
    lod_ewa = jnp.log2(jnp.maximum(minor_c, 1e-9))
    lod = jnp.where(is_ewa, lod_ewa, lod_tri)
    lod = jnp.where(mode >= TextureAtlas.F_BILINEAR, 0.0, lod)
    lod = jnp.clip(lod, 0.0, LMAX - 1.0)

    # nearest: snap uv to the base-level texel center
    ut = uv[..., 0] * x4[..., 0] + x4[..., 2]
    vt = uv[..., 1] * x4[..., 1] + x4[..., 3]
    un = ((jnp.floor(ut * W0) + 0.5) / W0 - x4[..., 2]) \
        / jnp.where(x4[..., 0] == 0, 1.0, x4[..., 0])
    vn = ((jnp.floor(vt * H0) + 0.5) / H0 - x4[..., 3]) \
        / jnp.where(x4[..., 1] == 0, 1.0, x4[..., 1])
    nearest = mode == TextureAtlas.F_NEAREST
    uv = jnp.stack([jnp.where(nearest, un, uv[..., 0]),
                    jnp.where(nearest, vn, uv[..., 1])], -1)

    # major-axis direction = eigenvector of [[A,B/2],[B/2,C]] for the
    # smaller eigenvalue Ap; two candidate forms, keep the better
    # conditioned one
    v1 = jnp.stack([0.5 * B, Ap - A], -1)
    v2 = jnp.stack([Ap - C, 0.5 * B], -1)
    pick = (jnp.sum(v1 * v1, -1) >= jnp.sum(v2 * v2, -1))[..., None]
    ax = jnp.where(pick, v1, v2)
    nrm = jnp.sqrt(jnp.sum(ax * ax, -1, keepdims=True))
    ax = jnp.where(nrm > 1e-20, ax / jnp.maximum(nrm, 1e-20),
                   jnp.asarray([1.0, 0.0]))
    # probe extent: cover the major radius beyond what one isotropic
    # probe already covers; zero for non-EWA lanes so all taps coincide
    ext = jnp.where(is_ewa, jnp.maximum(major - minor_c, 0.0), 0.0)
    off_u = ax[..., 0] * ext / jnp.maximum(su, 1e-20)  # texel -> raw uv
    off_v = ax[..., 1] * ext / jnp.maximum(sv, 1e-20)

    acc = 0.0
    wsum = 0.0
    for k in range(taps):
        t = (2 * k + 1 - taps) / taps  # (-1, 1)
        w = float(np.exp(-2.0 * t * t))
        p = uv + jnp.stack([off_u * t, off_v * t], -1)
        acc = acc + w * _trilinear(atlas, tid, x4, p, lod)
        wsum = wsum + w
    return acc / wsum


def uv_differentials(sensor, d, t, geo_n, dpdu, dpdv, active):
    """Transfer camera ray differentials to the hit surface and solve
    for the uv-space Jacobian (duv/dx, duv/dy) — the wavefront analog of
    Intersection::computeUVPartials (librender/trimesh + mipmap.h
    callers). `active` masks lanes that carry differentials (primary
    hits); others get zero gradients (base-level lookups)."""
    ddx, ddy = sensor.dir_differentials(d)
    dn = jnp.sum(d * geo_n, -1)
    dn = jnp.where(jnp.abs(dn) < 1e-8, jnp.where(dn >= 0, 1e-8, -1e-8), dn)

    def transfer(dd):
        # first-order plane transfer: p(px) = o + t(px) d(px) with
        # (p - p0) . n = 0  ->  dp = t (dd - d (dd.n)/(d.n))
        k = jnp.sum(dd * geo_n, -1) / dn
        return t[..., None] * (dd - d * k[..., None])

    dpdx = transfer(ddx)
    dpdy = transfer(ddy)
    a = jnp.sum(dpdu * dpdu, -1)
    b = jnp.sum(dpdu * dpdv, -1)
    c = jnp.sum(dpdv * dpdv, -1)
    det = a * c - b * b
    inv = jnp.where(jnp.abs(det) < 1e-24, 0.0, 1.0 / det)
    zm = active.astype(jnp.float32)[..., None]

    def solve(dp):
        pu = jnp.sum(dp * dpdu, -1)
        pv = jnp.sum(dp * dpdv, -1)
        return jnp.stack([(c * pu - b * pv) * inv,
                          (a * pv - b * pu) * inv], -1) * zm

    return solve(dpdx), solve(dpdy)


def perturb_normal(atlas: TextureAtlas, tex_id, is_normalmap, uv,
                   sh_n, dpdu, dpdv):
    """Shading-normal perturbation for bumpmap/normalmap wrappers
    (src/bsdfs/{bumpmap,normalmap}.cpp). Bump maps use a one-texel
    finite-difference height gradient; normal maps decode tangent-space
    normals (2c - 1). Lanes with tex_id <= 0 keep sh_n."""
    tid = jnp.clip(tex_id, 0, atlas.meta.shape[0] - 1)
    m = atlas.meta[tid]
    eps_u = 1.0 / jnp.maximum(m[..., 1].astype(jnp.float32), 2.0)
    eps_v = 1.0 / jnp.maximum(m[..., 2].astype(jnp.float32), 2.0)

    def lum(c):
        return c[..., 0] * 0.212671 + c[..., 1] * 0.715160 + c[..., 2] * 0.072169

    h0 = lum(sample_atlas(atlas, tex_id, uv))
    hu = lum(sample_atlas(
        atlas, tex_id, uv + jnp.stack([eps_u, jnp.zeros_like(eps_u)], -1)))
    hv = lum(sample_atlas(
        atlas, tex_id, uv + jnp.stack([jnp.zeros_like(eps_v), eps_v], -1)))
    dhdu = (hu - h0) / eps_u
    dhdv = (hv - h0) / eps_v
    n_bump = jnp.cross(dpdu + sh_n * dhdu[..., None],
                       dpdv + sh_n * dhdv[..., None])

    # orthonormal TBN for normal maps
    t = dpdu - sh_n * jnp.sum(sh_n * dpdu, -1, keepdims=True)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    b = jnp.cross(sh_n, t)
    c = sample_atlas(atlas, tex_id, uv) * 2.0 - 1.0
    n_nm = (t * c[..., 0:1] + b * c[..., 1:2] + sh_n * c[..., 2:3])

    n_new = jnp.where(is_normalmap[..., None], n_nm, n_bump)
    n_new = n_new / jnp.maximum(
        jnp.linalg.norm(n_new, axis=-1, keepdims=True), 1e-12)
    # stay in the original hemisphere
    n_new = jnp.where(
        (jnp.sum(n_new * sh_n, -1) < 0)[..., None], -n_new, n_new)
    return jnp.where((tex_id > 0)[..., None], n_new, sh_n)


def wireframe_color(atlas: TextureAtlas, tex_id, tri_rows, bu, bv):
    """Wireframe texture eval (src/textures/wireframe.cpp:81-123):
    world-space distance from the shading point to the nearest triangle
    edge LINE (unclamped projection, like the reference), smoothstepped
    between lineWidth*(1-stepWidth) and lineWidth to blend edgeColor ->
    interiorColor. tri_rows: [L,12] packed (p0, e1, e2) accel rows;
    tex_id is the +1-biased slot id."""
    tid = jnp.clip(tex_id, 0, atlas.wfp.shape[0] - 1)
    wf = atlas.wfp[tid]
    lw = wf[:, 0]
    sw = wf[:, 1]
    p0 = tri_rows[:, 0:3]
    e1 = tri_rows[:, 3:6]
    e2 = tri_rows[:, 6:9]
    p = p0 + bu[:, None] * e1 + bv[:, None] * e2

    def line_d2(c, dvec):
        l2 = jnp.sum(dvec * dvec, -1)
        w = p - c
        t = jnp.sum(w * dvec, -1) / jnp.maximum(l2, 1e-30)
        dd = w - t[:, None] * dvec
        return jnp.sum(dd * dd, -1)

    d2 = jnp.minimum(
        jnp.minimum(line_d2(p0, e1), line_d2(p0, e2)),
        line_d2(p0 + e1, e2 - e1))
    x = jnp.sqrt(jnp.maximum(d2, 0.0))
    e0 = lw * (1.0 - sw)
    t = jnp.clip((x - e0) / jnp.maximum(lw - e0, 1e-30), 0.0, 1.0)
    s = t * t * (3.0 - 2.0 * t)  # math::smoothStep
    return wf[:, 2:5] * (1.0 - s)[:, None] + wf[:, 5:8] * s[:, None]
