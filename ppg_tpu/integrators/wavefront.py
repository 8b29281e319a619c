"""Wavefront path tracer core: the reference's megakernel Li()
(guided_path.cpp:1712-2157) restructured as a lax.scan over bounces with
masked SoA lane state — every stage (intersect, BSDF sample/eval, NEE,
MIS) runs vectorized over the whole wavefront.

Radiance bookkeeping: the reference's recordRadiance() adds emitted light
to the pixel AND to every previously stored path vertex
(guided_path.cpp:1791-1796). Here each bounce j emits a contribution
"slot" c_j; pixel radiance is sum_j c_j and vertex j's training radiance
is own_j + suffix_sum(c)_{j+1} — an exact, order-independent
reformulation of the sequential vertex updates.

Bounce indexing matches the reference: rRec.depth starts at 1, BSDF
sampling happens while depth < maxDepth, so there are maxDepth-1 sampling
bounces (guided_path.cpp:1798,1925).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..accel.traverse import closest_hit
from ..bsdf import bsdf as B
from ..core.vecmath import (build_frame, dot, normalize,
                            small_table_gather, to_local, to_world)
from ..emitters import area as E
from ..emitters import delta as DE
from ..emitters import envmap as EV
from ..scene.scene import (MAT_BLEND, MAT_COATING, MAT_MASK, MAT_NULL,
                           MAT_ROUGHCOATING)
from ..scene.textures import TextureAtlas, sample_atlas

SHADOW_EPS = 1e-3  # relative end offset, mirrors Mitsuba's ShadowEpsilon
# MAX_NUM_VERTICES analog (guided_path.cpp:1771): the reference stores at
# most 32 vertices per path (its depth loop itself is unbounded for
# maxDepth=-1). The classic scan caps sampled bounces at the same 32; RR
# (q <= 0.95 unguided) makes deeper-path energy negligible there, while
# truly unbounded depth (built-tree guided RR at 0.99) is served by the
# regenerative tracer's early-exit while_loop (integrators/regen.py).
MAX_BOUNCES_CAP = 32


@dataclass(frozen=True)
class PTConfig:
    max_depth: int = 10  # -1 = unlimited (capped at MAX_BOUNCES_CAP+1)
    rr_depth: int = 5
    strict_normals: bool = False
    hide_emitters: bool = False
    do_nee: bool = False
    nee_always: bool = False  # nee == "always" (affects vertex radiance)
    bsdf_fraction: float = 0.5
    guiding: bool = False  # mixture-sample from the SD-tree
    is_built: bool = False  # sampling tree valid (m_isBuilt)
    record_vertices: bool = False  # produce training records
    learn_fraction: bool = False  # bsdfSamplingFractionLoss != none
    has_env: bool = False  # scene has an environment emitter
    has_tex: bool = False  # scene has bitmap textures
    has_tex_ewa: bool = False  # any bitmap with filterType=ewa (default):
    # primary hits carry the full uv Jacobian for anisotropic lookups
    has_tex_opacity: bool = True  # any material textures its opacity
    # (False skips a full atlas sample per shade — measured 3.2 ms/call
    # at 64k lanes on the kitchen atlas)
    has_mask: bool = False  # scene has mask (opacity) BSDFs
    has_null: bool = False  # scene has null (pass-through) BSDFs
    has_media: bool = False  # scene has participating media
    has_hetero: bool = False  # scene has heterogeneous (grid) media
    has_bump: bool = False  # scene has bump/normal-mapped materials
    has_blend: bool = False  # scene has blendbsdf/mixturebsdf materials
    has_coating: bool = False  # scene has coating/roughcoating materials
    has_vertexcolors: bool = False  # meshes carry per-vertex colors
    has_wireframe: bool = False  # scene has wireframe textures
    has_subsurf: bool = False  # scene has dipole subsurface shapes
    has_sss: bool = False  # scene has singlescatter subsurface shapes
    sampler: str = "independent"  # sampler plugin type (render/samplers.py)
    # splat-target precompute (regen.shade_hit): when non-empty and
    # record_vertices, the tracer resolves each vertex's splat leaf
    # (spatial jitter included) and directional cell at SHADE time so
    # splat_records skips its per-stacked-record tree walks. Values
    # mirror the guided_path spatialFilter / directionalFilter props.
    splat_spatial: str = ""  # "" (off) | "nearest" | "stochastic"
    splat_dir: str = ""  # "" (off) | "nearest" | "box"
    force_machine: bool = False  # regen: use the segment machine even on
    # small scenes (tests; big scenes engage it automatically)
    force_classic: bool = False  # regen: keep the classic per-bounce
    # body on big scenes (profiling A/B only)

    @property
    def n_bounces(self):
        if self.max_depth < 0:
            return MAX_BOUNCES_CAP
        return min(self.max_depth - 1, MAX_BOUNCES_CAP)


class DeviceScene:
    """All per-scene device arrays consumed by the tracer (pytree).

    Per-triangle shading data is PACKED into one [T, 30] f32 row in BVH
    leaf order (see accel.traverse): n0(3) n1(3) n2(3) geo_n(3)
    bitcast(mat) bitcast(emitter) radiance(3) uv0(2) uv1(2) uv2(2)
    bitcast(medium) dpdu(3) dpdv(3) — one gather per hit replaces many
    (TPU gather cost is per-op, not per-byte), and the row is CARRIED
    across bounces so each bounce pays a single new gather. Scenes with
    per-vertex colors widen the row to [T, 39] with the 3 corner colors
    (consumed by the vertexcolors texture).
    """

    FIELDS = ("geom", "mats", "emitters", "shade", "eps", "env", "tex",
              "delta", "media", "subsurf", "sss")

    def __init__(self, **kw):
        for f in self.FIELDS:
            setattr(self, f, kw[f])

    @classmethod
    def from_scene(cls, sc):
        import numpy as np

        from ..accel.traverse import build_geometry

        geom = build_geometry(sc.positions, sc.faces)
        perm = np.asarray(geom.perm)
        n = sc.normals[sc.faces][perm]
        v = sc.positions[sc.faces][perm]
        gn = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        T = len(perm)
        row_w = 39 if getattr(sc, "colors", None) is not None else 30
        shade = np.zeros((max(T, 1), row_w), np.float32)
        shade[:, 23] = np.float32(np.int32(-1).view(np.float32))  # medium id
        if T:
            # flat-shaded shapes (faceNormals=true) carry zero vertex
            # normals; substitute the geometric normal per corner
            flat = (n * n).sum(-1) < 1e-12  # [T, 3]
            n = np.where(flat[..., None], gn[:, None, :], n)
            shade[:T, 0:3] = n[:, 0]
            shade[:T, 3:6] = n[:, 1]
            shade[:T, 6:9] = n[:, 2]
            shade[:T, 9:12] = gn
            shade[:T, 12] = sc.tri_mat[perm].astype(np.int32).view(np.float32)
            eid = sc.tri_emitter[perm].astype(np.int32)
            shade[:T, 13] = eid.view(np.float32)
            if sc.emitters.num:
                shade[:T, 14:17] = np.where(
                    (eid >= 0)[:, None],
                    sc.emitters.radiance[np.maximum(eid, 0)],
                    0.0,
                )
            if sc.texcoords is not None and len(sc.texcoords):
                uvf = sc.texcoords[sc.faces][perm]  # [T, 3, 2]
                shade[:T, 17:23] = uvf.reshape(T, 6)
            tri_med = getattr(sc, "tri_medium", None)
            if tri_med is not None and len(tri_med):
                shade[:T, 23] = tri_med[perm].astype(np.int32).view(np.float32)
            # uv tangents for bump/normal mapping (Mitsuba's its.dpdu/dpdv)
            if sc.texcoords is not None and len(sc.texcoords):
                uvf = sc.texcoords[sc.faces][perm].astype(np.float64)
                e1 = (v[:, 1] - v[:, 0]).astype(np.float64)
                e2 = (v[:, 2] - v[:, 0]).astype(np.float64)
                du1 = uvf[:, 1, 0] - uvf[:, 0, 0]
                dv1 = uvf[:, 1, 1] - uvf[:, 0, 1]
                du2 = uvf[:, 2, 0] - uvf[:, 0, 0]
                dv2 = uvf[:, 2, 1] - uvf[:, 0, 1]
                det = du1 * dv2 - du2 * dv1
                ok = np.abs(det) > 1e-12
                inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
                dpdu = (e1 * dv2[:, None] - e2 * dv1[:, None]) * inv[:, None]
                dpdv = (e2 * du1[:, None] - e1 * du2[:, None]) * inv[:, None]
                # degenerate uv: any tangent orthogonal-ish to the normal
                fallback = np.where(
                    (np.abs(gn[:, 2:3]) < 0.9),
                    np.cross(gn, np.array([0.0, 0, 1.0])),
                    np.cross(gn, np.array([1.0, 0, 0.0])))
                dpdu = np.where(ok[:, None], dpdu, fallback)
                dpdv = np.where(ok[:, None], dpdv, np.cross(gn, fallback))
                shade[:T, 24:27] = dpdu
                shade[:T, 27:30] = dpdv
            if row_w == 39:
                colf = sc.colors[sc.faces][perm]  # [T, 3, 3]
                shade[:T, 30:39] = colf.reshape(T, 9)

        env = None
        if sc.env_emitter is not None:
            from ..emitters.envmap import build_env_from_spec

            scene_dir = sc.textures.scene_xml.dir if sc.textures else "."
            env = build_env_from_spec(
                sc.env_emitter, scene_dir, sc.aabb_min, sc.aabb_max
            )
        if env is None:
            env = EV.EnvmapArrays.dummy()

        if sc.textures is not None and sc.textures.specs:
            tex = TextureAtlas.build(
                [dict(s.props, _otype=s.otype, _children=s.children)
                 for s in sc.textures.specs],
                sc.textures.scene_xml.dir
            )
            wfp = np.array(tex.wfp)
            if np.any(wfp[:, 0] == 0.0) and len(sc.faces):
                # lineWidth=0 -> 10% of the average edge length
                # (wireframe.cpp:90-106; averaged scene-wide here, the
                # reference averages per mesh — documented deviation)
                v = sc.positions[sc.faces]
                e = np.linalg.norm(
                    v - np.roll(v, -1, axis=1), axis=-1).mean()
                wfp[:, 0] = np.where(wfp[:, 0] == 0.0, 0.1 * e, wfp[:, 0])
                tex.wfp = jnp.asarray(wfp)
        else:
            tex = TextureAtlas.empty()

        if getattr(sc, "delta_emitters", None):
            delta = DE.DeltaEmitterArrays.from_table(
                sc.delta_emitters, sc.aabb_min, sc.aabb_max)
        else:
            delta = DE.DeltaEmitterArrays.empty()

        from ..media import MediaArrays

        if getattr(sc, "media", None):
            media = MediaArrays.from_table(sc.media)
        else:
            media = MediaArrays.empty()

        from ..subsurface import SubsurfArrays

        from ..singlescatter import SSSArrays

        diag = float(np.linalg.norm(sc.aabb_max - sc.aabb_min))
        return cls(
            subsurf=SubsurfArrays.empty(),
            sss=SSSArrays.empty(),
            geom=geom,
            mats=B.MaterialArrays.from_table(sc.materials),
            emitters=E.EmitterArrays.from_scene(sc),
            shade=jnp.asarray(shade),
            eps=jnp.float32(max(diag, 1.0) * 1e-5),
            env=env,
            tex=tex,
            delta=delta,
            media=media,
        )


jax.tree_util.register_pytree_node(
    DeviceScene,
    lambda s: (tuple(getattr(s, f) for f in DeviceScene.FIELDS), None),
    lambda aux, ch: DeviceScene(**dict(zip(DeviceScene.FIELDS, ch))),
)


def fetch_row(scene: DeviceScene, tri):
    """One packed shade-row gather [L,30] (select-chain when small)."""
    return small_table_gather(scene.shade, tri)


def decode_row(row, bu, bv):
    """Decode a fetched shade row -> interpolated shading normal,
    geometric normal, material id, emitter id, emitted radiance,
    interpolated uv, medium id, uv tangents."""
    w0 = (1.0 - bu - bv)[..., None]
    sh_n = normalize(
        row[:, 0:3] * w0 + row[:, 3:6] * bu[..., None] + row[:, 6:9] * bv[..., None]
    )
    geo_n = row[:, 9:12]
    mid = jax.lax.bitcast_convert_type(row[:, 12], jnp.int32)
    eid = jax.lax.bitcast_convert_type(row[:, 13], jnp.int32)
    rad = row[:, 14:17]
    uv = (
        row[:, 17:19] * w0
        + row[:, 19:21] * bu[..., None]
        + row[:, 21:23] * bv[..., None]
    )
    med = jax.lax.bitcast_convert_type(row[:, 23], jnp.int32)
    dpdu = row[:, 24:27]
    dpdv = row[:, 27:30]
    return sh_n, geo_n, mid, eid, rad, uv, med, dpdu, dpdv


def fetch_hit(scene: DeviceScene, tri, bu, bv):
    return decode_row(fetch_row(scene, tri), bu, bv)


def mi_weight(pdf_a, pdf_b):
    """Power heuristic (guided_path.cpp:2247-2250)."""
    a2, b2 = pdf_a * pdf_a, pdf_b * pdf_b
    return jnp.where(a2 > 0, a2 / jnp.maximum(a2 + b2, 1e-38), 0.0)


def _rand(key, j, tag, shape):
    return jax.random.uniform(jax.random.fold_in(jax.random.fold_in(key, j), tag), shape)


# per-bounce QMC dimension block: 2 camera dims, then 36 dims per bounce
# (bsdf 0-2, guiding-tree 3-24, nee 25-26, rr 27, mask 28,
#  medium-distance 29-30, phase 31-32)
DIM_BLOCK = 36
_TAG_DIM = {0: 0, 1: 3, 2: 25, 3: 27, 7: 28, 8: 29, 9: 31, 10: 33, 11: 34}


def _sample_emitters(scene: DeviceScene, cfg: PTConfig, p, ref_n, u_nee):
    """Uniform-slot NEE sample over the scene's emitter set: area
    emitters, the environment, and delta (point/spot/directional)
    emitters (Scene::sampleEmitterDirect's uniform m_emitterPDF).
    Returns (ds dict with d/dist/pdf/value/discrete, n_slots)."""
    n_area = scene.emitters.num
    n_env = 1 if cfg.has_env else 0
    n_delta = scene.delta.num
    n_slots = n_area + n_env + n_delta
    L = u_nee.shape[0]

    if n_env + n_delta == 0:
        ds = E.sample_direct(scene.emitters, p, ref_n, u_nee)
        ds["discrete"] = jnp.zeros(L, bool)
        return ds, n_slots

    xe = u_nee[..., 0] * n_slots
    slot = jnp.clip(xe.astype(jnp.int32), 0, n_slots - 1)
    xr = xe - slot
    parts = []
    if n_area:
        ds_a = E.sample_direct(scene.emitters, p, ref_n, u_nee,
                               slot=slot, x1=xr, n_slots=n_slots)
        ds_a["discrete"] = jnp.zeros(L, bool)
        parts.append((slot < n_area, ds_a))
    if n_env:
        ds_e = EV.sample_direct(scene.env, p,
                                jnp.stack([xr, u_nee[..., 1]], -1))
        ds_e = dict(d=ds_e["d"], dist=ds_e["dist"],
                    pdf=ds_e["pdf"] / n_slots,
                    value=ds_e["value"] * n_slots,
                    discrete=jnp.zeros(L, bool))
        parts.append((slot == n_area, ds_e))
    if n_delta:
        ds_d = DE.sample_direct(scene.delta, slot - n_area - n_env, p)
        ds_d = dict(d=ds_d["d"], dist=ds_d["dist"],
                    pdf=ds_d["pdf"] / n_slots,
                    value=ds_d["value"] * n_slots,
                    discrete=ds_d["discrete"])
        parts.append((slot >= n_area + n_env, ds_d))

    sel_mask, ds = parts[-1]
    for mask, part in reversed(parts[:-1]):
        ds = {
            k: jnp.where(
                mask.reshape(mask.shape + (1,) * (part[k].ndim - 1)),
                part[k], ds[k])
            for k in ds
        }
    return ds, n_slots


def shadow_transmittance(scene: DeviceScene, cfg: PTConfig, o, d, dist,
                         med, key, active, max_inter=None):
    """Spectral transmittance along the shadow segment [o, o + dist*d]
    (Scene::evalTransmittance, scene.cpp:619-679, reached via
    sampleAttenuatedEmitterDirect at scene.cpp:854-898).

    Walks the segment surface by surface: a surface whose BSDF carries
    an ENull component passes the ray through, multiplying the null
    lobe's discrete eval — 1 for `null`, (1 - opacity) for `mask`
    (mask.cpp), textured opacity evaluated at the hit uv — while any
    other surface blocks (T = 0). Per sub-segment the CURRENT medium's
    transmittance accumulates (homogeneous closed form; heterogeneous
    unbiased ratio tracking) and crossing a boundary switches the lane's
    medium to the crossed shape's interior (or vacuum), exactly like the
    reference's medium hand-off at `its.getTargetMedium(d)`.

    `max_inter` ([L] i32 or None) mirrors the reference's interaction
    cap (`maxInteractions = maxDepth - depth - 1`): a surface hit at the
    cap blocks even if null-typed; None/negative = unlimited.
    Lanes with active=False park (t_max < t_min) and return T = 1.
    """
    from ..core.vecmath import small_table_gather as _gather

    L = o.shape[0]
    if cfg.has_media:
        from .. import media as MED
    MAX_CROSS = 64  # precaution bound, reference uses 100 (:2224)

    def w_cond(st):
        t_cur, T, alive, med_c, it = st
        return jnp.any(alive) & (it < MAX_CROSS)

    def w_body(st):
        t_cur, T, alive, med_c, it = st
        o_cur = o + t_cur[..., None] * d
        remain = dist - t_cur
        tri, t_hit, bu, bv = closest_hit(
            scene.geom, o_cur, d, jnp.zeros(L),
            jnp.where(alive, remain, -1.0))
        hit = (tri >= 0) & alive
        seg = jnp.where(hit, t_hit, remain)
        if cfg.has_media:
            s_t, _, _ = MED.fetch(scene.media, med_c)
            T = T * MED.transmittance(s_t, jnp.where(alive, seg, 0.0))
            if cfg.has_hetero:
                het = alive & (med_c >= 0) & (
                    MED.fetch_row(scene.media, med_c)[:, 7] > 0)
                t_h = MED.ratio_transmittance(
                    scene.media, med_c, o_cur, d,
                    jnp.where(het, seg, 0.0),
                    jax.random.fold_in(key, 1000 + it))
                T = jnp.where(het[..., None], T * t_h[..., None], T)
        row = fetch_row(scene, jnp.maximum(tri, 0))
        _, geo_n, mid, _, _, uv, surf_med, _, _ = decode_row(row, bu, bv)
        mrow = _gather(scene.mats.packed, mid)
        mt = jax.lax.bitcast_convert_type(mrow[:, 0], jnp.int32)
        is_null = mt == MAT_NULL
        is_mask = mt == MAT_MASK
        passthru = is_null | is_mask
        if max_inter is not None:
            passthru = passthru & ((max_inter < 0) | (it < max_inter))
        if cfg.has_mask:
            opac = mrow[:, 23:26]
            if cfg.has_tex and cfg.has_tex_opacity:
                tid = jax.lax.bitcast_convert_type(mrow[:, 34], jnp.int32)
                tval = sample_atlas(scene.tex, tid + 1, uv, None)
                opac = jnp.where((tid >= 0)[..., None], tval, opac)
            T = jnp.where((hit & is_mask)[..., None], T * (1.0 - opac), T)
        blocked = hit & ~passthru
        T = jnp.where(blocked[..., None], 0.0, T)
        if cfg.has_media:
            going_in = dot(geo_n, d) < 0
            med_c = jnp.where(hit & passthru,
                              jnp.where(going_in, surf_med, -1), med_c)
        alive = hit & passthru & jnp.any(T > 0, -1)
        t_cur = jnp.where(alive, t_cur + t_hit + scene.eps, dist)
        return (t_cur, T, alive, med_c, it + 1)

    med0 = med if med is not None else jnp.full(L, -1, jnp.int32)
    (_, T, _, _, _) = jax.lax.while_loop(
        w_cond, w_body,
        (jnp.zeros(L), jnp.ones((L, 3), jnp.float32), active, med0,
         jnp.int32(0)))
    return T


def trace_paths(scene: DeviceScene, cfg: PTConfig, key, o, d, t_min, t_max,
                sdtree=None, pixel_ids=None, sample_idx=0, sensor=None):
    """Trace a wavefront of L camera rays to completion.

    pixel_ids/sample_idx feed the deterministic QMC samplers
    (cfg.sampler != "independent"); with the default independent sampler
    randomness is counter-based threefry on `key` alone.

    Returns dict with:
      li      [L,3]  pixel radiance estimates
      vertices: None or a dict of stacked per-bounce training records
                (see guiding.records) when cfg.record_vertices.
    """
    L = o.shape[0]
    J = cfg.n_bounces
    f3 = lambda: jnp.zeros((L, 3), jnp.float32)

    # -- camera-segment intersection ---------------------------------------
    tri, t, bu, bv = closest_hit(scene.geom, o, d, t_min, t_max)
    hit = tri >= 0

    # depth-0 emitter / environment contribution (guided_path.cpp:1902-1919)
    c0 = f3()
    if not cfg.hide_emitters:
        sh_n0, _, _, eid0, rad0, *_ = fetch_hit(scene, jnp.maximum(tri, 0), bu, bv)
        front0 = dot(sh_n0, -d) > 0
        c0 = jnp.where((hit & (eid0 >= 0) & front0)[..., None], rad0, 0.0)
        if cfg.has_env:
            c0 = c0 + jnp.where(hit[..., None], 0.0, EV.eval_env(scene.env, d))

    if J == 0:
        return dict(li=c0, vertices=None, n_rays=jnp.int32(L),
                    n_vertices=jnp.int32(0))

    guide = cfg.guiding and sdtree is not None
    if guide:
        from ..guiding import sdtree as G

    use_qmc = cfg.sampler != "independent" and pixel_ids is not None
    if use_qmc:
        from ..render import samplers as S

    def draw(j, tag, shape):
        if not use_qmc:
            return _rand(key, j, tag, shape)
        dim = 2 + (j - 1) * DIM_BLOCK + _TAG_DIM[tag]
        return S.draw(cfg.sampler, pixel_ids, sample_idx, dim, key, shape)

    if cfg.has_media:
        from .. import media as MED

    carry = dict(
        active=hit,
        o=o, d=d,
        row=fetch_row(scene, jnp.maximum(tri, 0)),
        tri=jnp.maximum(tri, 0), t=t, bu=bu, bv=bv,
        throughput=jnp.ones((L, 3), jnp.float32),
        eta=jnp.ones(L, jnp.float32),
        med=jnp.full(L, -1, jnp.int32),       # sensor assumed in vacuum
        in_medium=jnp.zeros(L, bool),
        # last REAL (non-ENull) scatter's MIS state, carried through
        # null/mask pass-through chains (guided_path.cpp:2045-2075):
        # the camera segment counts as delta (emitter hits score weight 1)
        wo_pdf_real=jnp.zeros(L, jnp.float32),
        delta_real=jnp.ones(L, bool),
        p_real=o,
    )

    def body(carry, j):
        act = carry["active"]
        o, d = carry["o"], carry["d"]
        tri = carry["tri"]
        thr = carry["throughput"]
        eta = carry["eta"]

        # media lane state: in_medium lanes sit at a scattering event at
        # distance t along the ray (guided_path.cpp:1803-1893 branch)
        if cfg.has_media:
            in_med = carry["in_medium"] & act
            med = carry["med"]
        else:
            in_med = jnp.zeros(L, bool)
            med = jnp.full(L, -1, jnp.int32)

        p = o + carry["t"][..., None] * d
        if cfg.has_media:
            # x resolves orientation-volume fiber axes at the event
            m_sigma_t, m_albedo, m_pp = MED.fetch(scene.media, med, x=p)
        sh_n, geo_n, mid, _, _, uv, surf_med, dpdu, dpdv = decode_row(
            carry["row"], carry["bu"], carry["bv"])
        # flip geometric normal toward the incident side, as Mitsuba's
        # Intersection does via the shading frame side convention
        wi_dot_geo = -dot(geo_n, d)
        wi_dot_sh = -dot(sh_n, d)

        if cfg.strict_normals:
            act = act & (in_med | (wi_dot_geo * wi_dot_sh >= 0))

        params = B.gather_params(scene.mats, mid)

        if cfg.has_vertexcolors:
            w0c = (1.0 - carry["bu"] - carry["bv"])[..., None]
            row_c = carry["row"]
            vcol = (row_c[:, 30:33] * w0c
                    + row_c[:, 33:36] * carry["bu"][..., None]
                    + row_c[:, 36:39] * carry["bv"][..., None])
        else:
            vcol = None

        if cfg.has_wireframe:
            wf_tri = scene.geom.tri[carry["tri"]]
        else:
            wf_tri = None

        duv = None
        if cfg.has_tex and cfg.has_tex_ewa and sensor is not None \
                and hasattr(sensor, "dir_differentials"):
            # full uv Jacobian from transferred camera ray differentials
            # (EWA path, mipmap.h:640-713); bounce lanes get zero
            # gradients -> base-level lookups
            from ..scene.textures import uv_differentials

            duv = uv_differentials(sensor, d, carry["t"], geo_n, dpdu,
                                   dpdv, j == 0)
            foot_uv = None
        elif cfg.has_tex and sensor is not None and hasattr(sensor,
                                                            "footprint"):
            # primary-hit ray differentials (isotropic): pixel footprint
            # at the camera hit mapped through dpdu/dpdv into uv space,
            # selecting the MIP level (secondary bounces sample the base
            # level, like the reference path tracer's camera-only
            # differentials)
            foot_w = jnp.where(j == 0, sensor.footprint(carry["t"]), 0.0)
            foot_uv = jnp.stack(
                [foot_w / jnp.maximum(
                    jnp.linalg.norm(dpdu, axis=-1), 1e-12),
                 foot_w / jnp.maximum(
                     jnp.linalg.norm(dpdv, axis=-1), 1e-12)], -1)
        else:
            foot_uv = None

        def tex_override(pr):
            """Replace textured parameters with atlas lookups."""
            if not cfg.has_tex:
                return pr
            n_slots_tex = scene.tex.vcflag.shape[0]
            fields = [("reflectance", "tex_reflectance")]
            if cfg.has_tex_opacity:
                fields.append(("opacity", "tex_opacity"))
            for field, slot in fields:
                tid = pr[slot]
                val = sample_atlas(scene.tex, tid + 1, uv, foot_uv,
                                   duv=duv)
                if cfg.has_vertexcolors:
                    is_vc = scene.tex.vcflag[
                        jnp.clip(tid + 1, 0, n_slots_tex - 1)]
                    val = jnp.where(is_vc[..., None], vcol, val)
                if cfg.has_wireframe:
                    from ..scene.textures import wireframe_color

                    is_wf = scene.tex.wfp[
                        jnp.clip(tid + 1, 0, n_slots_tex - 1), 0] >= 0
                    wcol = wireframe_color(scene.tex, tid + 1, wf_tri,
                                           carry["bu"], carry["bv"])
                    val = jnp.where(is_wf[..., None], wcol, val)
                pr[field] = jnp.where((tid >= 0)[..., None], val, pr[field])
            return pr

        params = tex_override(params)
        if cfg.has_bump:
            from ..scene.textures import perturb_normal

            sh_n = perturb_normal(
                scene.tex, params["tex_bump"] + 1, params["bump_is_normal"],
                uv, sh_n, dpdu, dpdv)
            wi_dot_sh = -dot(sh_n, d)
        smooth, delta_only, _, transmissive = B.lane_flags(params)

        # -- mask (opacity) BSDF: stochastic nested/pass-through select
        #    (src/bsdfs/mask.cpp sample/eval/pdf semantics) ----------------
        if cfg.has_mask:
            is_mask = params["mtype"] == MAT_MASK
            opacity = params["opacity"]
            prob = jnp.clip(
                opacity[..., 0] * 0.212671 + opacity[..., 1] * 0.715160
                + opacity[..., 2] * 0.072169, 1e-6, 1.0 - 1e-6)
            u_m = draw(j, 7, (L,))
            go_nested = is_mask & (u_m < prob)
            pass_thru = is_mask & (u_m >= prob)
            mid_n = jnp.where(is_mask, jnp.maximum(params["nested"], 0), mid)
            params_n = tex_override(B.gather_params(scene.mats, mid_n))
            params = jax.tree.map(
                lambda a, b: jnp.where(
                    is_mask.reshape(is_mask.shape + (1,) * (a.ndim - 1)), a, b
                ),
                params_n, params)
            sm_n, do_n, _, _ = B.lane_flags(params)
            smooth = jnp.where(is_mask, sm_n, smooth)
            delta_only = jnp.where(is_mask, do_n, delta_only)
            transmissive = transmissive | is_mask
            # eval/pdf multipliers: f *= opacity, pdf *= prob on mask lanes
            f_scale = jnp.where(is_mask[..., None], opacity, 1.0)
            p_scale = jnp.where(is_mask, prob, 1.0)
        else:
            is_mask = pass_thru = go_nested = None
            f_scale = p_scale = opacity = prob = None

        def mask_sample(wo_t, w_t, pdf_t, delta_t, eta_t, wi_local):
            """Adjust a BSDF sample for mask lanes (mask.cpp:sample)."""
            if not cfg.has_mask:
                return wo_t, w_t, pdf_t, delta_t, eta_t
            w_t = jnp.where(
                go_nested[..., None],
                w_t * opacity / jnp.maximum(prob, 1e-9)[..., None], w_t)
            pdf_t = jnp.where(go_nested, pdf_t * prob, pdf_t)
            wo_t = jnp.where(pass_thru[..., None], -wi_local, wo_t)
            w_t = jnp.where(
                pass_thru[..., None],
                (1.0 - opacity) / jnp.maximum(1.0 - prob, 1e-9)[..., None], w_t)
            pdf_t = jnp.where(pass_thru, 1.0 - prob, pdf_t)
            delta_t = delta_t | pass_thru
            eta_t = jnp.where(pass_thru, 1.0, eta_t)
            return wo_t, w_t, pdf_t, delta_t, eta_t

        # -- blendbsdf / mixturebsdf: stochastic child pick for sampling,
        #    exact mixture for eval/pdf (src/bsdfs/{blendbsdf,mixturebsdf}.cpp;
        #    smooth children only in this round) ---------------------------
        if cfg.has_blend:
            is_blend = params["mtype"] == MAT_BLEND
            w_bl = params["blend_w"]
            mid_a = jnp.where(is_blend, jnp.maximum(params["nested"], 0), mid)
            mid_b = jnp.where(is_blend, jnp.maximum(params["nested2"], 0), mid)
            params_a = tex_override(B.gather_params(scene.mats, mid_a))
            params_b = tex_override(B.gather_params(scene.mats, mid_b))
            u_bl = draw(j, 10, (L,))
            pick_b2 = is_blend & (u_bl < w_bl)
            # sampling uses the picked child's params
            params = jax.tree.map(
                lambda pa, pb, pr: jnp.where(
                    pick_b2.reshape(pick_b2.shape + (1,) * (pa.ndim - 1)), pb,
                    jnp.where(
                        is_blend.reshape(is_blend.shape + (1,) * (pa.ndim - 1)),
                        pa, pr)),
                params_a, params_b, params)
            sm_a, do_a, _, tr_a = B.lane_flags(params_a)
            sm_b, do_b, _, tr_b = B.lane_flags(params_b)
            smooth = jnp.where(is_blend, sm_a | sm_b, smooth)
            delta_only = jnp.where(is_blend, do_a & do_b, delta_only)
            transmissive = jnp.where(is_blend, tr_a | tr_b, transmissive)
        else:
            is_blend = None

        # -- coating / roughcoating: dielectric layer over a nested leaf
        #    BSDF (src/bsdfs/coating.cpp, roughcoating.cpp; bsdf/layered.py)
        if cfg.has_coating:
            from ..bsdf import layered as LY

            is_coat = ((params["mtype"] == MAT_COATING)
                       | (params["mtype"] == MAT_ROUGHCOATING))
            is_rough_coat = params["mtype"] == MAT_ROUGHCOATING
            mid_c = jnp.where(is_coat, jnp.maximum(params["nested"], 0), mid)
            params_c = tex_override(B.gather_params(scene.mats, mid_c))
            sm_c, do_c, _, tr_c = B.lane_flags(params_c)
            smooth = jnp.where(is_coat, sm_c | is_rough_coat, smooth)
            delta_only = jnp.where(is_coat, do_c & ~is_rough_coat, delta_only)
            transmissive = jnp.where(is_coat, tr_c, transmissive)
            u_coat = draw(j, 11, (L, 1))
        else:
            is_coat = None

        def eval_b(wi_l, wo_l):
            f = B.eval_bsdf(params, wi_l, wo_l, present=scene.mats.present)
            if cfg.has_blend:
                fa = B.eval_bsdf(params_a, wi_l, wo_l,
                                 present=scene.mats.present)
                fb = B.eval_bsdf(params_b, wi_l, wo_l,
                                 present=scene.mats.present)
                fmix = (1 - w_bl)[..., None] * fa + w_bl[..., None] * fb
                f = jnp.where(is_blend[..., None], fmix, f)
            if cfg.has_coating:
                fc, _ = LY.eval_pdf(params, params_c, wi_l, wo_l,
                                    present=scene.mats.present)
                f = jnp.where(is_coat[..., None], fc, f)
            return f * f_scale if cfg.has_mask else f

        def pdf_b(wi_l, wo_l):
            q = B.pdf_bsdf(params, wi_l, wo_l, present=scene.mats.present)
            if cfg.has_blend:
                qa = B.pdf_bsdf(params_a, wi_l, wo_l,
                                present=scene.mats.present)
                qb = B.pdf_bsdf(params_b, wi_l, wo_l,
                                present=scene.mats.present)
                q = jnp.where(is_blend, (1 - w_bl) * qa + w_bl * qb, q)
            if cfg.has_coating:
                _, qc = LY.eval_pdf(params, params_c, wi_l, wo_l,
                                    present=scene.mats.present)
                q = jnp.where(is_coat, qc, q)
            return q * p_scale if cfg.has_mask else q

        def coat_fix(wo_t, w_t, pdf_t, delta_t, eta_t, wi_local, ua):
            """Override coating lanes with the layered sampler."""
            if not cfg.has_coating:
                return wo_t, w_t, pdf_t, delta_t, eta_t
            u4 = jnp.concatenate([ua, u_coat], -1)
            wo_c, w_c, pdf_c, d_c, e_c = LY.sample(
                params, params_c, wi_local, u4, present=scene.mats.present)
            return (jnp.where(is_coat[..., None], wo_c, wo_t),
                    jnp.where(is_coat[..., None], w_c, w_t),
                    jnp.where(is_coat, pdf_c, pdf_t),
                    jnp.where(is_coat, d_c, delta_t),
                    jnp.where(is_coat, e_c, eta_t))

        def blend_fix(wo_t, w_t, pdf_t, wi_local):
            """Replace the picked-child importance weight with the exact
            mixture weight f_mix/pdf_mix for blend lanes."""
            if not cfg.has_blend:
                return w_t, pdf_t
            fmix = eval_b(wi_local, wo_t)
            pmix = pdf_b(wi_local, wo_t)
            w_mix = jnp.where(
                pmix[..., None] > 0,
                fmix / jnp.maximum(pmix, 1e-38)[..., None], 0.0)
            w_t = jnp.where(is_blend[..., None], w_mix, w_t)
            pdf_t = jnp.where(is_blend, pmix, pdf_t)
            return w_t, pdf_t

        s_ax, t_ax = build_frame(sh_n)
        wi = to_local(s_ax, t_ax, sh_n, -d)

        # -- SD-tree lookup (guiding ignores media: README "No Support for
        #    Participating Media") --------------------------------------------
        if guide:
            dtree_id, voxel = G.lookup(sdtree, p)
            has_tree = smooth & ~in_med
            dtree_id = jnp.where(has_tree, dtree_id, -1)
            if cfg.learn_fraction:
                frac = G.sampling_fraction(sdtree, dtree_id)
                frac = jnp.where(has_tree, frac, cfg.bsdf_fraction)
            else:
                frac = jnp.full(L, cfg.bsdf_fraction)
        else:
            dtree_id = jnp.full(L, -1, jnp.int32)
            voxel = jnp.ones((L, 3), jnp.float32)
            frac = jnp.full(L, cfg.bsdf_fraction)

        # -- sampleMat: one-sample MIS of BSDF and guided sampling ----------
        u_bsdf = draw(j, 0, (L, 3))
        if guide and cfg.is_built:
            use_guide_mix = (dtree_id >= 0) & ~delta_only
            pick_bsdf = u_bsdf[:, 0] < frac
            # branch a: bsdf with rescaled sample
            ua = jnp.stack(
                [jnp.clip(u_bsdf[:, 0] / jnp.maximum(frac, 1e-9), 0.0, 1.0 - 1e-7),
                 u_bsdf[:, 1], u_bsdf[:, 2]], -1)
            wo_a, w_a, pdf_a, delta_a, eta_a = coat_fix(
                *mask_sample(
                    *B.sample_bsdf(params, wi, ua,
                                   present=scene.mats.present), wi),
                wi, ua)
            if cfg.has_blend:
                w_a, pdf_a = blend_fix(wo_a, w_a, pdf_a, wi)
            # branch b: sample the directional quadtree (one uniform per
            # level + 2 for the leaf cell, QuadTreeNode::sample :257-301)
            u_tree = draw(j, 1, (L, G.MAX_Q_DEPTH + 2))
            # fused sample+pdf walk: bsdf-picked lanes point-descend
            # their own sampled direction in the SAME gather chain the
            # tree-picked lanes cdf-walk (one chain per bounce, not two);
            # the per-dtree scalars come from ONE d_meta row gather
            is_point = pick_bsdf | ~use_guide_mix
            wo_world_a = to_world(s_ax, t_ax, sh_n, wo_a)
            d_root, d_uni, _ = G.dtree_meta(sdtree, dtree_id)
            d_tree, dtree_pdf = G.sample_pdf_dir(
                sdtree, jnp.maximum(dtree_id, 0), u_tree, is_point,
                G.dir_to_canonical(wo_world_a), root=d_root,
                uniform=d_uni)
            wo_b = to_local(s_ax, t_ax, sh_n, d_tree)

            wo = jnp.where(is_point[..., None], wo_a, wo_b)
            sampled_delta = jnp.where(use_guide_mix, delta_a & pick_bsdf, delta_a)
            eta_s = jnp.where(use_guide_mix & ~pick_bsdf, 1.0, eta_a)

            bsdf_pdf = pdf_b(wi, wo)
            f_cos = eval_b(wi, wo)
            wo_world = to_world(s_ax, t_ax, sh_n, wo)
            wo_pdf = frac * bsdf_pdf + (1 - frac) * dtree_pdf
            # delta lobe picked via bsdf: guiding pdf 0 (guided_path.cpp:1670-1676)
            wo_pdf = jnp.where(sampled_delta, pdf_a * frac, wo_pdf)
            dtree_pdf = jnp.where(sampled_delta, 0.0, dtree_pdf)
            bsdf_pdf = jnp.where(sampled_delta, pdf_a, bsdf_pdf)
            value = jnp.where(
                sampled_delta[..., None],
                w_a * pdf_a[..., None],  # f (delta); weight carries f/pdf
                f_cos,
            )
            bsdf_weight = jnp.where(
                wo_pdf[..., None] > 0, value / jnp.maximum(wo_pdf, 1e-38)[..., None], 0.0
            )
            # lanes without guide mix: plain bsdf sampling
            plain_w = w_a
            plain_pdf = pdf_a
            bsdf_weight = jnp.where(use_guide_mix[..., None], bsdf_weight, plain_w)
            wo_pdf = jnp.where(use_guide_mix, wo_pdf, plain_pdf)
            bsdf_pdf = jnp.where(use_guide_mix, plain_pdf, bsdf_pdf)
            dtree_pdf = jnp.where(use_guide_mix, dtree_pdf, 0.0)
        else:
            wo, bsdf_weight, bsdf_pdf, sampled_delta, eta_s = coat_fix(
                *mask_sample(
                    *B.sample_bsdf(params, wi, u_bsdf,
                                   present=scene.mats.present), wi),
                wi, u_bsdf)
            if cfg.has_blend:
                bsdf_weight, bsdf_pdf = blend_fix(wo, bsdf_weight, bsdf_pdf, wi)
            wo_pdf = bsdf_pdf
            dtree_pdf = jnp.zeros(L)
            wo_world = to_world(s_ax, t_ax, sh_n, wo)
        wo_world = to_world(s_ax, t_ax, sh_n, wo)

        # -- medium lanes: phase sampling replaces the BSDF ------------------
        if cfg.has_media:
            u_ph = draw(j, 9, (L, 2))
            d_ph, pdf_ph, w_ph = MED.phase_sample_full(m_pp, d, u_ph)
            wo_world = jnp.where(in_med[..., None], d_ph, wo_world)
            bsdf_weight = jnp.where(in_med[..., None], w_ph[..., None],
                                    bsdf_weight)
            wo_pdf = jnp.where(in_med, pdf_ph, wo_pdf)
            bsdf_pdf = jnp.where(in_med, pdf_ph, bsdf_pdf)
            sampled_delta = jnp.where(in_med, False, sampled_delta)
            eta_s = jnp.where(in_med, 1.0, eta_s)
            dtree_pdf = jnp.where(in_med, 0.0, dtree_pdf)

        # -- ENull transitions (guided_path.cpp:2045-2075): a sampled
        #    pass-through (null BSDF, or the mask's 1-opacity lobe) keeps
        #    the last REAL scatter's MIS state so the emitter hit beyond
        #    the panel MIS-pairs against the NEE sample taken at that
        #    real vertex (the reference achieves the same pairing with
        #    rayIntersectAndLookForEmitter's null walk + the
        #    ERadianceNoEmission flag) ------------------------------------
        null_trans = jnp.zeros(L, bool)
        if cfg.has_null:
            null_trans = params["mtype"] == MAT_NULL
        if cfg.has_mask:
            null_trans = null_trans | pass_thru
        null_trans = null_trans & act & ~in_med
        wo_pdf_mis = jnp.where(null_trans, carry["wo_pdf_real"], wo_pdf)
        delta_mis = jnp.where(null_trans, carry["delta_real"], sampled_delta)
        p_ref = jnp.where(null_trans[..., None], carry["p_real"], p)

        slot = f3()
        if cfg.has_subsurf:
            from ..subsurface import lo_sub

            ss_id_l = jnp.where(act & ~in_med if cfg.has_media else act,
                                scene.subsurf.tri_ss[carry["tri"]], -1)
            slot = slot + thr * lo_sub(scene.subsurf, ss_id_l, p, wi_dot_sh)
        if cfg.has_sss:
            # singlescatter subsurface (singlescatter.cpp Lo()): interior
            # single-scattering added here; the shape's boundary is a
            # delta interface whose reflect/refract branch OVERRIDES the
            # path continuation (the black default BSDF sampled above
            # would terminate it) — see singlescatter.py for semantics
            from ..singlescatter import single_scatter

            is_ss_gate = act & ~in_med if cfg.has_media else act
            sss_id_l = jnp.where(is_ss_gate,
                                 scene.sss.tri_ss[carry["tri"]], -1)
            k_sss = jax.random.fold_in(jax.random.fold_in(key, j), 0x551)
            L_ss, ss_cont = single_scatter(scene, cfg, sss_id_l, p, d,
                                           sh_n, geo_n, k_sss)
            slot = slot + thr * L_ss
            is_ss = sss_id_l >= 0
            wo_world = jnp.where(is_ss[..., None], ss_cont["d"], wo_world)
            wo = jnp.where(is_ss[..., None],
                           to_local(s_ax, t_ax, sh_n, ss_cont["d"]), wo)
            bsdf_weight = jnp.where(is_ss[..., None], ss_cont["w"],
                                    bsdf_weight)
            wo_pdf = jnp.where(is_ss, 1.0, wo_pdf)
            bsdf_pdf = jnp.where(is_ss, 1.0, bsdf_pdf)
            sampled_delta = sampled_delta | is_ss
            eta_s = jnp.where(is_ss, 1.0, eta_s)
            dtree_pdf = jnp.where(is_ss, 0.0, dtree_pdf)
            dtree_id = jnp.where(is_ss, -1, dtree_id)
        # -- next-event estimation (guided_path.cpp:1967-2021) --------------
        nee_rec = None
        if cfg.do_nee:
            u_nee = draw(j, 2, (L, 2))
            ref_n = jnp.where((transmissive | in_med)[..., None], 0.0, sh_n)
            ds, n_slots = _sample_emitters(scene, cfg, p, ref_n, u_nee)
            nee_ok = act & (smooth | in_med) & (ds["pdf"] > 0)
            wo_nee = to_local(s_ax, t_ax, sh_n, ds["d"])
            if cfg.strict_normals:
                nee_ok = nee_ok & (
                    in_med | (dot(geo_n, ds["d"]) * wo_nee[..., 2] > 0))
            f_nee = eval_b(wi, wo_nee)
            # pdf of generating that direction via path sampling (for MIS)
            bsdf_pdf_nee = pdf_b(wi, wo_nee)
            if cfg.has_media:
                # in-medium NEE: the phase function is the "BSDF"
                # (sigma_s is already folded into the throughput by the
                # segment's distance-sampling weight)
                ph_val = MED.phase_eval(m_pp, d, ds["d"])
                ph_pdf = MED.phase_pdf(m_pp, d, ds["d"])
                f_nee = jnp.where(in_med[..., None], ph_val[..., None], f_nee)
                bsdf_pdf_nee = jnp.where(in_med, ph_pdf, bsdf_pdf_nee)
            if guide and cfg.is_built:
                dtree_pdf_nee = G.pdf_dir2(
                    sdtree, jnp.maximum(dtree_id, 0), ds["d"],
                    root=d_root, uniform=d_uni)
                wo_pdf_nee = jnp.where(
                    (dtree_id >= 0) & ~delta_only,
                    frac * bsdf_pdf_nee + (1 - frac) * dtree_pdf_nee,
                    bsdf_pdf_nee,
                )
            else:
                dtree_pdf_nee = jnp.zeros(L)
                wo_pdf_nee = bsdf_pdf_nee
            # visibility (Scene::sampleAttenuatedEmitterDirect semantics:
            # the shadow segment passes through null/mask ENull lobes and
            # accumulates exact per-sub-segment medium transmittance with
            # boundary switching; opaque scenes use the cheap any-hit)
            so = p + jnp.sign(wi_dot_geo)[..., None] * geo_n * scene.eps
            if cfg.has_media:
                so = jnp.where(in_med[..., None], p, so)
            sh_tmax = jnp.where(
                nee_ok, ds["dist"] * (1 - SHADOW_EPS) - scene.eps, -1.0)
            if cfg.has_mask or cfg.has_null or cfg.has_media:
                max_inter = (jnp.full(L, -1, jnp.int32)
                             if cfg.max_depth < 0 else
                             jnp.full(L, cfg.max_depth, jnp.int32) - j - 1)
                t_sh = shadow_transmittance(
                    scene, cfg, so, ds["d"], jnp.maximum(sh_tmax, 0.0),
                    med if cfg.has_media else None,
                    jax.random.fold_in(jax.random.fold_in(key, j), 43),
                    nee_ok, max_inter=max_inter)
                nee_ok = nee_ok & jnp.any(t_sh > 0, -1)
            else:
                from ..accel.traverse import any_hit

                occluded = any_hit(scene.geom, so, ds["d"],
                                   jnp.full(L, 0.0), sh_tmax)
                nee_ok = nee_ok & ~occluded
                t_sh = None
            # delta emitters sample in the discrete measure: no heuristic
            # (miWeight applies only to solid-angle measures)
            w_mis = jnp.where(ds["discrete"], 1.0,
                              mi_weight(ds["pdf"], wo_pdf_nee))
            l_nee = thr * ds["value"] * f_nee * w_mis[..., None]
            if t_sh is not None:
                l_nee = l_nee * t_sh
            l_nee = jnp.where(nee_ok[..., None], l_nee, 0.0)
            slot = slot + l_nee
            nee_rec = dict(
                p=p, d=ds["d"], radiance=l_nee,
                throughput=thr * f_nee / jnp.maximum(ds["pdf"], 1e-38)[..., None],
                bsdf_val=f_nee, wo_pdf=ds["pdf"], bsdf_pdf=bsdf_pdf_nee,
                dtree_pdf=dtree_pdf_nee, dtree_id=dtree_id, voxel=voxel,
                valid=nee_ok & (dtree_id >= 0),
            )

        # -- continue the path ----------------------------------------------
        nonzero = jnp.any(bsdf_weight > 0, axis=-1) & (wo_pdf > 0)
        act_c = act & nonzero
        if cfg.strict_normals:
            act_c = act_c & (in_med | (dot(geo_n, wo_world) * wo[..., 2] > 0))

        thr2 = thr * bsdf_weight
        eta2 = eta * eta_s
        o2 = p + jnp.sign(dot(geo_n, wo_world))[..., None] * geo_n * scene.eps
        if cfg.has_media:
            o2 = jnp.where(in_med[..., None], p, o2)
        if cfg.has_sss:
            # singlescatter transmission continues from the FAR boundary
            # exit point, not the entry hit (singlescatter.cpp:1344-1374
            # launches Li from its2.p); reflection lanes get the same
            # entry-side origin either way
            o2 = jnp.where(is_ss[..., None], ss_cont["o"], o2)
        d2 = wo_world

        # inactive lanes park immediately in the traversal (t_max < t_min)
        # instead of walking the BVH with stale/degenerate rays — the
        # while-loop runs to the WORST lane, so garbage lanes dominated
        # deep-bounce wavefronts on big scenes
        tri2, t2, bu2, bv2 = closest_hit(
            scene.geom, o2, d2, jnp.zeros(L),
            jnp.where(act_c, 3.4e38, -1.0)
        )
        hit2 = (tri2 >= 0) & act_c
        escaped = act_c & (tri2 < 0)
        tri2s = jnp.maximum(tri2, 0)
        row2 = fetch_row(scene, tri2s)
        sh_n2, _, _, eid2, rad2, _, med_of_hit2, *_ = decode_row(row2, bu2, bv2)
        em2 = jnp.where(hit2, eid2, -1)
        front2 = dot(sh_n2, -d2) > 0
        le2 = jnp.where((hit2 & (eid2 >= 0) & front2)[..., None], rad2, 0.0)
        if cfg.has_env:
            le2 = le2 + jnp.where(
                escaped[..., None], EV.eval_env(scene.env, d2), 0.0)
        p2 = o2 + t2[..., None] * d2

        # -- medium transitions + distance sampling on the new segment ------
        if cfg.has_media:
            # transmission through a boundary switches the lane's medium to
            # the crossed surface's interior (outward geo normals) or vacuum
            # transmission: wo leaves on the side the ray came FROM's
            # opposite, i.e. dot(geo_n, wo) and wi_dot_geo = -dot(geo_n, d)
            # share sign only on reflection
            crossing = ~in_med & (dot(geo_n, wo_world) * wi_dot_geo < 0) & act

            going_in = dot(geo_n, wo_world) < 0
            med2 = jnp.where(
                crossing, jnp.where(going_in, surf_med, -1), med)
            s_t2, alb2, _ = MED.fetch(scene.media, med2)
            u_dist = draw(j, 8, (L, 2))
            t_for_sampling = jnp.where(hit2, t2, jnp.inf)
            is_med2, t_eff, w_seg = MED.sample_distance(
                s_t2, alb2, t_for_sampling, u_dist[:, 0], u_dist[:, 1])
            if cfg.has_hetero:
                # heterogeneous lanes: Woodcock tracking replaces the
                # analytic homogeneous sampler
                het2 = (med2 >= 0) & (
                    MED.fetch_row(scene.media, med2)[:, 7] > 0)
                is_h, t_h, w_h = MED.woodcock_sample(
                    scene.media, med2, o2, d2, t_for_sampling,
                    jax.random.fold_in(jax.random.fold_in(key, j), 41))
                is_med2 = jnp.where(het2, is_h, is_med2)
                t_eff = jnp.where(het2, t_h, t_eff)
                w_seg = jnp.where(het2[..., None], w_h, w_seg)
            is_med2 = is_med2 & act_c
            thr2 = thr2 * w_seg
            # emitter/env radiance only reaches lanes whose segment made it
            # to the surface (the scatter event eats the rest)
            le2 = jnp.where(is_med2[..., None], 0.0, le2)
        else:
            is_med2 = jnp.zeros(L, bool)
            med2 = med
            t_eff = t2
        hit_emitter = jnp.any(le2 > 0, axis=-1)

        if cfg.do_nee:
            n_pdf_slots = (scene.emitters.num + (1 if cfg.has_env else 0)
                           + scene.delta.num)
            em_pdf = jnp.where(
                hit_emitter & ~delta_mis,
                E.pdf_direct(scene.emitters, em2, p2, sh_n2, p_ref,
                             n_slots=n_pdf_slots),
                0.0,
            )
            if cfg.has_env:
                em_pdf = jnp.where(
                    escaped & hit_emitter & ~delta_mis,
                    EV.pdf_direct(scene.env, d2) / n_pdf_slots,
                    em_pdf,
                )
        else:
            em_pdf = jnp.zeros(L)
        # delta lanes (incl. the camera segment seen through a null chain,
        # whose carried wo_pdf is 0) always score full weight
        w_mis2 = jnp.where(delta_mis, 1.0, mi_weight(wo_pdf_mis, em_pdf))
        l_hit = thr2 * le2 * w_mis2[..., None]
        l_hit = jnp.where(act_c[..., None], l_hit, 0.0)
        slot = slot + l_hit

        # vertex record (guided_path.cpp:2093-2110)
        if cfg.record_vertices:
            v_valid = act_c & (dtree_id >= 0) & (wo_pdf > 0)
            if not cfg.learn_fraction:
                v_valid = v_valid & ~sampled_delta
            vert = dict(
                p=o2, d=d2,
                throughput=thr2,
                bsdf_val=bsdf_weight * wo_pdf[..., None],
                # an ENull vertex is created AFTER the look-through credit
                # in the reference, so it never receives the emitter energy
                # beyond the panel (its own radiance starts at 0)
                own=(jnp.zeros_like(l_hit) if cfg.nee_always else
                     jnp.where(null_trans[..., None], 0.0, l_hit)),
                wo_pdf=wo_pdf, bsdf_pdf=bsdf_pdf, dtree_pdf=dtree_pdf,
                is_delta=sampled_delta, dtree_id=dtree_id, voxel=voxel,
                valid=v_valid,
            )
        else:
            vert = None

        # -- russian roulette (guided_path.cpp:2124-2142) --------------------
        # j runs over arange(1, J+1): 1-based like rRec.depth, so RR first
        # applies at the rr_depth-th shade — same convention as regen.py's
        # depth2 and the reference's `rRec.depth++ >= m_rrDepth`
        depth = j  # rRec.depth at this iteration
        act_n = act_c & (hit2 | is_med2)
        # the reference's ENull branch `continue`s before the RR block, so
        # pass-through transitions are never roulette-terminated
        rr_on = (depth >= cfg.rr_depth) & ~null_trans
        if cfg.guiding:
            has_tree_rr = (dtree_id >= 0) & ~sampled_delta
            if cfg.is_built:
                sp_tree = jnp.full(L, 0.99)
            else:
                sp_tree = jnp.clip(jnp.max(thr2, axis=-1) * eta2 * eta2, 0.1, 0.99)
            sp = jnp.where(has_tree_rr, sp_tree, 1.0)
        else:
            # unguided baseline (path.cpp): throughput-based RR
            sp = jnp.minimum(jnp.max(thr2, axis=-1) * eta2 * eta2, 0.95)
        u_rr = draw(j, 3, (L,))
        sp_eff = jnp.where(rr_on, sp, 1.0)
        act_n = act_n & (u_rr < sp_eff)
        thr2 = thr2 / jnp.maximum(sp_eff, 1e-9)[..., None]

        new_carry = dict(
            active=act_n, o=o2, d=d2, row=row2, tri=tri2s,
            t=t_eff if cfg.has_media else t2, bu=bu2, bv=bv2,
            throughput=thr2, eta=eta2,
            med=med2, in_medium=is_med2,
            wo_pdf_real=wo_pdf_mis, delta_real=delta_mis, p_real=p_ref,
        )
        n_rays = jnp.sum(act_c.astype(jnp.int32))
        if cfg.do_nee:
            n_rays = n_rays + jnp.sum((act & smooth).astype(jnp.int32))
        out = dict(slot=slot, vert=vert, nee=nee_rec, rays=n_rays,
                   shades=jnp.sum(act.astype(jnp.int32)))
        return new_carry, out

    carry, outs = jax.lax.scan(body, carry, jnp.arange(1, J + 1))

    slots = outs["slot"]  # [J, L, 3]
    li = c0 + jnp.sum(slots, axis=0)
    n_rays = jnp.int32(L) + jnp.sum(outs["rays"])

    vertices = None
    if cfg.record_vertices:
        # vertex radiance = own + sum of later slots (exact reformulation of
        # recordRadiance over stored vertices)
        suffix = jnp.flip(jnp.cumsum(jnp.flip(slots, 0), axis=0), 0)
        later = jnp.concatenate([suffix[1:], jnp.zeros_like(suffix[:1])], 0)
        vert = outs["vert"]
        vert["radiance"] = vert["own"] + later
        del vert["own"]
        vertices = dict(bsdf=vert, nee=outs["nee"])

    # avgPathLength analog (guided_path.cpp:1010,2147-2148): vertices
    # per path = per-bounce shaded-lane count summed over the scan
    return dict(li=li, vertices=vertices, n_rays=n_rays,
                n_vertices=jnp.sum(outs["shades"]))
