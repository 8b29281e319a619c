"""Area emitter evaluation and next-event estimation (device arrays).

Semantics match the reference exactly:
  * radiance eval on hit: front side only (src/emitters/area.cpp Le)
  * NEE: uniform emitter pick (scene.cpp:828-852, uniform weights),
    area-CDF triangle pick + uniform barycentric point
    (librender/trimesh.cpp samplePosition), solid-angle conversion
    pdf *= dist^2/|cos| (librender/shape.cpp:102-116), orientation checks
    dot(d, refN) >= 0 && dot(d, n) < 0 (area.cpp sampleDirect)
  * pdfDirect for MIS (shape.cpp:117-127)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import warp
from ..core.vecmath import dot, normalize


class EmitterArrays:
    """Emitter sampling tables. Per-emitter-triangle geometry is packed
    into one [TE, 19] row (p0,e1,e2,n0,n1,n2,cdf) indexed by the LOCAL
    emitter-triangle slot — one gather per NEE sample instead of seven
    (TPU gather cost is per-op, not per-byte)."""

    FIELDS = (
        "radiance", "tri_offset", "tri_count", "inv_area",
        "etri",  # [TE, 19] packed per-emitter-triangle rows
    )

    def __init__(self, **kw):
        for f in self.FIELDS:
            setattr(self, f, kw[f])
        # num is STATIC metadata (drives slot counts at trace time); rows
        # may be padded, so it travels as pytree aux data
        self.num = kw.get("num", self.radiance.shape[0])

    @classmethod
    def from_scene(cls, sc):
        import numpy as np

        em = sc.emitters
        ids = np.asarray(em.tri_ids)
        v = sc.positions[sc.faces][ids] if len(ids) else np.zeros((0, 3, 3))
        n = sc.normals[sc.faces][ids] if len(ids) else np.zeros((0, 3, 3))
        TE = len(ids)
        etri = np.zeros((max(TE, 1), 19), np.float32)
        if TE:
            etri[:TE, 0:3] = v[:, 0]
            etri[:TE, 3:6] = v[:, 1] - v[:, 0]
            etri[:TE, 6:9] = v[:, 2] - v[:, 0]
            etri[:TE, 9:12] = n[:, 0]
            etri[:TE, 12:15] = n[:, 1]
            etri[:TE, 15:18] = n[:, 2]
            etri[:TE, 18] = np.asarray(em.tri_cdf, np.float32)
        def pad1(a, w=None):
            """Emitterless scenes keep 1 dummy row so gathers stay legal."""
            a = np.asarray(a)
            if len(a):
                return a
            return np.zeros((1,) + a.shape[1:], a.dtype)

        out = cls(
            radiance=jnp.asarray(pad1(em.radiance), jnp.float32),
            tri_offset=jnp.asarray(pad1(em.tri_offset), jnp.int32),
            tri_count=jnp.asarray(pad1(em.tri_count), jnp.int32),
            inv_area=jnp.asarray(pad1(em.inv_area), jnp.float32),
            etri=jnp.asarray(etri),
        )
        out.num = em.num
        return out


jax.tree_util.register_pytree_node(
    EmitterArrays,
    lambda e: (tuple(getattr(e, f) for f in EmitterArrays.FIELDS), e.num),
    lambda aux, ch: EmitterArrays(num=aux, **dict(zip(EmitterArrays.FIELDS, ch))),
)


def eval_radiance(em: EmitterArrays, emitter_id, sh_n, wo_world):
    """Le leaving the surface toward wo_world (= -ray.d); 0 on the back side
    or for non-emissive hits (emitter_id < 0)."""
    eid = jnp.maximum(emitter_id, 0)
    rad = em.radiance[eid]
    front = dot(sh_n, wo_world) > 0
    ok = (emitter_id >= 0) & front
    return jnp.where(ok[..., None], rad, 0.0)


def sample_direct(em: EmitterArrays, ref_p, ref_n, u2, slot=None, x1=None,
                  n_slots=None):
    """NEE direct sample toward the emitter set.

    ref_n: shading normal of the query point, or 0 for transmissive
    surfaces (records.inl:160-164). Returns a dict with d, dist, pdf
    (solid angle, including the 1/numEmitters pick), value = Le/pdf,
    and the sampled point for visibility rays.

    slot/x1/n_slots: when the scene also has an environment emitter the
    caller picks the slot among n_slots = num_area + 1 uniform choices
    (Scene::sampleEmitterDirect's uniform m_emitterPDF) and passes the
    pre-picked area emitter index + rescaled uniform here.
    """
    E = em.num
    if slot is None:
        # uniform emitter pick with sample reuse (DiscretePDF::sampleReuse)
        xe = u2[..., 0] * E
        eid = jnp.clip(xe.astype(jnp.int32), 0, E - 1)
        x1 = xe - eid  # reused uniform
    else:
        eid = jnp.clip(slot, 0, E - 1)
    n_slots = E if n_slots is None else n_slots

    # triangle pick by per-emitter area CDF with reuse of u2.y; binary
    # search over the packed cdf column (log2(TE) single-scalar gathers)
    off = em.tri_offset[eid]
    cnt = em.tri_count[eid]
    TE = em.etri.shape[0]
    u = u2[..., 1]
    lo_i = jnp.zeros_like(eid)
    hi_i = jnp.maximum(cnt - 1, 0)
    n_steps = max(1, int(np.ceil(np.log2(max(int(TE), 2)))))
    for _ in range(n_steps):
        active = lo_i < hi_i
        mid = (lo_i + hi_i) >> 1
        c = em.etri[jnp.minimum(off + mid, TE - 1), 18]
        go_hi = u > c
        lo_i = jnp.where(active & go_hi, mid + 1, lo_i)
        hi_i = jnp.where(active & ~go_hi, mid, hi_i)
    idx = jnp.clip(lo_i, 0, jnp.maximum(cnt - 1, 0))

    row = em.etri[jnp.minimum(off + idx, TE - 1)]  # one packed gather
    prev = em.etri[jnp.minimum(off + jnp.maximum(idx - 1, 0), TE - 1), 18]
    lo = jnp.where(idx > 0, prev, 0.0)
    hi = row[:, 18]
    x2 = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)

    bary = warp.square_to_uniform_triangle(jnp.stack([x1, x2], -1))
    b1, b2 = bary[..., 0], bary[..., 1]
    p = row[:, 0:3] + b1[..., None] * row[:, 3:6] + b2[..., None] * row[:, 6:9]
    n = normalize(
        row[:, 9:12] * (1 - b1 - b2)[..., None]
        + row[:, 12:15] * b1[..., None]
        + row[:, 15:18] * b2[..., None]
    )

    d = p - ref_p
    dist2 = dot(d, d)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    d = d / dist[..., None]

    dp = jnp.abs(dot(d, n))
    pdf_area = em.inv_area[eid]
    pdf_sa = jnp.where(dp != 0.0, pdf_area * dist2 / dp, 0.0) / n_slots

    ok = (dot(d, ref_n) >= 0) & (dot(d, n) < 0) & (pdf_sa > 0)
    value = jnp.where(
        ok[..., None], em.radiance[eid] / jnp.maximum(pdf_sa, 1e-30)[..., None], 0.0
    )
    return dict(d=d, dist=dist, pdf=jnp.where(ok, pdf_sa, 0.0), value=value, p=p, n=n)


def pdf_direct(em: EmitterArrays, emitter_id, hit_p, hit_n, ref_p,
               n_slots=None):
    """Solid-angle pdf of having NEE-sampled the point hit by a BSDF ray
    (pdfEmitterDirect, scene.cpp:949-961)."""
    E = em.num
    n_slots = E if n_slots is None else n_slots
    eid = jnp.maximum(emitter_id, 0)
    d = hit_p - ref_p
    dist2 = dot(d, d)
    d = d / jnp.sqrt(jnp.maximum(dist2, 1e-30))[..., None]
    dp = jnp.abs(dot(d, hit_n))
    pdf = jnp.where(dp != 0.0, em.inv_area[eid] * dist2 / dp, 0.0) / n_slots
    return jnp.where(emitter_id >= 0, pdf, 0.0)
