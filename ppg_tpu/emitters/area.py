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
    FIELDS = (
        "radiance", "tri_offset", "tri_count", "tri_ids", "tri_cdf", "inv_area",
        # per-triangle sampling geometry (gathered from scene by tri id)
        "tp0", "te1", "te2", "tn0", "tn1", "tn2",
    )

    def __init__(self, **kw):
        for f in self.FIELDS:
            setattr(self, f, kw[f])
        self.num = self.radiance.shape[0]

    @classmethod
    def from_scene(cls, sc):
        em = sc.emitters
        v = sc.positions[sc.faces]
        n = sc.normals[sc.faces]
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            radiance=f32(em.radiance),
            tri_offset=jnp.asarray(em.tri_offset),
            tri_count=jnp.asarray(em.tri_count),
            tri_ids=jnp.asarray(em.tri_ids),
            tri_cdf=f32(em.tri_cdf),
            inv_area=f32(em.inv_area),
            tp0=f32(v[:, 0]), te1=f32(v[:, 1] - v[:, 0]), te2=f32(v[:, 2] - v[:, 0]),
            tn0=f32(n[:, 0]), tn1=f32(n[:, 1]), tn2=f32(n[:, 2]),
        )


jax.tree_util.register_pytree_node(
    EmitterArrays,
    lambda e: (tuple(getattr(e, f) for f in EmitterArrays.FIELDS), None),
    lambda aux, ch: EmitterArrays(**dict(zip(EmitterArrays.FIELDS, ch))),
)


def eval_radiance(em: EmitterArrays, emitter_id, sh_n, wo_world):
    """Le leaving the surface toward wo_world (= -ray.d); 0 on the back side
    or for non-emissive hits (emitter_id < 0)."""
    eid = jnp.maximum(emitter_id, 0)
    rad = em.radiance[eid]
    front = dot(sh_n, wo_world) > 0
    ok = (emitter_id >= 0) & front
    return jnp.where(ok[..., None], rad, 0.0)


def sample_direct(em: EmitterArrays, ref_p, ref_n, u2):
    """NEE direct sample toward the emitter set.

    ref_n: shading normal of the query point, or 0 for transmissive
    surfaces (records.inl:160-164). Returns a dict with d, dist, pdf
    (solid angle, including the 1/numEmitters pick), value = Le/pdf,
    and the sampled point for visibility rays.
    """
    E = em.num
    # uniform emitter pick with sample reuse (DiscretePDF::sampleReuse)
    xe = u2[..., 0] * E
    eid = jnp.clip(xe.astype(jnp.int32), 0, E - 1)
    x1 = xe - eid  # reused uniform

    # triangle pick by per-emitter area CDF with reuse of u2.y
    off = em.tri_offset[eid]
    cnt = em.tri_count[eid]
    maxc = int(em.tri_count.max()) if em.tri_count.shape[0] else 1
    u = u2[..., 1]
    # binary-search-free: linear scan bounded by max triangle count per emitter
    # (bundled scenes: emitters are 2-triangle quads)
    idx = jnp.zeros_like(eid)
    prev_cdf = jnp.zeros_like(u)
    found = jnp.zeros_like(eid, dtype=bool)
    for k in range(maxc):
        c = em.tri_cdf[jnp.minimum(off + k, em.tri_cdf.shape[0] - 1)]
        take = (~found) & (u <= c) & (k < cnt)
        idx = jnp.where(take, k, idx)
        found = found | take
        prev_cdf = jnp.where(found, prev_cdf, c)
    idx = jnp.where(found, idx, cnt - 1)
    lo = jnp.where(idx > 0, em.tri_cdf[jnp.minimum(off + idx - 1, em.tri_cdf.shape[0] - 1)], 0.0)
    hi = em.tri_cdf[jnp.minimum(off + idx, em.tri_cdf.shape[0] - 1)]
    x2 = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)

    tri = em.tri_ids[jnp.minimum(off + idx, em.tri_ids.shape[0] - 1)]
    bary = warp.square_to_uniform_triangle(jnp.stack([x1, x2], -1))
    b1, b2 = bary[..., 0], bary[..., 1]
    p = em.tp0[tri] + b1[..., None] * em.te1[tri] + b2[..., None] * em.te2[tri]
    n = normalize(
        em.tn0[tri] * (1 - b1 - b2)[..., None]
        + em.tn1[tri] * b1[..., None]
        + em.tn2[tri] * b2[..., None]
    )

    d = p - ref_p
    dist2 = dot(d, d)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    d = d / dist[..., None]

    dp = jnp.abs(dot(d, n))
    pdf_area = em.inv_area[eid]
    pdf_sa = jnp.where(dp != 0.0, pdf_area * dist2 / dp, 0.0) / E

    ok = (dot(d, ref_n) >= 0) & (dot(d, n) < 0) & (pdf_sa > 0)
    value = jnp.where(
        ok[..., None], em.radiance[eid] / jnp.maximum(pdf_sa, 1e-30)[..., None], 0.0
    )
    return dict(d=d, dist=dist, pdf=jnp.where(ok, pdf_sa, 0.0), value=value, p=p, n=n)


def pdf_direct(em: EmitterArrays, emitter_id, hit_p, hit_n, ref_p):
    """Solid-angle pdf of having NEE-sampled the point hit by a BSDF ray
    (pdfEmitterDirect, scene.cpp:949-961)."""
    E = em.num
    eid = jnp.maximum(emitter_id, 0)
    d = hit_p - ref_p
    dist2 = dot(d, d)
    d = d / jnp.sqrt(jnp.maximum(dist2, 1e-30))[..., None]
    dp = jnp.abs(dot(d, hit_n))
    pdf = jnp.where(dp != 0.0, em.inv_area[eid] * dist2 / dp, 0.0) / E
    return jnp.where(emitter_id >= 0, pdf, 0.0)
