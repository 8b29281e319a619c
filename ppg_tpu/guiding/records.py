"""Vertex records -> DTreeRecords (Vertex::commit, guided_path.cpp:1730-1768).

Converts the stacked per-bounce training vertices produced by the wavefront
tracer into flat splat batches: localRadiance = radiance/throughput with the
Epsilon guard per channel (:1736-1738), product = localRadiance*bsdfVal,
scalar records are channel means (:1741).
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-4  # Mitsuba's Epsilon used in the throughput guard


def _flatten(tree):
    out = {}
    for k, v in tree.items():
        out[k] = v.reshape((-1,) + v.shape[2:])
    return out


# splat-target fields the tracer may have precomputed at shade time
# (regen.shade_hit); their presence switches splat_records to its
# descent-free fast path. Legacy fields (p/d/voxel/dtree_id) ride along
# when present so the spatial box filter keeps working.
_PASSTHRU = ("sp_id", "cell", "cell4", "w4", "p", "d", "voxel")


def vertex_records(vert, stat_weight):
    """vert: stacked dict [J, L, ...] from trace_paths; returns flat rec dict
    for guiding.sdtree.splat_records."""
    v = _flatten(vert)
    thr = v["throughput"]
    wo_pdf = v["wo_pdf"]
    rad = v["radiance"]
    bsdf_val = v["bsdf_val"]

    finite = (
        jnp.all(jnp.isfinite(rad), -1)
        & jnp.all(rad >= 0, -1)
        & jnp.all(jnp.isfinite(bsdf_val), -1)
        & jnp.all(bsdf_val >= 0, -1)
    )
    valid = v["valid"] & (wo_pdf > 0) & finite

    guard = thr * wo_pdf[..., None] > EPSILON
    local = jnp.where(guard, rad / jnp.maximum(thr, 1e-38), 0.0)
    product = jnp.mean(local * bsdf_val, axis=-1)
    radiance = jnp.mean(local, axis=-1)

    n = radiance.shape[0]
    rec = dict(
        radiance=radiance,
        product=product,
        wo_pdf=wo_pdf,
        bsdf_pdf=v["bsdf_pdf"],
        dtree_pdf=v["dtree_pdf"],
        stat_weight=jnp.full(n, stat_weight, jnp.float32),
        is_delta=v["is_delta"],
        valid=valid,
    )
    for k in _PASSTHRU:
        if k in v:
            rec[k] = v[k]
    return rec


def nee_records(nee):
    """NEE pseudo-vertices, committed with statistical weight 0.5
    (guided_path.cpp:2001-2015)."""
    v = _flatten(nee)
    thr = v["throughput"]
    wo_pdf = v["wo_pdf"]
    rad = v["radiance"]
    bsdf_val = v["bsdf_val"]

    finite = jnp.all(jnp.isfinite(rad), -1) & jnp.all(rad >= 0, -1)
    valid = v["valid"] & (wo_pdf > 0) & finite

    guard = thr * wo_pdf[..., None] > EPSILON
    local = jnp.where(guard, rad / jnp.maximum(thr, 1e-38), 0.0)
    product = jnp.mean(local * bsdf_val, axis=-1)
    radiance = jnp.mean(local, axis=-1)

    n = radiance.shape[0]
    rec = dict(
        radiance=radiance,
        product=product,
        wo_pdf=wo_pdf,
        bsdf_pdf=v["bsdf_pdf"],
        dtree_pdf=v["dtree_pdf"],
        stat_weight=jnp.full(n, 0.5, jnp.float32),
        is_delta=jnp.zeros(n, bool),
        valid=valid,
    )
    for k in _PASSTHRU:
        if k in v:
            rec[k] = v[k]
    return rec
