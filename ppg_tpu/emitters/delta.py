"""Delta emitters: point / spot / directional (+ sunsky's directional-sun
mode), the reference's src/emitters/{point,spot,directional}.cpp.

Delta emitters are sampled only by NEE (discrete measure: no MIS power
heuristic, EMeasure::EDiscrete — scene.cpp's sampleEmitterDirect path)
and can never be hit by BSDF rays.

Rows are packed [D, 12]: type(i32 bitcast) px py pz dx dy dz
I_r I_g I_b cos_cutoff inv_transition — one gather per NEE sample.
Spot falloff follows spot.cpp falloffCurve: 1 inside the beam width,
linear in angle between beamWidth and cutoffAngle, 0 outside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vecmath import dot

TYPE_POINT = 0
TYPE_SPOT = 1
TYPE_DIRECTIONAL = 2


class DeltaEmitterArrays:
    FIELDS = ("rows", "bs_radius")

    def __init__(self, rows, bs_radius):
        self.rows = rows
        self.bs_radius = bs_radius
        self.num = int(rows.shape[0]) if rows.shape[0] > 1 or \
            float(np.asarray(rows).sum()) != 0 else rows.shape[0]

    @classmethod
    def from_table(cls, table, aabb_min, aabb_max):
        """table: list of dicts(type, position, direction, intensity,
        cutoff_deg, beamwidth_deg)."""
        D = len(table)
        rows = np.zeros((max(D, 1), 12), np.float32)
        for i, t in enumerate(table):
            rows[i, 0] = np.int32(t["type"]).view(np.float32)
            rows[i, 1:4] = t.get("position", (0, 0, 0))
            d = np.asarray(t.get("direction", (0, 0, 1)), np.float64)
            n = np.linalg.norm(d)
            rows[i, 4:7] = d / (n if n > 0 else 1.0)
            rows[i, 7:10] = t.get("intensity", (1, 1, 1))
            cut = np.deg2rad(float(t.get("cutoff_deg", 20.0)))
            beam = np.deg2rad(float(t.get("beamwidth_deg",
                                          np.rad2deg(cut) * 3.0 / 4.0)))
            rows[i, 10] = np.cos(cut)
            rows[i, 11] = 1.0 / max(np.cos(beam) - np.cos(cut), 1e-9)
        center = (np.asarray(aabb_min) + np.asarray(aabb_max)) * 0.5
        radius = float(np.linalg.norm(np.asarray(aabb_max) - center)) * 1.5
        out = cls(jnp.asarray(rows), jnp.float32(max(radius, 1e-4)))
        out.num = D
        return out

    @classmethod
    def empty(cls):
        out = cls(jnp.zeros((1, 12), jnp.float32), jnp.float32(1.0))
        out.num = 0
        return out


jax.tree_util.register_pytree_node(
    DeltaEmitterArrays,
    lambda e: ((e.rows, e.bs_radius), e.num),
    lambda num, ch: _unflatten(num, ch),
)


def _unflatten(num, ch):
    out = DeltaEmitterArrays.__new__(DeltaEmitterArrays)
    out.rows = ch[0]
    out.bs_radius = ch[1]
    out.num = num
    return out


def sample_direct(em: DeltaEmitterArrays, slot, ref_p):
    """NEE sample of delta emitter `slot` (lane-varying). Returns
    dict(d, dist, pdf=1 discrete, value = radiance-equivalent /pdf).
    The caller divides pdf by the emitter-slot count; MIS weight for
    discrete-measure samples must be 1."""
    row = em.rows[jnp.clip(slot, 0, em.rows.shape[0] - 1)]
    etype = jax.lax.bitcast_convert_type(row[:, 0], jnp.int32)
    p_e = row[:, 1:4]
    e_dir = row[:, 4:7]
    inten = row[:, 7:10]

    to_l = p_e - ref_p
    dist2 = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-30)
    dist_pt = jnp.sqrt(dist2)
    d_pt = to_l / dist_pt[..., None]
    val_pt = inten / dist2[..., None]

    # spot falloff (spot.cpp:falloffCurve; local -dir angle to emitter axis)
    cos_ang = dot(-d_pt, e_dir)
    cos_cut = row[:, 10]
    inv_tr = row[:, 11]
    fall = jnp.clip((cos_ang - cos_cut) * inv_tr, 0.0, 1.0)
    val_spot = val_pt * jnp.where(cos_ang > cos_cut, fall, 0.0)[..., None]

    d_dir = -e_dir
    dist_dir = jnp.broadcast_to(2.0 * em.bs_radius, dist_pt.shape)
    val_dir = inten  # irradiance per unit area facing the light

    is_spot = etype == TYPE_SPOT
    is_dir = etype == TYPE_DIRECTIONAL
    d = jnp.where(is_dir[..., None], d_dir, d_pt)
    dist = jnp.where(is_dir, dist_dir, dist_pt)
    value = jnp.where(
        is_dir[..., None], val_dir,
        jnp.where(is_spot[..., None], val_spot, val_pt))
    ok = jnp.any(value > 0, -1)
    return dict(d=d, dist=dist, pdf=jnp.where(ok, 1.0, 0.0), value=value,
                discrete=jnp.ones_like(dist, bool))
