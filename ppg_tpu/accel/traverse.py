"""Wavefront ray traversal in JAX (closest-hit and any-hit).

The reference traverses a SAH kd-tree per ray with a per-thread stack
(mitsuba/include/mitsuba/render/skdtree.h:125-190). On TPU we walk a
BVH2 with ORDERED near-child-first descent and a per-lane bitstack
(Laine-style stackless traversal with parent/sibling links): every
wavefront step is one uniform packed row-gather, and descending into the
nearer child first tightens best_t early so far subtrees prune. An
earlier unordered hit/miss-link walk had catastrophic worst-case lanes
(tens of thousands of node visits on 1M-triangle scenes — long enough to
trip the TPU watchdog); ordered descent bounds the walk to ~2x the
touched-node count.

TPU-first data layout rules applied here:
  * All per-lane math is SoA: separate [L] component arrays, never
    [L, 3]/[L, T, 3] intermediates (a trailing dim of 3 pads to 128
    lanes, a 42x memory-bandwidth tax, and the [L,T,3] broadcasts
    additionally blow up XLA compile time by minutes).
  * ONE row array [N, 16] holds everything (TPU gather cost is per-op,
    not per-byte): an internal row is both children's AABBs + child /
    parent / sibling links, so a single gather per step serves the slab
    tests AND the stackless pop; a leaf row is one woop-style triangle
    (p0, e1, e2) + its packed index — leaves are single-triangle by
    construction (accel/native builder, max_leaf=1).
  * Per-lane state is scalar lanes only: node id, level, up-phase flag,
    leaf flag, and a 64-bit trail held as two u32 words (JAX x64 is off).

A brute-force path handles small scenes (scan over triangles with scalar
broadcasts — zero gathers) and doubles as the testing referee, mirroring
the reference's kd-tree-vs-brute-force tests (mitsuba/src/tests/test_kd.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.bvh import build_bvh

INF = jnp.float32(3.4e38)
EPS_T = 1e-4  # matches the role of Mitsuba's Epsilon for ray offsets
BRUTE_MAX = 1024  # below this many tris, gather-free brute force wins


LEAF_BIT = np.int32(1 << 30)
IDX_MASK = np.int32((1 << 30) - 1)


class GeometryArrays:
    """Device-side packed triangle + BVH arrays (pytree).

    tri   [T,12] f32 : p0(3), e1(3), e2(3), pad(3) — BVH leaf order
                       (brute-force path + testing referee)
    rows  [N,16] f32 : internal — Lmin(3) Lmax(3) Rmin(3) Rmax(3),
                       bitcast(left_info) bitcast(right_info)
                       bitcast(parent) bitcast(sibling_info);
                       leaf — p0(3) e1(3) e2(3) bitcast(tri_idx) pad(2)
                       bitcast(parent) bitcast(sibling_info).
                       info ints carry LEAF_BIT at bit 30.
    perm  [T]    i32 : packed row -> original face index
    """

    def __init__(self, tri, rows, perm):
        self.tri = tri
        self.rows = rows
        self.perm = perm

    def tree_flatten(self):
        return (self.tri, self.rows, self.perm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_tris(self):
        return self.tri.shape[0]


jax.tree_util.register_pytree_node(
    GeometryArrays,
    lambda g: g.tree_flatten(),
    GeometryArrays.tree_unflatten,
)


def build_geometry(positions, faces) -> GeometryArrays:
    bvh = build_bvh(positions, faces, max_leaf=1)
    perm = bvh["prim_ids"]
    if len(perm) == 0:
        perm = np.zeros(0, np.int64)
    v = positions[faces].astype(np.float64)[perm]
    T = len(perm)
    tri = np.zeros((max(T, 1), 12), np.float32)
    if T:
        tri[:T, 0:3] = v[:, 0]
        tri[:T, 3:6] = v[:, 1] - v[:, 0]
        tri[:T, 6:9] = v[:, 2] - v[:, 0]

    rows = _ordered_rows(bvh, tri)
    return GeometryArrays(
        jnp.asarray(tri),
        jnp.asarray(rows),
        jnp.asarray(perm.astype(np.int32)),
    )


def _ordered_rows(bvh, tri):
    """Convert the builder's DFS/miss-link arrays to the ordered-traversal
    row layout. In DFS pre-order, left(i) = i+1 and — because the left
    subtree's miss link targets its right sibling — right(i) = miss[i+1]."""
    is_leaf = np.asarray(bvh["is_leaf"], bool)
    N = len(is_leaf)
    node_min = np.asarray(bvh["node_min"], np.float32)
    node_max = np.asarray(bvh["node_max"], np.float32)
    miss = np.asarray(bvh["miss"], np.int64)
    leaf_off = np.asarray(bvh["leaf_off"], np.int64)

    internal = np.where(~is_leaf)[0]
    left = internal + 1
    right = miss[np.minimum(left, N - 1)]

    parent = np.full(N, -1, np.int32)
    sibling = np.zeros(N, np.int64)
    parent[left] = internal
    parent[right] = internal
    sibling[left] = right
    sibling[right] = left

    info = np.where(is_leaf, LEAF_BIT.astype(np.int64), 0) + np.arange(N)
    info = info.astype(np.int32)

    rows = np.zeros((N, 16), np.float32)
    # internal rows: both children's boxes + links
    rows[internal, 0:3] = node_min[left]
    rows[internal, 3:6] = node_max[left]
    rows[internal, 6:9] = node_min[right]
    rows[internal, 9:12] = node_max[right]
    rows[internal, 12] = info[left].view(np.float32)
    rows[internal, 13] = info[right].view(np.float32)
    # leaf rows: the single woop triangle + its packed index
    li = np.where(is_leaf)[0]
    rows[li, 0:9] = tri[leaf_off[li], 0:9]
    rows[li, 9] = leaf_off[li].astype(np.int32).view(np.float32)
    rows[:, 14] = parent.view(np.float32)
    rows[:, 15] = info[sibling].view(np.float32)
    return rows


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _components(a3):
    """[L,3] -> three [L] arrays (one-time strided slice at the boundary)."""
    return a3[:, 0], a3[:, 1], a3[:, 2]


def brute_force_closest(geom: GeometryArrays, o, d, t_min, t_max):
    """Scan over triangles with scalar broadcasts; zero gathers. Returns
    (tri_idx in packed order, t, u, v)."""
    ox, oy, oz = _components(o)
    dx, dy, dz = _components(d)
    L = o.shape[0]

    def step(state, row):
        best_t, best_i, best_u, best_v, k = state
        p0x, p0y, p0z = row[0], row[1], row[2]
        e1x, e1y, e1z = row[3], row[4], row[5]
        e2x, e2y, e2z = row[6], row[7], row[8]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
        tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        hit = (
            (inv != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min) & (t < jnp.minimum(best_t, t_max))
        )
        best_i = jnp.where(hit, k, best_i)
        best_u = jnp.where(hit, u, best_u)
        best_v = jnp.where(hit, v, best_v)
        best_t = jnp.where(hit, t, best_t)
        return (best_t, best_i, best_u, best_v, k + 1), None

    init = (
        jnp.full(L, INF),
        jnp.full(L, -1, jnp.int32),
        jnp.zeros(L),
        jnp.zeros(L),
        jnp.int32(0),
    )
    (best_t, best_i, best_u, best_v, _), _ = jax.lax.scan(
        step, init, geom.tri[:, :9]
    )
    valid = best_i >= 0
    return best_i, jnp.where(valid, best_t, INF), best_u, best_v


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e-20, -1e-20), d)


MAX_STEPS = 32768  # watchdog guard; ordered walks are ~100 steps


def bvh_closest(geom: GeometryArrays, o, d, t_min, t_max, stop_on_hit=False):
    """Ordered stackless BVH closest hit for a wavefront of rays [L,3].

    Every iteration is ONE packed row-gather per lane plus uniform vector
    math. A lane is in one of three phases:
      down  — at an internal node: slab-test both children from the one
              row, descend into the nearer hit child first, record a
              pending-sibling bit in the 64-bit trail when both hit;
      leaf  — intersect the row's single woop triangle, tighten best_t,
              then pop;
      up    — stackless pop: if the trail bit at the current level is
              set, jump to the sibling (link in the row) and clear it,
              else step to the parent.
    With stop_on_hit (shadow rays), lanes park at the first hit."""
    L = o.shape[0]
    N = geom.rows.shape[0]
    ox, oy, oz = _components(o)
    dx, dy, dz = _components(d)
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    u32 = lambda x: x.astype(jnp.uint32)

    def cond(state):
        return jnp.any(state["cur"] >= 0) & (state["it"] < MAX_STEPS)

    def body(state):
        cur = state["cur"]
        leaf, up, lvl = state["leaf"], state["up"], state["lvl"]
        tlo, thi = state["tlo"], state["thi"]
        best_t, best_i = state["best_t"], state["best_i"]
        best_u, best_v = state["best_u"], state["best_v"]

        active = cur >= 0
        row = geom.rows[jnp.maximum(cur, 0)]  # [L,16] single gather
        parent = _i32(row[:, 14])
        sib = _i32(row[:, 15])
        limit = jnp.minimum(best_t, t_max)

        # --- leaf phase: woop triangle from the row ------------------------
        p0x, p0y, p0z = row[:, 0], row[:, 1], row[:, 2]
        e1x, e1y, e1z = row[:, 3], row[:, 4], row[:, 5]
        e2x, e2y, e2z = row[:, 6], row[:, 7], row[:, 8]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
        tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = (dx * qvx + dy * qvy + dz * qvz) * inv
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        take = (
            active & leaf & ~up
            & (inv != 0.0) & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > t_min) & (tt < limit)
        )
        best_i = jnp.where(take, _i32(row[:, 9]), best_i)
        best_u = jnp.where(take, uu, best_u)
        best_v = jnp.where(take, vv, best_v)
        best_t = jnp.where(take, tt, best_t)
        limit = jnp.minimum(best_t, t_max)

        # --- down phase: slab-test both children from the same row --------
        # left box at cols 0-5; right box at cols 6-11
        tl0x = (row[:, 0] - ox) * ix
        tl1x = (row[:, 3] - ox) * ix
        tl0y = (row[:, 1] - oy) * iy
        tl1y = (row[:, 4] - oy) * iy
        tl0z = (row[:, 2] - oz) * iz
        tl1z = (row[:, 5] - oz) * iz
        tnL = jnp.maximum(
            jnp.maximum(jnp.minimum(tl0x, tl1x), jnp.minimum(tl0y, tl1y)),
            jnp.minimum(tl0z, tl1z),
        )
        tfL = jnp.minimum(
            jnp.minimum(jnp.maximum(tl0x, tl1x), jnp.maximum(tl0y, tl1y)),
            jnp.maximum(tl0z, tl1z),
        )
        hitL = (tnL <= tfL) & (tfL >= t_min) & (tnL <= limit)
        tr0x = (row[:, 6] - ox) * ix
        tr1x = (row[:, 9] - ox) * ix
        tr0y = (row[:, 7] - oy) * iy
        tr1y = (row[:, 10] - oy) * iy
        tr0z = (row[:, 8] - oz) * iz
        tr1z = (row[:, 11] - oz) * iz
        tnR = jnp.maximum(
            jnp.maximum(jnp.minimum(tr0x, tr1x), jnp.minimum(tr0y, tr1y)),
            jnp.minimum(tr0z, tr1z),
        )
        tfR = jnp.minimum(
            jnp.minimum(jnp.maximum(tr0x, tr1x), jnp.maximum(tr0y, tr1y)),
            jnp.maximum(tr0z, tr1z),
        )
        hitR = (tnR <= tfR) & (tfR >= t_min) & (tnR <= limit)

        li = _i32(row[:, 12])
        ri = _i32(row[:, 13])
        both = hitL & hitR
        near_l = tnL <= tnR
        chosen = jnp.where(
            both, jnp.where(near_l, li, ri), jnp.where(hitL, li, ri)
        )
        descend = active & ~leaf & ~up & (hitL | hitR)
        if stop_on_hit:
            descend = descend & (best_i < 0)

        # --- transitions ----------------------------------------------------
        need_pop = active & ~descend  # leaf just intersected, or no child hit, or up-phase
        # trail bit at the current level
        lo_sel = lvl < 32
        sh_lo = u32(jnp.clip(lvl, 0, 31))
        sh_hi = u32(jnp.clip(lvl - 32, 0, 31))
        bit = jnp.where(
            lo_sel, (state["tlo"] >> sh_lo) & 1, (state["thi"] >> sh_hi) & 1
        ) == 1
        pop_sib = need_pop & bit
        pop_up = need_pop & ~bit & (lvl > 0)
        pop_done = need_pop & ~bit & (lvl == 0)
        if stop_on_hit:
            pop_done = pop_done | (active & (best_i >= 0))
            pop_sib = pop_sib & (best_i < 0)
            pop_up = pop_up & (best_i < 0)

        # descend: level+1, write trail bit (value = both) at the new level
        nlvl = lvl + 1
        d_lo_sel = nlvl < 32
        d_sh_lo = u32(jnp.clip(nlvl, 0, 31))
        d_sh_hi = u32(jnp.clip(nlvl - 32, 0, 31))
        one = jnp.uint32(1)
        set_lo = jnp.where(
            d_lo_sel & both, tlo | (one << d_sh_lo),
            jnp.where(d_lo_sel, tlo & ~(one << d_sh_lo), tlo))
        set_hi = jnp.where(
            ~d_lo_sel & both, thi | (one << d_sh_hi),
            jnp.where(~d_lo_sel, thi & ~(one << d_sh_hi), thi))
        # pop to sibling: clear the bit at the current level
        clr_lo = jnp.where(lo_sel, tlo & ~(one << sh_lo), tlo)
        clr_hi = jnp.where(~lo_sel, thi & ~(one << sh_hi), thi)

        new_tlo = jnp.where(descend, set_lo, jnp.where(pop_sib, clr_lo, tlo))
        new_thi = jnp.where(descend, set_hi, jnp.where(pop_sib, clr_hi, thi))
        new_cur = jnp.where(
            descend, chosen & IDX_MASK,
            jnp.where(pop_sib, sib & IDX_MASK,
                      jnp.where(pop_up, parent,
                                jnp.where(pop_done, -1, cur))))
        new_leaf = jnp.where(
            descend, (chosen & LEAF_BIT) != 0,
            jnp.where(pop_sib, (sib & LEAF_BIT) != 0,
                      jnp.where(pop_up | pop_done, False, leaf)))
        new_up = jnp.where(descend | pop_sib, False,
                           jnp.where(pop_up, True, up))
        new_lvl = jnp.where(descend, nlvl, jnp.where(pop_up, lvl - 1, lvl))

        return dict(
            cur=new_cur, leaf=new_leaf, up=new_up, lvl=new_lvl,
            tlo=new_tlo, thi=new_thi,
            best_t=best_t, best_i=best_i, best_u=best_u, best_v=best_v,
            it=state["it"] + 1,
        )

    root_leaf = bool(N == 1)
    state = dict(
        cur=jnp.zeros(L, jnp.int32),
        leaf=jnp.full(L, root_leaf),
        up=jnp.zeros(L, bool),
        lvl=jnp.zeros(L, jnp.int32),
        tlo=jnp.zeros(L, jnp.uint32),
        thi=jnp.zeros(L, jnp.uint32),
        best_t=jnp.full(L, INF),
        best_i=jnp.full(L, -1, jnp.int32),
        best_u=jnp.zeros(L),
        best_v=jnp.zeros(L),
        it=jnp.int32(0),
    )
    # dead lanes (t_max <= t_min) park immediately
    state["cur"] = jnp.where(t_max <= t_min, -1, state["cur"])
    out = jax.lax.while_loop(cond, body, state)
    return out["best_i"], out["best_t"], out["best_u"], out["best_v"]


def closest_hit(geom: GeometryArrays, o, d, t_min, t_max, force_bvh=False):
    """Dispatch: brute force for small scenes, threaded BVH otherwise.
    Returns (packed tri index or -1, t, u, v)."""
    if geom.num_tris <= BRUTE_MAX and not force_bvh:
        return brute_force_closest(geom, o, d, t_min, t_max)
    return bvh_closest(geom, o, d, t_min, t_max)


def any_hit(geom: GeometryArrays, o, d, t_min, t_max):
    """Occlusion test (shadow rays). Returns bool [L]."""
    if geom.num_tris <= BRUTE_MAX:
        idx, _, _, _ = brute_force_closest(geom, o, d, t_min, t_max)
        return idx >= 0
    idx, _, _, _ = bvh_closest(geom, o, d, t_min, t_max, stop_on_hit=True)
    return idx >= 0
