"""Wavefront ray traversal in JAX (closest-hit and any-hit).

The reference traverses a SAH kd-tree per ray with a per-thread stack
(mitsuba/include/mitsuba/render/skdtree.h:125-190). On TPU we instead walk
a threaded BVH (accel.bvh): every lane keeps a single node index and
follows hit(=i+1)/miss links, so the whole wavefront advances in lockstep
vectorized gathers — no stack, no pointer chasing.

TPU-first data layout rules applied here:
  * All per-lane math is SoA: separate [L] component arrays, never
    [L, 3]/[L, T, 3] intermediates (a trailing dim of 3 pads to 128
    lanes, a 42x memory-bandwidth tax, and the [L,T,3] broadcasts
    additionally blow up XLA compile time by minutes).
  * Per-node and per-triangle records are PACKED single rows
    (node [N,8]: min,max,bitcast(miss),bitcast(off<<3|cnt); triangle
    [T,12]: p0,e1,e2) because TPU gather cost is per-op, not per-byte —
    one row-gather replaces 6-22 scalar gathers per traversal step.
  * Triangles are stored permuted into BVH-leaf order, so leaves index
    them contiguously with no prim_ids indirection; `perm` maps packed
    row -> original face index for the host.

A brute-force path handles small scenes (scan over triangles with scalar
broadcasts — zero gathers) and doubles as the testing referee, mirroring
the reference's kd-tree-vs-brute-force tests (mitsuba/src/tests/test_kd.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.bvh import MAX_LEAF, build_bvh

INF = jnp.float32(3.4e38)
EPS_T = 1e-4  # matches the role of Mitsuba's Epsilon for ray offsets
BRUTE_MAX = 1024  # below this many tris, gather-free brute force wins


class GeometryArrays:
    """Device-side packed triangle + BVH arrays (pytree).

    tri   [T,12] f32 : p0(3), e1(3), e2(3), pad(3) — BVH leaf order
    nodes [N,8]  f32 : min(3), max(3), bitcast(miss), bitcast(off<<3|cnt)
                       cnt > 0 marks a leaf; off indexes `tri` directly
    perm  [T]    i32 : packed row -> original face index
    """

    def __init__(self, tri, nodes, perm):
        self.tri = tri
        self.nodes = nodes
        self.perm = perm

    def tree_flatten(self):
        return (self.tri, self.nodes, self.perm), None

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
    bvh = build_bvh(positions, faces)
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

    N = len(bvh["miss"])
    nodes = np.zeros((N, 8), np.float32)
    nodes[:, 0:3] = bvh["node_min"]
    nodes[:, 3:6] = bvh["node_max"]
    nodes[:, 6] = bvh["miss"].astype(np.int32).view(np.float32)
    # leaves: off now indexes the permuted tri array at the same offset
    meta = np.where(
        bvh["is_leaf"],
        (bvh["leaf_off"].astype(np.int32) << 3) | bvh["leaf_cnt"].astype(np.int32),
        0,
    ).astype(np.int32)
    nodes[:, 7] = meta.view(np.float32)

    return GeometryArrays(
        jnp.asarray(tri),
        jnp.asarray(nodes),
        jnp.asarray(perm.astype(np.int32)),
    )


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


def bvh_closest(geom: GeometryArrays, o, d, t_min, t_max, stop_on_hit=False):
    """Threaded-BVH closest hit for a wavefront of rays [L,3].

    One packed node-row gather per step; leaf triangles are contiguous
    packed rows (MAX_LEAF unrolled gathers, masked). With stop_on_hit,
    lanes park as soon as any intersection is found (shadow rays)."""
    L = o.shape[0]
    N = geom.nodes.shape[0]
    ox, oy, oz = _components(o)
    dx, dy, dz = _components(d)
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

    def cond(state):
        return jnp.any(state[0] < N)

    def body(state):
        node, best_t, best_i, best_u, best_v = state
        nid = jnp.minimum(node, N - 1)
        row = geom.nodes[nid]  # [L,8] single gather
        t0x = (row[:, 0] - ox) * ix
        t1x = (row[:, 3] - ox) * ix
        t0y = (row[:, 1] - oy) * iy
        t1y = (row[:, 4] - oy) * iy
        t0z = (row[:, 2] - oz) * iz
        t1z = (row[:, 5] - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        box_hit = (tn <= tf) & (tf >= t_min) & (tn <= jnp.minimum(best_t, t_max))

        miss = _i32(row[:, 6])
        meta = _i32(row[:, 7])
        cnt = meta & 7
        off = meta >> 3
        leaf = cnt > 0
        active = node < N

        do_leaf = leaf & box_hit & active
        for k in range(MAX_LEAF):
            rid = jnp.minimum(off + k, geom.tri.shape[0] - 1)
            trow = geom.tri[rid]  # [L,12] single gather
            p0x, p0y, p0z = trow[:, 0], trow[:, 1], trow[:, 2]
            e1x, e1y, e1z = trow[:, 3], trow[:, 4], trow[:, 5]
            e2x, e2y, e2z = trow[:, 6], trow[:, 7], trow[:, 8]
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
            take = (
                do_leaf & (k < cnt)
                & (inv != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > t_min) & (t < jnp.minimum(best_t, t_max))
            )
            best_i = jnp.where(take, off + k, best_i)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)
            best_t = jnp.where(take, t, best_t)

        go_hit = box_hit & ~leaf & active
        nxt = jnp.where(go_hit, node + 1, miss)
        nxt = jnp.where(active, nxt, N)
        if stop_on_hit:
            nxt = jnp.where(best_i >= 0, N, nxt)
        return nxt, best_t, best_i, best_u, best_v

    state = (
        jnp.zeros(L, jnp.int32),
        jnp.full(L, INF),
        jnp.full(L, -1, jnp.int32),
        jnp.zeros(L),
        jnp.zeros(L),
    )
    node, best_t, best_i, best_u, best_v = jax.lax.while_loop(cond, body, state)
    return best_i, best_t, best_u, best_v


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
