"""Wavefront ray traversal in JAX (closest-hit and any-hit).

The reference traverses a SAH kd-tree per ray with a per-thread stack
(mitsuba/include/mitsuba/render/skdtree.h:125-190). On TPU we instead walk
a threaded BVH (accel.bvh): every lane keeps a single node index and
follows hit(=i+1)/miss links, so the whole wavefront advances in lockstep
vectorized gathers — no stack, no pointer chasing. Triangle tests are
Moller-Trumbore over gathered leaf ranges (leaf size <= 4, unrolled).

A brute-force path handles tiny scenes (fewer triangles than BVH overhead
pays for) and doubles as the testing referee, mirroring the reference's
kd-tree-vs-brute-force tests (mitsuba/src/tests/test_kd.cpp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.bvh import MAX_LEAF, build_bvh

INF = jnp.float32(3.4e38)
EPS_T = 1e-4  # matches the role of Mitsuba's Epsilon for ray offsets


class GeometryArrays:
    """Device-side triangle + BVH arrays (pytree)."""

    def __init__(self, p0, e1, e2, node_min, node_max, is_leaf, leaf_off, leaf_cnt, miss, prim_ids):
        self.p0, self.e1, self.e2 = p0, e1, e2
        self.node_min, self.node_max = node_min, node_max
        self.is_leaf = is_leaf
        self.leaf_off, self.leaf_cnt = leaf_off, leaf_cnt
        self.miss = miss
        self.prim_ids = prim_ids

    def tree_flatten(self):
        return (
            (self.p0, self.e1, self.e2, self.node_min, self.node_max,
             self.is_leaf, self.leaf_off, self.leaf_cnt, self.miss, self.prim_ids),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_tris(self):
        return self.p0.shape[0]


jax.tree_util.register_pytree_node(
    GeometryArrays,
    lambda g: g.tree_flatten(),
    GeometryArrays.tree_unflatten,
)


def build_geometry(positions, faces) -> GeometryArrays:
    v = positions[faces].astype(np.float64)
    p0 = v[:, 0]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    bvh = build_bvh(positions, faces)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return GeometryArrays(
        f32(p0), f32(e1), f32(e2),
        f32(bvh["node_min"]), f32(bvh["node_max"]),
        jnp.asarray(bvh["is_leaf"]),
        jnp.asarray(bvh["leaf_off"]), jnp.asarray(bvh["leaf_cnt"]),
        jnp.asarray(bvh["miss"]), jnp.asarray(bvh["prim_ids"]),
    )


def _tri_intersect(o, d, p0, e1, e2, t_min, t_max):
    """Moller-Trumbore. Returns (t, u, v, hit). Shapes broadcast on the left."""
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tv = o - p0
    u = jnp.sum(tv * pv, axis=-1) * inv
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, axis=-1) * inv
    t = jnp.sum(e2 * qv, axis=-1) * inv
    hit = (
        (inv != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, u, v, hit


def brute_force_closest(geom: GeometryArrays, o, d, t_min, t_max):
    """[L,3] rays x all triangles. For tiny scenes / testing."""
    t, u, v, hit = _tri_intersect(
        o[:, None, :], d[:, None, :], geom.p0[None], geom.e1[None], geom.e2[None],
        t_min[:, None], t_max[:, None],
    )
    t = jnp.where(hit, t, INF)
    idx = jnp.argmin(t, axis=1)
    L = o.shape[0]
    ar = jnp.arange(L)
    best_t = t[ar, idx]
    valid = best_t < INF
    return (
        jnp.where(valid, idx, -1),
        jnp.where(valid, best_t, INF),
        u[ar, idx],
        v[ar, idx],
    )


def bvh_closest(geom: GeometryArrays, o, d, t_min, t_max):
    """Threaded-BVH closest hit for a wavefront of rays [L,3]."""
    L = o.shape[0]
    N = geom.node_min.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e-20, -1e-20), d)

    def cond(state):
        node, _, _, _, _ = state
        return jnp.any(node < N)

    def body(state):
        node, best_t, best_i, best_u, best_v = state
        nid = jnp.minimum(node, N - 1)
        lo = geom.node_min[nid]
        hi = geom.node_max[nid]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = (tn <= tf) & (tf >= t_min) & (tn <= jnp.minimum(best_t, t_max))

        leaf = geom.is_leaf[nid]
        off = geom.leaf_off[nid]
        cnt = geom.leaf_cnt[nid]
        # unrolled leaf primitive tests
        for k in range(MAX_LEAF):
            pid = geom.prim_ids[jnp.minimum(off + k, geom.prim_ids.shape[0] - 1)]
            t, u, v, hit = _tri_intersect(
                o, d, geom.p0[pid], geom.e1[pid], geom.e2[pid], t_min,
                jnp.minimum(best_t, t_max),
            )
            take = hit & leaf & box_hit & (k < cnt) & (node < N)
            best_i = jnp.where(take, pid, best_i)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)
            best_t = jnp.where(take, t, best_t)

        go_hit = box_hit & ~leaf & (node < N)
        nxt = jnp.where(go_hit, node + 1, geom.miss[nid])
        nxt = jnp.where(node < N, nxt, N)
        return nxt, best_t, best_i, best_u, best_v

    node0 = jnp.zeros(L, jnp.int32)
    state = (
        node0,
        jnp.full(L, INF),
        jnp.full(L, -1, jnp.int32),
        jnp.zeros(L),
        jnp.zeros(L),
    )
    node, best_t, best_i, best_u, best_v = jax.lax.while_loop(cond, body, state)
    return best_i, best_t, best_u, best_v


def closest_hit(geom: GeometryArrays, o, d, t_min, t_max, force_bvh=False):
    """Dispatch: brute force for tiny scenes, threaded BVH otherwise."""
    if geom.num_tris <= 64 and not force_bvh:
        return brute_force_closest(geom, o, d, t_min, t_max)
    return bvh_closest(geom, o, d, t_min, t_max)


def any_hit(geom: GeometryArrays, o, d, t_min, t_max):
    """Occlusion test (shadow rays). Returns bool [L]."""
    idx, t, _, _ = closest_hit(geom, o, d, t_min, t_max)
    return idx >= 0
