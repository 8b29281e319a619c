"""Wavefront ray traversal in JAX (closest-hit and any-hit).

The reference traverses a SAH kd-tree per ray with a per-thread stack
(mitsuba/include/mitsuba/render/skdtree.h:125-190). On TPU we walk a
W-wide BVH (default 16) with ORDERED nearest-child-first descent and a
compressed per-lane group stack (CWBVH-flavored): every wavefront step
is ONE uniform row-gather; descending nearest-first tightens best_t
early so pruning kills far subtrees. Earlier designs (unordered
hit/miss-link walk, then ordered binary and 8-wide walks) were
gather-count bound; the unordered walk additionally had catastrophic
worst-case lanes (tens of thousands of node visits on 1M-triangle
scenes — long enough to trip the TPU watchdog).

MEASURED COST MODEL (kitchen 1M tris, 64k lanes, one v5e, in situ by
adding a second independent gather to the live step): the row gather
IS the step cost — 1.13 ms/step of a 1.04 ms/step average; the slab
tests, leaf sweeps and stack one-hots fuse into it nearly for free.
Gather cost ~ (10.6 ns/lane + ~12 ps/byte): +43% for 2x row width,
+77% for 4x. Consequences, all verified on TPU:
  * pass the geometry INTO jit as an argument — a captured-constant
    rows table gathers ~1.5x slower (38 ms vs 26 ms per 64k camera
    walk);
  * wider trees do NOT pay off for this one-table walk (32/32 rows:
    +45%/step but the pend-mask revisits re-gather parent rows, so
    iteration count falls less than that — camera walks measured
    38.4 ms vs 25.6 ms at 16/16);
  * a fused Pallas step kernel (packed per-lane state, lanes on
    sublanes) was exactly correct and 3.7x SLOWER — sub-128-lane
    column ops waste 7/8 of the VPU; Mosaic has no per-lane vector
    gather, so the gather cannot move in-kernel either;
  * remaining levers are iteration-count reduction (direct child
    pushes instead of parent revisits) and an MXU one-hot descent
    over a VMEM-resident internal-node table.

TPU-first data layout rules applied here:
  * All per-lane math is SoA: separate [L] component arrays, never
    [L, 3]/[L, T, 3] intermediates (a trailing dim of 3 pads to 128
    lanes, a 42x memory-bandwidth tax, and the [L,T,3] broadcasts
    additionally blow up XLA compile time by minutes).
  * ONE row array [N, ROW] holds everything: an internal row carries
    all W child AABBs + child infos in SoA W-blocks; a leaf row embeds
    up to W woop triangles, so a leaf costs one iteration total.
    Consumers slice only lane-aligned [L, W] blocks of the gathered
    row.
  * The traversal stack stores one (node, pending-mask) entry per
    level in two [L, stack_depth] i32 arrays (depth measured at
    build) updated with one-hot selects — vector ops, no scatter, no
    pointer chasing.

A brute-force path handles small scenes (scan over triangles with scalar
broadcasts — zero gathers) and doubles as the testing referee, mirroring
the reference's kd-tree-vs-brute-force tests (mitsuba/src/tests/test_kd.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.float32(3.4e38)
EPS_T = 1e-4  # matches the role of Mitsuba's Epsilon for ray offsets
BRUTE_MAX = 1024  # below this many tris, gather-free brute force wins


LEAF_BIT = np.int32(1 << 30)
IDX_MASK = np.int32((1 << 30) - 1)


def _bvh8_depth(rows, wide):
    """Exact internal-node depth of the wide BVH via a vectorized BFS.
    The traversal pushes at most one pending-group entry per internal
    level, so the group stack must hold `depth` entries; an undersized
    stack silently drops groups (observed as mass ray misses)."""
    if rows.shape[0] == 1:
        return 1  # root is a single leaf row (tri data, no child infos)
    infos = rows[:, 6 * wide:7 * wide].view(np.int32)
    frontier = np.array([0], np.int64)
    depth = 0
    while len(frontier):
        depth += 1
        ch = infos[frontier].reshape(-1)
        ch = ch[(ch != 0) & ((ch & int(LEAF_BIT)) == 0)]
        frontier = (ch & int(IDX_MASK)).astype(np.int64)
        if depth > 4096:
            raise RuntimeError("BVH8 depth runaway (cyclic links?)")
    return depth


class GeometryArrays:
    """Device-side packed triangle + wide-BVH arrays (pytree).

    tri   [T,12] f32 : p0(3), e1(3), e2(3), pad(3) — BVH leaf order
                       (brute-force path + testing referee)
    rows [N,ROW] f32 : W = wide (aux). internal — W child AABBs SoA
                       (minx[W] miny[W] minz[W] maxx[W] maxy[W]
                       maxz[W], cols 0..6W-1), child infos i32-bitcast
                       at 6W..7W-1 (0 = empty, bit 30 = leaf); leaf —
                       up to W woop triangles in SoA W-blocks (p0x[W]
                       p0y[W] p0z[W] e1* e2*, cols 0..9W-1), count
                       @9W, packed tri base @9W+1. ROW = max(7W, 9W+2).
    perm  [T]    i32 : packed row -> original face index
    """

    def __init__(self, tri, rows, perm, stack_depth=32, wide=16):
        self.tri = tri
        self.rows = rows
        self.perm = perm
        # static traversal stack size (pytree aux): exact depth + slack
        self.stack_depth = int(stack_depth)
        self.wide = int(wide)

    def tree_flatten(self):
        return (self.tri, self.rows, self.perm), (self.stack_depth,
                                                  self.wide)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if isinstance(aux, tuple):
            sd, wide = aux
        else:  # legacy aux: stack depth only
            sd, wide = aux, 16
        return cls(*children, stack_depth=sd, wide=wide)

    @property
    def num_tris(self):
        return self.tri.shape[0]


jax.tree_util.register_pytree_node(
    GeometryArrays,
    lambda g: g.tree_flatten(),
    GeometryArrays.tree_unflatten,
)


def build_geometry(positions, faces) -> GeometryArrays:
    from .bvh import build_bvh8

    bvh = build_bvh8(positions, faces)
    perm = np.asarray(bvh["prim_ids"])
    if len(perm) == 0:
        perm = np.zeros(0, np.int64)
    v = positions[faces].astype(np.float64)[perm] if len(perm) else \
        np.zeros((0, 3, 3))
    T = len(perm)
    tri = np.zeros((max(T, 1), 12), np.float32)
    if T:
        tri[:T, 0:3] = v[:, 0]
        tri[:T, 3:6] = v[:, 1] - v[:, 0]
        tri[:T, 6:9] = v[:, 2] - v[:, 0]

    rows = np.asarray(bvh["rows"], np.float32)
    wide = int(bvh.get("wide", 16))
    # the walk pushes up to TWO entries per internal level (a direct
    # second-nearest child + the parent's remaining mask); round up to
    # multiples of 8 to bound recompiles across scenes
    depth = ((2 * _bvh8_depth(rows, wide) + 2 + 7) // 8) * 8
    return GeometryArrays(
        jnp.asarray(tri),
        jnp.asarray(rows),
        jnp.asarray(perm.astype(np.int32)),
        stack_depth=depth,
        wide=wide,
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
    T = geom.tri.shape[0]
    if T <= 64:
        # unrolled: XLA fuses the whole sweep into a few large kernels,
        # avoiding ~T tiny per-step scan launches
        state = init
        for k in range(T):
            state, _ = step(state, geom.tri[k, :9])
        best_t, best_i, best_u, best_v, _ = state
    else:
        (best_t, best_i, best_u, best_v, _), _ = jax.lax.scan(
            step, init, geom.tri[:, :9]
        )
    valid = best_i >= 0
    return best_i, jnp.where(valid, best_t, INF), best_u, best_v


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e-20, -1e-20), d)


MAX_STEPS = 8192  # watchdog guard; BVH8 walks are ~15-50 steps


def bvh_closest(geom: GeometryArrays, o, d, t_min, t_max, stop_on_hit=False,
                return_stats=False):
    """Ordered BVH16 closest hit for a wavefront of rays [L,3].

    One packed 160-float row-gather per iteration (the gather is the
    dominant per-step cost and grows only ~17% from 80 to 160 floats,
    while the 16-wide fan-out nearly halves the step count). Each lane
    is either:
      node  — slab-test the row's 16 children (restricted to the lane's
              pending mask when revisiting), descend into the nearest
              hit child, and push one pending group (node + remaining
              hit mask, in two parallel [L, SD] i32 stacks);
      leaf  — intersect the row's <=16 SoA-packed woop triangles in one
              iteration, then pop;
      pop   — one-hot read of the group stack top; popped groups are
              re-slab-tested against the tightened best_t, so far
              children prune for free.
    An undersized stack silently drops pending groups and loses hits, so
    the depth is measured at build, never guessed.

    LAYOUT RULE (profiled): all row consumption is [L, 16] lane-aligned
    BLOCK slices of the gathered [L, 160] result — extracting single
    columns re-tiles the whole gathered block (~3.4 ms/step at 64k
    lanes); 16-column blocks stay in the gather's native (8,128)
    tiling, and the [L] ray components broadcast in as [L,1] operands.

    Measured design notes (kitchen, 1M tris, 64k lanes, v5e): the row
    gather is ~100% of the per-step cost (1.13 ms of a 1.04 ms/step
    average; cost model ~10.6 ns/lane fixed + ~12 ps/byte, nearly
    width-independent to 1 KB/row) — and it runs ~1.5x faster when the
    row table enters jit as an ARGUMENT rather than a captured
    constant (pass GeometryArrays through jit boundaries, never close
    over it). A fused Pallas step kernel (lanes-on-sublanes packed
    state) was built, exactly correct, and 3.7x SLOWER than this XLA
    body — sub-128-lane column ops waste 7/8 of the VPU — so the fast
    path for big scenes is fewer/cheaper gathers (wide nodes, MXU
    one-hot descent for the VMEM-resident internal levels), not step
    fusion.
    """
    L = o.shape[0]
    stopm = jnp.ones(L, bool) if stop_on_hit else None
    body = bvh_step_factory(geom, o, d, t_min, t_max, stopm=stopm,
                            return_stats=return_stats)

    def cond(state):
        return jnp.any(state["cur"] >= 0) & (state["it"] < MAX_STEPS)

    state = bvh_state_init(L, geom.stack_depth, t_max > t_min)
    if return_stats:
        state["steps"] = jnp.zeros(L, jnp.int32)
    out = jax.lax.while_loop(cond, body, state)
    if return_stats:
        return (out["best_i"], out["best_t"], out["best_u"], out["best_v"],
                dict(steps=out["steps"], it=out["it"]))
    return out["best_i"], out["best_t"], out["best_u"], out["best_v"]


def bvh_state_init(L, SD, active):
    """Fresh traversal state: lanes with active=True start at the root,
    others park (cur = -1) immediately."""
    return dict(
        cur=jnp.where(active, 0, -1),
        leaf=jnp.zeros(L, bool),
        pend=jnp.zeros(L, jnp.int32),
        nstack=jnp.zeros((L, SD), jnp.int32),
        mstack=jnp.zeros((L, SD), jnp.int32),
        tstack=jnp.zeros((L, SD), jnp.float32),
        sp=jnp.zeros(L, jnp.int32),
        best_t=jnp.full(L, INF),
        best_i=jnp.full(L, -1, jnp.int32),
        best_u=jnp.zeros(L),
        best_v=jnp.zeros(L),
        it=jnp.int32(0),
    )


def bvh_state_reset(st, active, lanes):
    """Restart traversal for `lanes` ([L] bool) in an existing state dict
    (other lanes untouched); active&lanes start at the root, inactive
    lanes park."""
    st = dict(st)
    st["cur"] = jnp.where(lanes, jnp.where(active, 0, -1), st["cur"])
    st["leaf"] = jnp.where(lanes, False, st["leaf"])
    st["pend"] = jnp.where(lanes, 0, st["pend"])
    st["sp"] = jnp.where(lanes, 0, st["sp"])
    st["best_t"] = jnp.where(lanes, INF, st["best_t"])
    st["best_i"] = jnp.where(lanes, -1, st["best_i"])
    st["best_u"] = jnp.where(lanes, 0.0, st["best_u"])
    st["best_v"] = jnp.where(lanes, 0.0, st["best_v"])
    return st


def bvh_step_factory(geom: GeometryArrays, o, d, t_min, t_max, stopm=None,
                     return_stats=False):
    """Build the one-step traversal body over per-lane rays.

    Returns body(state) -> state advancing every lane's walk by ONE
    iteration (node slab-test / leaf intersect / pop). `stopm` ([L] bool
    or None) gives any-hit semantics per lane: flagged lanes terminate at
    the first accepted hit instead of walking to the closest. The
    returned body is reusable by bvh_closest's run-to-completion
    while_loop AND by budgeted steppers that interleave traversal windows
    with shading (integrators/regen.py's segment machine).

    Pop entries are either a PARENT revisit (node + pending mask of
    children not yet visited, re-slab-tested against the tightened
    best_t) or a DIRECT second-nearest child (info + its entry tn,
    mask 0): the direct entry descends without re-gathering the parent
    row — since the gather IS the per-step cost, every 2-children-hit
    node (the common case) saves one full step. Direct entries whose
    stored tn exceeds best_t at pop time are discarded for free (one
    unrolled extra pop)."""
    L = o.shape[0]
    ox, oy, oz = (a[:, None] for a in _components(o))   # [L,1]
    dx, dy, dz = (a[:, None] for a in _components(d))
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    t_min1 = t_min[:, None]
    W = geom.wide
    full_mask = np.int32(np.uint32((np.uint64(1) << np.uint64(W)) - 1))
    SD = geom.stack_depth
    iota = jax.lax.broadcasted_iota(jnp.int32, (L, SD), 1)
    iotaw = jnp.arange(W, dtype=jnp.int32)[None, :]      # [1,W]

    def body(state):
        cur, leaf, pend = state["cur"], state["leaf"], state["pend"]
        nstack, mstack = state["nstack"], state["mstack"]
        tstack = state["tstack"]
        sp = state["sp"]
        best_t, best_i = state["best_t"], state["best_i"]
        best_u, best_v = state["best_u"], state["best_v"]

        active = cur >= 0
        row = geom.rows[jnp.maximum(cur, 0)]  # [L,160] single gather
        limit = jnp.minimum(best_t, t_max)[:, None]

        # --- leaf phase: up to 16 SoA-packed woop triangles ---------------
        # Inputs MUST be zeroed for non-leaf lanes: the intersection math
        # on internal-row floats produces NaN/inf, and the XLA TPU backend
        # MISCOMPILES the fused `where(take, tt, best_t)` chain when the
        # unselected branch is NaN (observed: corrupted best_t -> mass ray
        # misses under jit). Zeroed rows give det = 0 -> take = False with
        # all-finite intermediates.
        lf = active & leaf
        lrow = jnp.where(lf[:, None], row, 0.0)
        meta = _i32(lrow[:, 9 * W:9 * W + 2])
        cnt = meta[:, 0:1]     # count @9W
        base = meta[:, 1:2]    # base  @9W+1
        p0x, p0y, p0z = (lrow[:, W * c:W * (c + 1)] for c in range(3))
        e1x, e1y, e1z = (lrow[:, W * c:W * (c + 1)] for c in range(3, 6))
        e2x, e2y, e2z = (lrow[:, W * c:W * (c + 1)] for c in range(6, 9))
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
            lf[:, None] & (iotaw < cnt)
            & (inv != 0.0) & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > t_min1) & (tt < limit)
        )
        ttm = jnp.where(take, tt, INF)
        kbest = jnp.argmin(ttm, axis=1)                       # [L]
        selw = iotaw == kbest[:, None]                        # [L,16]
        t_leaf = jnp.min(ttm, axis=1)                         # [L]
        got = t_leaf < best_t
        pick = lambda a: jnp.sum(jnp.where(selw, a, 0.0), axis=1)
        best_i = jnp.where(got, base[:, 0] + kbest, best_i)
        best_u = jnp.where(got, pick(uu), best_u)
        best_v = jnp.where(got, pick(vv), best_v)
        best_t = jnp.where(got, t_leaf, best_t)
        limit = jnp.minimum(best_t, t_max)[:, None]

        # --- node phase: slab-test 16 children ----------------------------
        nd = active & ~leaf
        nrow = jnp.where(nd[:, None], row, 0.0)  # same NaN-safety rule
        pmask = jnp.where(pend == 0, full_mask, pend)[:, None]
        info16 = _i32(nrow[:, 6 * W:7 * W])
        t0x = (nrow[:, 0 * W:1 * W] - ox) * ix
        t1x = (nrow[:, 3 * W:4 * W] - ox) * ix
        t0y = (nrow[:, 1 * W:2 * W] - oy) * iy
        t1y = (nrow[:, 4 * W:5 * W] - oy) * iy
        t0z = (nrow[:, 2 * W:3 * W] - oz) * iz
        t1z = (nrow[:, 5 * W:6 * W] - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hitw = (
            nd[:, None] & (tn <= tf) & (tf >= t_min1) & (tn <= limit)
            & (info16 != 0) & ((pmask >> iotaw) & 1 == 1)
        )
        tnm = jnp.where(hitw, tn, INF)
        kn = jnp.argmin(tnm, axis=1)
        seln = iotaw == kn[:, None]
        chosen = jnp.sum(jnp.where(seln, info16, 0), axis=1)    # [L]
        chosen_bit = jnp.sum(jnp.where(seln, 1 << iotaw, 0), axis=1)
        hit_mask = jnp.sum(jnp.where(hitw, 1 << iotaw, 0), axis=1)

        any_hit = nd & (hit_mask != 0)
        if stopm is not None:
            any_hit = any_hit & ~(stopm & (best_i >= 0))
        rem = hit_mask & ~chosen_bit
        # second-nearest hit child: pushed as a DIRECT entry (mask 0 +
        # entry tn) so its pop descends without re-gathering the parent
        tnm2 = jnp.where(hitw & ~seln, tn, INF)
        kn2 = jnp.argmin(tnm2, axis=1)
        seln2 = iotaw == kn2[:, None]
        info2 = jnp.sum(jnp.where(seln2, info16, 0), axis=1)
        bit2 = jnp.sum(jnp.where(seln2, 1 << iotaw, 0), axis=1)
        tn2 = jnp.min(tnm2, axis=1)
        rem2 = rem & ~bit2
        push_par = any_hit & (rem2 != 0)   # 3+ children: parent revisit
        push_dir = any_hit & (rem != 0)    # 2+ children: direct second
        sel_a = iota == sp[:, None]
        pa = sel_a & push_par[:, None]     # parent below (popped later)
        nstack = jnp.where(pa, cur[:, None], nstack)
        mstack = jnp.where(pa, rem2[:, None], mstack)
        sp = jnp.where(push_par, sp + 1, sp)
        sel_b = iota == sp[:, None]
        pb = sel_b & push_dir[:, None]
        nstack = jnp.where(pb, info2[:, None], nstack)
        mstack = jnp.where(pb, 0, mstack)
        tstack = jnp.where(pb, tn2[:, None], tstack)
        sp = jnp.where(push_dir, sp + 1, sp)

        # --- pop ------------------------------------------------------------
        need_pop = active & ~any_hit  # leaf just intersected or no child hit
        if stopm is not None:
            found = active & stopm & (best_i >= 0)
            need_pop = need_pop & ~found
        limit1 = jnp.minimum(best_t, t_max)
        # a pruned DIRECT top (its subtree cannot beat best_t) is
        # discarded for free: look one entry deeper this iteration
        sel1 = iota == (sp - 1)[:, None]
        m1 = jnp.sum(jnp.where(sel1, mstack, 0), axis=1)
        t1 = jnp.sum(jnp.where(sel1, tstack, 0.0), axis=1)
        prune1 = need_pop & (sp > 0) & (m1 == 0) & (t1 > limit1)
        sp_eff = jnp.where(prune1, sp - 1, sp)
        can_pop = need_pop & (sp_eff > 0)
        done = (need_pop & (sp_eff == 0))
        if stopm is not None:
            done = done | found
        selp = iota == (sp_eff - 1)[:, None]
        top_n = jnp.sum(jnp.where(selp, nstack, 0), axis=1)
        top_m = jnp.sum(jnp.where(selp, mstack, 0), axis=1)
        sp = jnp.where(can_pop, sp_eff - 1, sp_eff)

        is_dir = top_m == 0
        pop_cur = jnp.where(is_dir, top_n & IDX_MASK, top_n)
        pop_leaf = is_dir & ((top_n & LEAF_BIT) != 0)
        pop_pend = jnp.where(is_dir, 0, top_m)

        new_cur = jnp.where(
            any_hit, chosen & IDX_MASK,
            jnp.where(can_pop, pop_cur, jnp.where(done, -1, cur)))
        new_leaf = jnp.where(
            any_hit, (chosen & LEAF_BIT) != 0,
            jnp.where(can_pop, pop_leaf, jnp.where(done, False, leaf)))
        new_pend = jnp.where(
            any_hit, 0, jnp.where(can_pop, pop_pend, pend))

        out = dict(
            cur=new_cur, leaf=new_leaf, pend=new_pend,
            nstack=nstack, mstack=mstack, tstack=tstack, sp=sp,
            best_t=best_t, best_i=best_i, best_u=best_u, best_v=best_v,
            it=state["it"] + 1,
        )
        if return_stats:
            out["steps"] = state["steps"] + active.astype(jnp.int32)
        return out

    return body



def _on_tpu():
    return jax.default_backend() == "tpu"


def _brute(geom: GeometryArrays, o, d, t_min, t_max):
    """Small-scene sweep: the Pallas VMEM-resident kernel on TPU (the XLA
    sweep round-trips ~1400 [L] intermediates through HBM), XLA on CPU."""
    if _on_tpu():
        from .pallas_brute import brute_pallas

        return brute_pallas(geom.tri, o, d, t_min, t_max)
    return brute_force_closest(geom, o, d, t_min, t_max)


def closest_hit(geom: GeometryArrays, o, d, t_min, t_max, force_bvh=False):
    """Dispatch: brute force for small scenes, threaded BVH otherwise.
    Returns (packed tri index or -1, t, u, v)."""
    if geom.num_tris <= BRUTE_MAX and not force_bvh:
        return _brute(geom, o, d, t_min, t_max)
    return bvh_closest(geom, o, d, t_min, t_max)


def any_hit(geom: GeometryArrays, o, d, t_min, t_max):
    """Occlusion test (shadow rays). Returns bool [L]."""
    if geom.num_tris <= BRUTE_MAX:
        idx, _, _, _ = _brute(geom, o, d, t_min, t_max)
        return idx >= 0
    idx, _, _, _ = bvh_closest(geom, o, d, t_min, t_max, stop_on_hit=True)
    return idx >= 0
