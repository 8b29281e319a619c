"""Device-side SD-tree: spatial binary tree over directional quadtrees.

The reference stores pointer-linked trees with atomic-float accumulation
(guided_path.cpp:158-1007). Here both trees are flat preallocated pools in
HBM:

  spatial  : s_child [S,2] (-1 for leaves), s_dtree [S] (leaf -> dtree row)
             axis cycles x,y,z with depth (STreeNode::childIndex, :747-755)
  quadtrees: two pools (building / sampling), each q_sum [Q,4] f32 +
             q_child [Q,4] i32 (-1 = leaf quadrant), one root per dtree

All traversals are batched lax.while_loops over the wavefront: every lane
walks its own path through the trees via vectorized gathers; radiance
splats become scatter-adds on the flattened [Q*4] sum array — the
deterministic TPU equivalent of the reference's CAS loops
(guided_path.cpp:59-62).

Topology rebuilds (refine/reset/build) happen between iterations in
guiding.host; this module only reads/accumulates.

Measured descent cost model (round 5, one TPU v5e via tunnel, 64k
lanes; method: tools/bench/bench_honest.py harness):

  * The sequential per-level row gather IS the cost of every walk —
    ~0.6-1.1 ms per gather at 64k lanes, near width-independent to
    ~1 KB/row (the BVH model in accel/traverse.py:25-82 transfers
    unchanged: ~10.6 ns/lane + ~12 ps/byte).
  * Gathers per guided bounce, one-level walks (r4): s-descent
    s_depth (10-12) + fused sample+pdf q_depth (8) + 3 per-dtree
    scalars ~= 23.
  * Packed walks (this file): lookup s_depth/4 + 1 (s_pack4) +
    sample_pdf q_depth/2 (qs_pack2) + 1 (d_meta) ~= 9.
  * Isolated fused-walk microbench (refined 256-dtree tree, s_depth 12
    / q_depth 8, includes per-dispatch tunnel overhead): 13.32 ms ->
    11.42 ms per 64k-lane dispatch; the isolated numbers are
    overhead-bound — the e2e effect appears in the guided-pass rows of
    the bench matrix. Packed-vs-per-level agreement is exact
    (tests/test_packed_descent.py).
  * Negative results recorded: a Pallas whole-descent kernel is ruled
    out by the measured per-lane VMEM gather behavior (see the r2 BVH
    dead-ends in accel/traverse.py — sub-128-lane column ops dominate);
    table composition beyond 4 levels doubles the s_pack4 row to 512 B
    for one fewer gather (~breakeven, not taken).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.warp import INV_FOURPI, canonical_to_dir, dir_to_canonical

MAX_S_DEPTH = 64  # spatial descent bound
MAX_Q_DEPTH = 20  # quadtree depth cap (DTree::reset maxDepth, :1112)
S_PACK_K = 4  # spatial levels folded into one s_pack4 row gather
Q_PACK_K = 2  # quadtree levels folded into one qs_pack2 row gather


class SDTreeArrays:
    FIELDS = (
        "aabb_min", "aabb_size",
        "s_child", "s_dtree",
        # packed descent tables (one gather per level): s_pack = [child0,
        # child1, dtree, pad] int32; q*_pack = [sum0..3, bitcast(child0..3)]
        "s_pack", "qs_pack",
        # multi-level packed descent tables (one gather per S_PACK_K /
        # Q_PACK_K levels — on TPU the per-level row gather IS the cost
        # of a guided pass, near width-independent to ~1 KB/row, so
        # packing k levels into one row divides the guided descent tax
        # by k; see the cost model in STATUS.md):
        #   s_pack4 [S, 32] i32 = 16 four-level descendants indexed by
        #     the 4 axis bits (h0 least significant) + 16 consumed-level
        #     counts (walks stall at leaves: slots collapse, cons<4)
        #   qs_pack2 [Qs, 52] f32 = own child sums[4], per-child child
        #     sums[16], bitcast rest-node[16] + meta[16] (cons | done<<2)
        #     indexed by two quadrant choices (slot = qA + 4*qB)
        #   d_meta [T, 4] f32 = bitcast(ds_root), ds_sum, ds_statw,
        #     opt_var — the per-dtree scalars every guided bounce reads,
        #     in ONE row gather instead of four
        #   qb_pack2 [Qb, 36] i32 = BUILDING-tree topology pack for the
        #     training splat-target descents: child-after-one-choice[4]
        #     + rest-node[16] + meta[16] (cons | done<<2)
        "s_pack4", "qs_pack2", "qb_pack2", "d_meta",
        # sampling pool (frozen during a pass)
        "qs_sum", "qs_child", "ds_root", "ds_sum", "ds_statw",
        # building pool (accumulated into during a pass)
        "qb_sum", "qb_child", "db_root", "db_statw",
        # per-dtree Adam state for the learned bsdf sampling fraction
        "opt_var", "opt_m1", "opt_m2", "opt_iter", "opt_bgrad", "opt_bweight",
    )

    def __init__(self, s_depth=MAX_S_DEPTH, q_depth=MAX_Q_DEPTH, **kw):
        # static trip counts for the descent scans (rounded up on the host;
        # pytree aux so jit recompiles only when the depth class changes)
        self.s_depth = s_depth
        self.q_depth = q_depth
        for f in self.FIELDS:
            setattr(self, f, kw[f])


jax.tree_util.register_pytree_node(
    SDTreeArrays,
    lambda s: (
        tuple(getattr(s, f) for f in SDTreeArrays.FIELDS),
        (s.s_depth, s.q_depth),
    ),
    lambda aux, ch: SDTreeArrays(
        s_depth=aux[0], q_depth=aux[1], **dict(zip(SDTreeArrays.FIELDS, ch))
    ),
)


def normalize_pos(sdt: SDTreeArrays, p):
    return (p - sdt.aabb_min) / sdt.aabb_size


def lookup_ref(sdt: SDTreeArrays, p_world):
    """Reference spatial descent (one gather per level) — the oracle
    for `lookup`'s multi-level packed walk; kept for tests.

    Returns (dtree_id [L], voxel_size [L,3] in world units), matching
    STree::dTreeWrapper (guided_path.cpp:897-905). The descent is a scan
    with a static trip count (sdt.s_depth, host metadata); the split axis
    cycles x,y,z with depth and all lanes start at the root, so the axis
    per step is a compile-time one-hot — no dynamic indexing in the body.
    One packed [L,4] gather per level.
    """
    x = jnp.clip(normalize_pos(sdt, p_world), 0.0, 1.0)
    L = x.shape[0]
    onehots = jnp.eye(3, dtype=jnp.float32)[
        jnp.arange(sdt.s_depth) % 3
    ]  # [s_depth, 3]

    def body(carry, oh):
        node, x, size = carry
        row = sdt.s_pack[node]  # [L,4]: child0, child1, dtree, pad
        internal = row[:, 2] < 0
        ax = jnp.sum(x * oh, -1)
        hi = ax >= 0.5
        child = jnp.where(hi, row[:, 1], row[:, 0])
        ax2 = jnp.where(hi, (ax - 0.5) * 2.0, ax * 2.0)
        upd = internal[:, None] * oh  # [L,3] 0/1
        x = x * (1 - upd) + upd * ax2[:, None]
        size = size * (1 - 0.5 * upd)
        node = jnp.where(internal, child, node)
        return (node, x, size), None

    size0 = jnp.full((L, 3), 1.0, jnp.float32) * sdt.aabb_size
    node0 = jnp.zeros(L, jnp.int32)
    (node, _, size), _ = jax.lax.scan(body, (node0, x, size0), onehots)
    return sdt.s_dtree[node], size


def _wheretree(cols, bits):
    """Branchless 2^k-way select: cols is a list of [L] arrays indexed
    by the bit string (bits[0] least significant), bits a list of [L]
    bool arrays. Pure VPU selects — no per-lane gathers (single-column
    extracts from a gathered row block were 70% of the r2 BVH step; see
    accel/traverse.py)."""
    for b in bits:
        cols = [jnp.where(b, cols[2 * i + 1], cols[2 * i])
                for i in range(len(cols) // 2)]
    return cols[0]


def lookup(sdt: SDTreeArrays, p_world):
    """Multi-level packed spatial descent: one [L,32] row gather per
    S_PACK_K(=4) levels instead of one [L,4] gather per level — ~4x
    fewer sequential gathers, which are the entire cost of the walk on
    TPU (~10.6 ns/lane each, near width-independent to ~1 KB; STATUS.md
    cost model). Semantics identical to lookup_ref (oracle-tested).

    Per step: the 4 axis bits are computed SPECULATIVELY (as if every
    level were internal) — valid because a walk that stalls at a leaf
    collapses all deeper bit choices to the same packed slot — then the
    selected slot's consumed-count replays the coordinate/size rescale
    for exactly the levels actually descended."""
    x = jnp.clip(normalize_pos(sdt, p_world), 0.0, 1.0)
    L = x.shape[0]
    steps = (sdt.s_depth + S_PACK_K - 1) // S_PACK_K
    onehots = jnp.eye(3, dtype=jnp.float32)[
        jnp.arange(steps * S_PACK_K) % 3
    ].reshape(steps, S_PACK_K, 3)

    def body(carry, oh4):
        node, x, size = carry
        row = sdt.s_pack4[node]  # [L, 32]
        # speculative axis bits
        bits = []
        xs = x
        for i in range(S_PACK_K):
            ax = jnp.sum(xs * oh4[i], -1)
            hi = ax >= 0.5
            ax2 = jnp.where(hi, (ax - 0.5) * 2.0, ax * 2.0)
            xs = xs * (1 - oh4[i]) + oh4[i] * ax2[:, None]
            bits.append(hi)
        new_node = _wheretree([row[:, i] for i in range(16)], bits)
        cons = _wheretree([row[:, 16 + i] for i in range(16)], bits)
        # replay the rescale for the consumed levels only
        for i in range(S_PACK_K):
            ax = jnp.sum(x * oh4[i], -1)
            hi = ax >= 0.5
            ax2 = jnp.where(hi, (ax - 0.5) * 2.0, ax * 2.0)
            upd = (cons > i).astype(jnp.float32)[:, None] * oh4[i]
            x = x * (1 - upd) + upd * ax2[:, None]
            size = size * (1 - 0.5 * upd)
        return (new_node, x, size), None

    size0 = jnp.full((L, 3), 1.0, jnp.float32) * sdt.aabb_size
    node0 = jnp.zeros(L, jnp.int32)
    (node, _, size), _ = jax.lax.scan(body, (node0, x, size0), onehots)
    return sdt.s_dtree[node], size


def dtree_meta(sdt: SDTreeArrays, dtree_id):
    """The per-dtree scalars every guided bounce needs, in ONE [L,4]
    row gather (vs four separate gathers of ds_root / ds_sum /
    ds_statw / opt_var): returns (root node [L] i32, uniform mask [L]
    bool — DTree mean <= 0 or statWeight <= 0 falls back to the uniform
    sphere, guided_path.cpp:415-421/431-442 — and the learned bsdf
    sampling fraction [L], logistic(opt_var), :659-670)."""
    row = sdt.d_meta[jnp.maximum(dtree_id, 0)]
    root = jax.lax.bitcast_convert_type(row[:, 0], jnp.int32)
    statw = row[:, 2]
    mean = row[:, 1] * INV_FOURPI / jnp.maximum(statw, 1e-38)
    # dtree_id < 0 lanes are uniform by construction (the reference walk
    # gathers the zero padding row there)
    uniform = ~(mean > 0) | (statw <= 0) | (dtree_id < 0)
    frac = jnp.where(dtree_id >= 0, jax.nn.sigmoid(row[:, 3]), 0.5)
    return root, uniform, frac


def _sel4(arr, bx, by):
    """arr[lane, bx | by<<1] via wheres (take_along_axis lowers to gather)."""
    lo = jnp.where(bx, arr[:, 1], arr[:, 0])
    hi = jnp.where(bx, arr[:, 3], arr[:, 2])
    return jnp.where(by, hi, lo)


def _quad_index(p):
    """(quadrant index, rescaled p) — QuadTreeNode::childIndex (:205-217)."""
    bx = p[..., 0] >= 0.5
    by = p[..., 1] >= 0.5
    px = jnp.where(bx, (p[..., 0] - 0.5) * 2, p[..., 0] * 2)
    py = jnp.where(by, (p[..., 1] - 0.5) * 2, p[..., 1] * 2)
    idx = bx.astype(jnp.int32) | (by.astype(jnp.int32) << 1)
    return idx, jnp.stack([px, py], -1)


def _unpack(row):
    """[L,8] packed row -> (sums [L,4], children [L,4] int32)."""
    import jax.lax as lax

    sums = row[:, :4]
    kids = lax.bitcast_convert_type(row[:, 4:8], jnp.int32)
    return sums, kids


def descend_to_leaf(q_child, root, p, n_steps=MAX_Q_DEPTH):
    """Walk a batch of canonical points down a quadtree pool.

    Returns (leaf node index, quadrant, rescaled point in the leaf cell)."""

    def body(carry, _):
        node, quad, p, done = carry
        row = q_child[node]  # [L,4]
        bx = p[..., 0] >= 0.5
        by = p[..., 1] >= 0.5
        q, p2 = _quad_index(p)
        child = _sel4(row, bx, by)
        leaf = child < 0
        new_node = jnp.where(done | leaf, node, child)
        new_quad = jnp.where(done, quad, q)
        new_p = jnp.where(done[..., None], p, p2)
        return (new_node, new_quad, new_p, done | leaf), None

    L = p.shape[0]
    st = (root, jnp.zeros(L, jnp.int32), p, jnp.zeros(L, bool))
    (node, quad, p, _), _ = jax.lax.scan(body, st, None, length=n_steps)
    return node, quad, p


def descend_cell(q_child, root, p, n_steps=MAX_Q_DEPTH):
    """(leaf node, quadrant, leaf depth) at canonical p in ONE walk —
    the shade-time splat-target precompute (descend_to_leaf +
    _depth_at fused). Depth convention matches _depth_at (root leaf =
    1, so the leaf QUADRANT cell has side 0.5**depth), which is what
    dtree_box_splat expects."""

    def body(carry, _):
        node, quad, p, depth, done = carry
        row = q_child[node]
        bx = p[..., 0] >= 0.5
        by = p[..., 1] >= 0.5
        q, p2 = _quad_index(p)
        child = _sel4(row, bx, by)
        leaf = child < 0
        new_node = jnp.where(done | leaf, node, child)
        new_quad = jnp.where(done, quad, q)
        new_p = jnp.where(done[..., None], p, p2)
        new_depth = jnp.where(done, depth, depth + 1)
        return (new_node, new_quad, new_p, new_depth, done | leaf), None

    L = p.shape[0]
    st = (root, jnp.zeros(L, jnp.int32), p, jnp.zeros(L, jnp.int32),
          jnp.zeros(L, bool))
    (node, quad, _, depth, _), _ = jax.lax.scan(body, st, None,
                                                length=n_steps)
    return node, quad, depth


def descend_cell_clamped(q_child, root, p, depth_limit, n_steps=MAX_Q_DEPTH):
    """descend_cell with a per-lane depth clamp: the walk stops at cell
    depth `depth_limit` even if the node is internal there. Returns
    (node, quad, depth); the cell (node, quad) may then be an INTERNAL
    quadrant — its accumulated residual is pushed down uniformly by
    area at build time (host.HostSDTree._pushdown_residuals)."""

    def body(carry, _):
        node, quad, p, depth, done = carry
        row = q_child[node]
        bx = p[..., 0] >= 0.5
        by = p[..., 1] >= 0.5
        q, p2 = _quad_index(p)
        child = _sel4(row, bx, by)
        stop = done | (child < 0) | (depth + 1 >= depth_limit)
        new_node = jnp.where(stop, node, child)
        new_quad = jnp.where(done, quad, q)
        new_p = jnp.where(done[..., None], p, p2)
        new_depth = jnp.where(done, depth, depth + 1)
        return (new_node, new_quad, new_p, new_depth, stop), None

    L = p.shape[0]
    st = (root, jnp.zeros(L, jnp.int32), p, jnp.zeros(L, jnp.int32),
          jnp.zeros(L, bool))
    (node, quad, _, depth, _), _ = jax.lax.scan(body, st, None,
                                                length=n_steps)
    return node, quad, depth


def descend_cell_packed(qb_pack2, root, p, depth_limit, n_steps):
    """descend_cell / descend_cell_clamped over the 2-level packed
    building-tree topology (qb_pack2 [Qb,36] i32 = child-after-one-
    choice[4], rest-node[16], meta[16] with cons | done<<2): one row
    gather per TWO levels. Pass depth_limit=None for the unclamped
    walk. Level-by-level semantics match the one-gather-per-level
    originals exactly (oracle-tested): every level consumes (quad,
    depth) until the stop, the node only advances into children that
    exist AND lie strictly above the clamp depth.

    n_steps = number of LEVELS to cover (trip count = ceil(n_steps/2)).
    Returns (node, quad, depth)."""
    L = p.shape[0]
    if depth_limit is None:
        depth_limit = jnp.full(L, 0x7FFF, jnp.int32)

    def body(carry, _):
        node, quad, p, depth, done = carry
        row = qb_pack2[node]  # [L, 36]
        bxA = p[..., 0] >= 0.5
        byA = p[..., 1] >= 0.5
        qA, pA = _quad_index(p)
        bxB = pA[..., 0] >= 0.5
        byB = pA[..., 1] >= 0.5
        qB, pB = _quad_index(pA)
        bits = [bxA, byA, bxB, byB]
        rest = _wheretree([row[:, 4 + i] for i in range(16)], bits)
        meta = _wheretree([row[:, 20 + i] for i in range(16)], bits)
        c1 = _sel4(row[:, :4], bxA, byA)
        cons = meta & 3
        okB = ((meta >> 2) & 1) == 0
        allowed = depth_limit - depth
        active = ~done & (allowed >= 1)
        quad = jnp.where(active, qA, quad)
        depth = depth + active
        moveA = active & (cons >= 2) & (allowed >= 2)
        quad = jnp.where(moveA, qB, quad)
        depth = depth + moveA
        moveB = moveA & okB & (allowed >= 3)
        node = jnp.where(moveB, rest, jnp.where(moveA, c1, node))
        p = jnp.where(moveA[..., None], pB,
                      jnp.where(active[..., None], pA, p))
        done = done | (active & ~moveA) | (moveA & ~moveB)
        return (node, quad, p, depth, done), None

    st = (root, jnp.zeros(L, jnp.int32), p, jnp.zeros(L, jnp.int32),
          jnp.zeros(L, bool))
    (node, quad, _, depth, _), _ = jax.lax.scan(
        body, st, None, length=(n_steps + Q_PACK_K - 1) // Q_PACK_K)
    return node, quad, depth


def dtree_box_targets4_packed(qb_pack2, root, pc, depth,
                              n_steps=MAX_Q_DEPTH):
    """dtree_box_targets4 with the corner descents running over the
    2-level packed building-tree topology (descend_cell_packed) — half
    the sequential gathers of the corner walks, which dominate the
    improved-config (directionalFilter=box) training shade."""
    L = pc.shape[0]
    s = 0.5 ** depth.astype(jnp.float32)
    b_lo = pc - s[..., None] * 0.5
    b_hi = pc + s[..., None] * 0.5
    corners = jnp.stack(
        [b_lo,
         jnp.stack([b_hi[:, 0], b_lo[:, 1]], -1),
         jnp.stack([b_lo[:, 0], b_hi[:, 1]], -1),
         b_hi], axis=1)  # [L, 4, 2]
    cc = jnp.clip(corners, 0.0, 1.0 - 1e-6).reshape(L * 4, 2)
    root4 = jnp.repeat(root, 4)
    dlim4 = jnp.repeat(depth, 4)
    node, quad, d = descend_cell_packed(qb_pack2, root4, cc, dlim4,
                                        n_steps)
    scale = jnp.exp2(d.astype(jnp.float32))
    csz = 1.0 / scale
    o = jnp.floor(cc * scale[..., None]) * csz[..., None]
    lo4 = jnp.repeat(b_lo, 4, axis=0)
    hi4 = jnp.repeat(b_hi, 4, axis=0)
    w2 = (jnp.minimum(hi4, o + csz[..., None])
          - jnp.maximum(lo4, o))
    w2 = jnp.maximum(w2, 0.0)
    s4 = jnp.repeat(s, 4)
    w = (w2[:, 0] * w2[:, 1]) / jnp.maximum(s4 * s4, 1e-38)
    cell = (node * 4 + quad).reshape(L, 4)
    w = w.reshape(L, 4)
    for j in range(1, 4):
        dup = jnp.zeros(L, bool)
        for i in range(j):
            dup = dup | (cell[:, i] == cell[:, j])
        w = w.at[:, j].set(jnp.where(dup, 0.0, w[:, j]))
    return cell, w


def dtree_box_targets4(q_child, root, pc, depth, n_steps=MAX_Q_DEPTH):
    """TPU-native box directional splat targets: the 4 CORNERS of the
    splat box (side 0.5**depth centered at pc, QuadTreeNode::record
    guided_path.cpp:322-338) descend the building tree with the walk
    clamped at the box's own depth. Down to that depth every cell is at
    least box-sized, so the box overlaps at most the 2x2 block whose
    cells contain its corners — 4 fixed-trip scans enumerate ALL
    overlapped cells with their exact overlap weights, replacing the
    dynamic-stack walk (dtree_box_splat) whose unbounded while_loop
    tripped the TPU watchdog on refined trees (the cbox-improved
    iteration-2 kernel fault). Cells that are still internal at the
    clamp depth take the residual for their whole subtree; the build
    pushes it down uniformly by area — exact for interior cells of the
    box, an area-uniform blur only at box-boundary cells of
    deeper-than-box neighbours (the legacy walk instead TRUNCATED
    those at D_TARGETS, dropping the energy).

    Returns (cell [L,4] int32 flat quadrant indices, w [L,4] f32
    overlap weights summing to the in-domain box fraction)."""
    L = pc.shape[0]
    s = 0.5 ** depth.astype(jnp.float32)
    b_lo = pc - s[..., None] * 0.5
    b_hi = pc + s[..., None] * 0.5
    corners = jnp.stack(
        [b_lo,
         jnp.stack([b_hi[:, 0], b_lo[:, 1]], -1),
         jnp.stack([b_lo[:, 0], b_hi[:, 1]], -1),
         b_hi], axis=1)  # [L, 4, 2]
    cc = jnp.clip(corners, 0.0, 1.0 - 1e-6).reshape(L * 4, 2)
    root4 = jnp.repeat(root, 4)
    dlim4 = jnp.repeat(depth, 4)
    node, quad, d = descend_cell_clamped(q_child, root4, cc, dlim4, n_steps)
    scale = jnp.exp2(d.astype(jnp.float32))
    csz = 1.0 / scale
    o = jnp.floor(cc * scale[..., None]) * csz[..., None]
    lo4 = jnp.repeat(b_lo, 4, axis=0)
    hi4 = jnp.repeat(b_hi, 4, axis=0)
    w2 = (jnp.minimum(hi4, o + csz[..., None])
          - jnp.maximum(lo4, o))
    w2 = jnp.maximum(w2, 0.0)
    s4 = jnp.repeat(s, 4)
    w = (w2[:, 0] * w2[:, 1]) / jnp.maximum(s4 * s4, 1e-38)
    cell = (node * 4 + quad).reshape(L, 4)
    w = w.reshape(L, 4)
    # dedupe corners that landed in the same cell (weights are computed
    # from the cell geometry, so duplicates carry identical w)
    for j in range(1, 4):
        dup = jnp.zeros(L, bool)
        for i in range(j):
            dup = dup | (cell[:, i] == cell[:, j])
        w = w.at[:, j].set(jnp.where(dup, 0.0, w[:, j]))
    return cell, w


def pdf_dir(sdt: SDTreeArrays, dtree_id, d_world):
    """Solid-angle pdf of the sampling distribution at direction d
    (DTree::pdf, guided_path.cpp:415-421; QuadTreeNode::pdf :232-245).
    Static-trip-count scan, one packed gather per level."""
    p = dir_to_canonical(d_world)
    mean = sdt.ds_sum[dtree_id] * INV_FOURPI / jnp.maximum(sdt.ds_statw[dtree_id], 1e-38)
    uniform = ~(mean > 0) | (sdt.ds_statw[dtree_id] <= 0)

    def body(carry, _):
        node, p, acc, dead, done = carry
        sums, kids = _unpack(sdt.qs_pack[node])
        bx = p[..., 0] >= 0.5
        by = p[..., 1] >= 0.5
        _, p2 = _quad_index(p)
        sq = _sel4(sums, bx, by)
        total = jnp.sum(sums, axis=-1)
        ok = sq > 0
        factor = jnp.where(ok, 4.0 * sq / jnp.maximum(total, 1e-38), 0.0)
        child = _sel4(kids, bx, by)
        leaf = child < 0
        acc = jnp.where(done, acc, acc * factor)
        dead = dead | (~done & ~ok)
        done2 = done | leaf | ~ok
        return (
            jnp.where(done2, node, child),
            jnp.where(done2[..., None], p, p2),
            acc,
            dead,
            done2,
        ), None

    L = p.shape[0]
    root = sdt.ds_root[jnp.maximum(dtree_id, 0)]
    st = (root, p, jnp.ones(L, jnp.float32), jnp.zeros(L, bool), jnp.zeros(L, bool))
    (_, _, acc, dead, _), _ = jax.lax.scan(body, st, None, length=sdt.q_depth)
    pdf = jnp.where(dead, 0.0, acc * INV_FOURPI)
    return jnp.where(uniform, INV_FOURPI, pdf)


def sample_dir(sdt: SDTreeArrays, dtree_id, key_or_u):
    """Draw a direction from the sampling quadtree (DTree::sample :431-442,
    QuadTreeNode::sample :257-301). Needs one uniform per level plus a 2D
    uniform in the leaf cell; pass a [L, MAX_Q_DEPTH+2] uniform array."""
    u = key_or_u
    L = dtree_id.shape[0]
    mean = sdt.ds_sum[dtree_id] * INV_FOURPI / jnp.maximum(sdt.ds_statw[dtree_id], 1e-38)
    uniform = ~(mean > 0) | (sdt.ds_statw[dtree_id] <= 0)
    root = sdt.ds_root[jnp.maximum(dtree_id, 0)]

    def body(carry, sm):
        node, origin, scale, done = carry
        sums, kids = _unpack(sdt.qs_pack[node])
        top_left, top_right = sums[:, 0], sums[:, 1]
        bottom_left = sums[:, 2]
        partial = top_left + bottom_left
        total = jnp.sum(sums, axis=-1)
        degenerate = ~(total > 0)
        boundary = partial / jnp.maximum(total, 1e-38)
        go_right = sm >= boundary
        sm1 = jnp.where(
            go_right,
            (sm - boundary) / jnp.maximum(1 - boundary, 1e-38),
            sm / jnp.maximum(boundary, 1e-38),
        )
        part2 = jnp.where(go_right, total - partial, partial)
        bnd2 = jnp.where(go_right, top_right, top_left) / jnp.maximum(part2, 1e-38)
        go_down = sm1 >= bnd2
        idx = go_right.astype(jnp.int32) | (go_down.astype(jnp.int32) << 1)
        ox = jnp.where(go_right, 0.5, 0.0)
        oy = jnp.where(go_down, 0.5, 0.0)

        child = _sel4(kids, go_right, go_down)
        leaf = child < 0
        step = ~done & ~degenerate
        origin = origin + jnp.where(
            step[:, None], scale[:, None] * jnp.stack([ox, oy], -1), 0.0
        )
        scale = jnp.where(step, scale * 0.5, scale)
        node = jnp.where(step & ~leaf, child, node)
        done = done | leaf | degenerate | ~step
        return (node, origin, scale, done), None

    st = (root, jnp.zeros((L, 2), jnp.float32), jnp.ones(L, jnp.float32),
          jnp.zeros(L, bool))
    (node, origin, scale, done), _ = jax.lax.scan(
        body, st, u[:, :sdt.q_depth].T
    )
    # final jitter inside the chosen cell (leaf 'origin + 0.5*next2D()')
    p = origin + scale[:, None] * u[:, MAX_Q_DEPTH : MAX_Q_DEPTH + 2]
    p = jnp.clip(p, 0.0, 1.0)
    p = jnp.where(uniform[:, None], u[:, MAX_Q_DEPTH : MAX_Q_DEPTH + 2], p)
    return canonical_to_dir(p)


def sample_pdf_dir_ref(sdt: SDTreeArrays, dtree_id, u, is_point, p_point):
    """One fused walk over the frozen sampling pool serving BOTH halves
    of the one-sample MIS mixture (guided_path.cpp:1647-1692):
    tree-sampled lanes (~is_point) run the conditional-CDF walk of
    DTree::sample (:257-301) while bsdf-sampled lanes (is_point) run
    the point descent of DTree::pdf (:232-245) at p_point (the
    canonical map of their bsdf-sampled direction). Both walks gather
    the same packed row per level, so fusing them removes one full
    sequential gather chain per bounce — on TPU the per-level row
    gather IS the cost of a guided pass (see the traversal cost model
    in STATUS.md), making this a ~2x lever on guided sampling.

    Returns (direction [L,3], pdf [L]) where direction is the sampled
    one for tree lanes (garbage for point lanes — callers select) and
    pdf is the solid-angle mixture-component pdf of each lane's CHOSEN
    direction: identical to pdf_dir(sampled direction) for tree lanes
    (the walk factors telescope to the same product) and to
    pdf_dir(p_point's direction) for point lanes."""
    L = dtree_id.shape[0]
    mean = (sdt.ds_sum[dtree_id] * INV_FOURPI
            / jnp.maximum(sdt.ds_statw[dtree_id], 1e-38))
    uniform = ~(mean > 0) | (sdt.ds_statw[dtree_id] <= 0)
    root = sdt.ds_root[jnp.maximum(dtree_id, 0)]

    def body(carry, sm):
        node, p, origin, scale, acc, done, dead = carry
        sums, kids = _unpack(sdt.qs_pack[node])
        total = jnp.sum(sums, axis=-1)
        degenerate = ~(total > 0)
        # conditional-CDF choice (tree lanes)
        top_left, top_right = sums[:, 0], sums[:, 1]
        bottom_left = sums[:, 2]
        partial = top_left + bottom_left
        boundary = partial / jnp.maximum(total, 1e-38)
        go_right = sm >= boundary
        sm1 = jnp.where(
            go_right,
            (sm - boundary) / jnp.maximum(1 - boundary, 1e-38),
            sm / jnp.maximum(boundary, 1e-38),
        )
        part2 = jnp.where(go_right, total - partial, partial)
        bnd2 = jnp.where(go_right, top_right, top_left) / jnp.maximum(
            part2, 1e-38)
        go_down = sm1 >= bnd2
        # point choice (bsdf lanes)
        bx = jnp.where(is_point, p[..., 0] >= 0.5, go_right)
        by = jnp.where(is_point, p[..., 1] >= 0.5, go_down)
        s_q = _sel4(sums, bx, by)
        child = _sel4(kids, bx, by)
        factor = jnp.where(s_q > 0,
                           4.0 * s_q / jnp.maximum(total, 1e-38), 0.0)
        _, p2 = _quad_index(p)
        leaf = child < 0
        step = ~done & ~degenerate
        acc = jnp.where(step, acc * factor, acc)
        dead = dead | (~done & degenerate)
        ox = jnp.where(bx, 0.5, 0.0)
        oy = jnp.where(by, 0.5, 0.0)
        origin = origin + jnp.where(
            step[:, None], scale[:, None] * jnp.stack([ox, oy], -1), 0.0)
        scale = jnp.where(step, scale * 0.5, scale)
        node = jnp.where(step & ~leaf, child, node)
        p = jnp.where(step[..., None], p2, p)
        done = done | leaf | degenerate
        return (node, p, origin, scale, acc, done, dead), None

    st = (root, p_point, jnp.zeros((L, 2), jnp.float32),
          jnp.ones(L, jnp.float32), jnp.ones(L, jnp.float32),
          jnp.zeros(L, bool), jnp.zeros(L, bool))
    (_, _, origin, scale, acc, _, dead), _ = jax.lax.scan(
        body, st, u[:, :sdt.q_depth].T)
    pdf = jnp.where(dead, 0.0, acc * INV_FOURPI)
    pdf = jnp.where(uniform, INV_FOURPI, pdf)
    u2 = u[:, MAX_Q_DEPTH:MAX_Q_DEPTH + 2]
    pfin = jnp.clip(origin + scale[:, None] * u2, 0.0, 1.0)
    pfin = jnp.where(uniform[:, None], u2, pfin)
    return canonical_to_dir(pfin), pdf


def _sel4cols(row, base, stride, bx, by):
    """Select row[:, base + stride*(bx | by<<1)] branchlessly."""
    lo = jnp.where(bx, row[:, base + stride], row[:, base])
    hi = jnp.where(bx, row[:, base + 3 * stride], row[:, base + 2 * stride])
    return jnp.where(by, hi, lo)


def sample_pdf_dir(sdt: SDTreeArrays, dtree_id, u, is_point, p_point,
                   root=None, uniform=None):
    """The fused sample+pdf mixture walk of sample_pdf_dir_ref, but over
    the 2-level packed table qs_pack2: one [L,52] row gather descends
    TWO quadtree levels (row = own child sums, per-child grandchild
    sums, rest-nodes + consumed/done meta for both choices), halving
    the sequential gather chain that is the entire cost of guided
    sampling on TPU. Level-by-level semantics match sample_pdf_dir_ref
    exactly (oracle-tested): the conditional-CDF choice for tree lanes
    / point descent for bsdf lanes, factor accumulation, degenerate
    and leaf stalls.

    root/uniform: optionally precomputed via dtree_meta (one gather)
    to avoid re-gathering ds_root/ds_sum/ds_statw here."""
    L = dtree_id.shape[0]
    if uniform is None:
        mean = (sdt.ds_sum[dtree_id] * INV_FOURPI
                / jnp.maximum(sdt.ds_statw[dtree_id], 1e-38))
        uniform = ~(mean > 0) | (sdt.ds_statw[dtree_id] <= 0)
    if root is None:
        root = sdt.ds_root[jnp.maximum(dtree_id, 0)]

    def level(sums4, sm, p, is_pt):
        """One level's choice + factor from its 4 child sums. Returns
        (bx, by, factor, degenerate, rescaled p)."""
        total = jnp.sum(sums4, axis=-1)
        degenerate = ~(total > 0)
        top_left, top_right = sums4[:, 0], sums4[:, 1]
        bottom_left = sums4[:, 2]
        partial = top_left + bottom_left
        boundary = partial / jnp.maximum(total, 1e-38)
        go_right = sm >= boundary
        sm1 = jnp.where(
            go_right,
            (sm - boundary) / jnp.maximum(1 - boundary, 1e-38),
            sm / jnp.maximum(boundary, 1e-38),
        )
        part2 = jnp.where(go_right, total - partial, partial)
        bnd2 = jnp.where(go_right, top_right, top_left) / jnp.maximum(
            part2, 1e-38)
        go_down = sm1 >= bnd2
        bx = jnp.where(is_pt, p[..., 0] >= 0.5, go_right)
        by = jnp.where(is_pt, p[..., 1] >= 0.5, go_down)
        s_q = _sel4(sums4, bx, by)
        factor = jnp.where(s_q > 0,
                           4.0 * s_q / jnp.maximum(total, 1e-38), 0.0)
        _, p2 = _quad_index(p)
        return bx, by, factor, degenerate, p2

    def body(carry, sm2):
        node, p, origin, scale, acc, done, dead = carry
        row = sdt.qs_pack2[node]  # [L, 52]
        sums_n = row[:, :4]
        # ---- level A
        bxA, byA, factorA, degA, pA = level(sums_n, sm2[0], p, is_point)
        stepA = ~done & ~degA
        acc = jnp.where(stepA, acc * factorA, acc)
        dead = dead | (~done & degA)
        oxA = jnp.where(bxA, 0.5, 0.0)
        oyA = jnp.where(byA, 0.5, 0.0)
        origin = origin + jnp.where(
            stepA[:, None], scale[:, None] * jnp.stack([oxA, oyA], -1), 0.0)
        scale = jnp.where(stepA, scale * 0.5, scale)
        p = jnp.where(stepA[:, None], pA, p)
        # ---- level B: grandchild sums of the chosen child
        sums_c = jnp.stack(
            [_sel4cols(row, 4 + i, 4, bxA, byA) for i in range(4)], -1)
        bxB, byB, factorB, degB, pB = level(sums_c, sm2[1], p, is_point)
        # packed topology: rest-node + meta for the (qA, qB) slot
        rest16 = jax.lax.bitcast_convert_type(row[:, 20:36], jnp.int32)
        meta16 = jax.lax.bitcast_convert_type(row[:, 36:52], jnp.int32)
        bits = [bxA, byA, bxB, byB]  # slot = qA + 4*qB, q = bx | by<<1
        rest = _wheretree([rest16[:, i] for i in range(16)], bits)
        meta = _wheretree([meta16[:, i] for i in range(16)], bits)
        cons2 = (meta & 3) >= 2
        metadone = (meta >> 2) & 1
        stepB = stepA & cons2 & ~degB
        acc = jnp.where(stepB, acc * factorB, acc)
        dead = dead | (stepA & cons2 & degB)
        oxB = jnp.where(bxB, 0.5, 0.0)
        oyB = jnp.where(byB, 0.5, 0.0)
        origin = origin + jnp.where(
            stepB[:, None], scale[:, None] * jnp.stack([oxB, oyB], -1), 0.0)
        scale = jnp.where(stepB, scale * 0.5, scale)
        p = jnp.where(stepB[:, None], pB, p)
        node = jnp.where(stepA, rest, node)
        done = done | degA | (stepA & ((metadone > 0) | degB))
        return (node, p, origin, scale, acc, done, dead), None

    n_steps = (sdt.q_depth + Q_PACK_K - 1) // Q_PACK_K
    sm = u[:, :n_steps * Q_PACK_K].T.reshape(n_steps, Q_PACK_K, L)
    st = (root, p_point, jnp.zeros((L, 2), jnp.float32),
          jnp.ones(L, jnp.float32), jnp.ones(L, jnp.float32),
          jnp.zeros(L, bool), jnp.zeros(L, bool))
    (_, _, origin, scale, acc, _, dead), _ = jax.lax.scan(body, st, sm)
    pdf = jnp.where(dead, 0.0, acc * INV_FOURPI)
    pdf = jnp.where(uniform, INV_FOURPI, pdf)
    u2 = u[:, MAX_Q_DEPTH:MAX_Q_DEPTH + 2]
    pfin = jnp.clip(origin + scale[:, None] * u2, 0.0, 1.0)
    pfin = jnp.where(uniform[:, None], u2, pfin)
    return canonical_to_dir(pfin), pdf


def pdf_dir2(sdt: SDTreeArrays, dtree_id, d_world, root=None,
             uniform=None):
    """pdf_dir over the 2-level packed table (for NEE lanes: the
    point-descent-only walk). Semantics match pdf_dir exactly."""
    p = dir_to_canonical(d_world)
    L = p.shape[0]
    ones = jnp.ones(L, bool)
    u_dummy = jnp.zeros((L, MAX_Q_DEPTH + 2), jnp.float32)
    _, pdf = sample_pdf_dir(sdt, dtree_id, u_dummy, ones, p,
                            root=root, uniform=uniform)
    return pdf


def sampling_fraction(sdt: SDTreeArrays, dtree_id):
    """logistic(variable) (guided_path.cpp:659-670)."""
    var = sdt.opt_var[jnp.maximum(dtree_id, 0)]
    return jnp.where(dtree_id >= 0, jax.nn.sigmoid(var), 0.5)


# ---------------------------------------------------------------------------
# Box-filter splats (bounded per-lane stacks)
# ---------------------------------------------------------------------------

D_STACK = 48  # directional box-filter stack capacity per record
D_TARGETS = 32  # max leaf quadrants one record can splat into (box filter)
S_STACK = 24  # spatial box-filter stack capacity per record
S_TARGETS = 16  # max spatial leaves one record can splat into


def _depth_at(q_child, root, p, n_steps=MAX_Q_DEPTH):
    """Leaf depth (root leaf = 1) at canonical point p (DTree::depthAt)."""

    def body(carry, _):
        node, p, depth, done = carry
        row = q_child[node]
        q, p2 = _quad_index(p)
        child = _sel4(row, p[..., 0] >= 0.5, p[..., 1] >= 0.5)
        leaf = child < 0
        return (
            jnp.where(done | leaf, node, child),
            jnp.where((done | leaf)[..., None], p, p2),
            jnp.where(done, depth, depth + 1),
            done | leaf,
        ), None

    L = p.shape[0]
    st = (root, p, jnp.zeros(L, jnp.int32), jnp.zeros(L, bool))
    (_, _, depth, _), _ = jax.lax.scan(body, st, None, length=n_steps)
    return depth


def dtree_box_splat(q_sum_flat, q_child, root, pc, amount, depth):
    """QuadTreeNode::record area-overlap splat (guided_path.cpp:322-338 via
    DTree::recordIrradiance :403-410): a box of the leaf-cell size centered
    at pc, value density amount/size^2, distributed over overlapping leaf
    quadrants. Bounded explicit stack per record.

    The walk COLLECTS up to D_TARGETS (quadrant, weight) pairs per
    record and commits them with ONE sort-based bincount afterwards —
    an earlier version scatter-added inside the while body, and TPU
    scatter with duplicate indices serializes so badly that refined
    trees at full record counts tripped the device watchdog (observed
    as a TPU kernel fault on the cbox-improved config). Overflowing
    targets beyond D_TARGETS are dropped (the reference recurses
    exactly; the deviation loses a negligible fraction of a record's
    boundary energy)."""
    L = pc.shape[0]
    size = 0.5**depth.astype(jnp.float32)
    value = amount / jnp.maximum(size * size, 1e-38)
    b_lo = pc - size[..., None] / 2
    b_hi = pc + size[..., None] / 2

    # stack entries: node, cell origin (x,y), cell size
    st_node = jnp.zeros((L, D_STACK), jnp.int32)
    st_ox = jnp.zeros((L, D_STACK), jnp.float32)
    st_oy = jnp.zeros((L, D_STACK), jnp.float32)
    st_sz = jnp.zeros((L, D_STACK), jnp.float32)
    sp = jnp.ones(L, jnp.int32)
    st_node = st_node.at[:, 0].set(root)
    st_sz = st_sz.at[:, 0].set(1.0)
    lanes = jnp.arange(L)
    tgt_idx = jnp.zeros((L, D_TARGETS), jnp.int32)
    tgt_val = jnp.zeros((L, D_TARGETS), jnp.float32)
    n_t = jnp.zeros(L, jnp.int32)

    def cond(state):
        return jnp.any(state[0] > 0)

    def body(state):
        sp, st_node, st_ox, st_oy, st_sz, tgt_idx, tgt_val, n_t = state
        act = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = st_node[lanes, top]
        ox = st_ox[lanes, top]
        oy = st_oy[lanes, top]
        sz = st_sz[lanes, top]
        sp = jnp.where(act, sp - 1, sp)

        half = sz * 0.5
        for q in range(4):
            cx = ox + (half if q & 1 else 0.0)
            cy = oy + (half if q & 2 else 0.0)
            wx = jnp.maximum(
                jnp.minimum(b_hi[:, 0], cx + half) - jnp.maximum(b_lo[:, 0], cx), 0.0
            )
            wy = jnp.maximum(
                jnp.minimum(b_hi[:, 1], cy + half) - jnp.maximum(b_lo[:, 1], cy), 0.0
            )
            w = wx * wy
            child = q_child[node, q]
            leaf = child < 0
            add_here = act & leaf & (w > 0) & (n_t < D_TARGETS)
            tslot = jnp.minimum(n_t, D_TARGETS - 1)
            tgt_idx = tgt_idx.at[lanes, tslot].set(
                jnp.where(add_here, node * 4 + q, tgt_idx[lanes, tslot]))
            tgt_val = tgt_val.at[lanes, tslot].set(
                jnp.where(add_here, value * w, tgt_val[lanes, tslot]))
            n_t = jnp.where(add_here, n_t + 1, n_t)
            push = act & ~leaf & (w > 0) & (sp < D_STACK)
            slot = jnp.minimum(sp, D_STACK - 1)
            st_node = st_node.at[lanes, slot].set(
                jnp.where(push, child, st_node[lanes, slot])
            )
            st_ox = st_ox.at[lanes, slot].set(jnp.where(push, cx, st_ox[lanes, slot]))
            st_oy = st_oy.at[lanes, slot].set(jnp.where(push, cy, st_oy[lanes, slot]))
            st_sz = st_sz.at[lanes, slot].set(jnp.where(push, half, st_sz[lanes, slot]))
            sp = jnp.where(push, sp + 1, sp)
        return sp, st_node, st_ox, st_oy, st_sz, tgt_idx, tgt_val, n_t

    state = (sp, st_node, st_ox, st_oy, st_sz, tgt_idx, tgt_val, n_t)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, _, tgt_idx, tgt_val, n_t = state

    from ..ops.reduce import bincount_add

    return bincount_add(q_sum_flat, tgt_idx.reshape(-1), tgt_val.reshape(-1))


def stree_box_targets(sdt: SDTreeArrays, p_world, voxel):
    """Spatial box filter targets (STreeNode::record, guided_path.cpp:
    823-839,935-943): the box [p - voxel/2, p + voxel/2] (normalized) is
    intersected against the spatial leaves; returns up to S_TARGETS
    (dtree_id, overlap_volume_fraction) pairs per record, where the weight
    is overlap / voxelVolume (the statWeight /= volume rule)."""
    L = p_world.shape[0]
    x = normalize_pos(sdt, p_world)
    v = voxel / sdt.aabb_size
    b_lo = x - v / 2
    b_hi = x + v / 2
    vol = jnp.maximum(v[:, 0] * v[:, 1] * v[:, 2], 1e-38)

    tgt_id = jnp.full((L, S_TARGETS), -1, jnp.int32)
    tgt_w = jnp.zeros((L, S_TARGETS), jnp.float32)
    n_tgt = jnp.zeros(L, jnp.int32)

    st_node = jnp.zeros((L, S_STACK), jnp.int32)
    st_lo = jnp.zeros((L, S_STACK, 3), jnp.float32)
    st_sz = jnp.ones((L, S_STACK, 3), jnp.float32)
    st_depth = jnp.zeros((L, S_STACK), jnp.int32)
    sp = jnp.ones(L, jnp.int32)
    lanes = jnp.arange(L)

    def cond(state):
        return jnp.any(state[0] > 0)

    def body(state):
        sp, st_node, st_lo, st_sz, st_depth, tgt_id, tgt_w, n_tgt = state
        act = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = st_node[lanes, top]
        lo = st_lo[lanes, top]
        sz = st_sz[lanes, top]
        depth = st_depth[lanes, top]
        sp = jnp.where(act, sp - 1, sp)

        ov = jnp.prod(
            jnp.maximum(jnp.minimum(b_hi, lo + sz) - jnp.maximum(b_lo, lo), 0.0),
            axis=-1,
        )
        dtree = sdt.s_dtree[node]
        leaf = dtree >= 0
        emit = act & leaf & (ov > 0) & (n_tgt < S_TARGETS)
        slot = jnp.minimum(n_tgt, S_TARGETS - 1)
        tgt_id = tgt_id.at[lanes, slot].set(
            jnp.where(emit, dtree, tgt_id[lanes, slot])
        )
        tgt_w = tgt_w.at[lanes, slot].set(
            jnp.where(emit, ov / vol, tgt_w[lanes, slot])
        )
        n_tgt = jnp.where(emit, n_tgt + 1, n_tgt)

        axis = depth % 3
        half = jnp.where(jnp.arange(3)[None, :] == axis[:, None], sz / 2, sz)
        for c in range(2):
            clo = jnp.where(
                (jnp.arange(3)[None, :] == axis[:, None]) & (c == 1),
                lo + half, lo,
            )
            cov = jnp.prod(
                jnp.maximum(
                    jnp.minimum(b_hi, clo + half) - jnp.maximum(b_lo, clo), 0.0
                ),
                axis=-1,
            )
            push = act & ~leaf & (cov > 0) & (sp < S_STACK)
            slot2 = jnp.minimum(sp, S_STACK - 1)
            child = sdt.s_child[node, c]
            st_node = st_node.at[lanes, slot2].set(
                jnp.where(push, child, st_node[lanes, slot2])
            )
            st_lo = st_lo.at[lanes, slot2].set(
                jnp.where(push[:, None], clo, st_lo[lanes, slot2])
            )
            st_sz = st_sz.at[lanes, slot2].set(
                jnp.where(push[:, None], half, st_sz[lanes, slot2])
            )
            st_depth = st_depth.at[lanes, slot2].set(
                jnp.where(push, depth + 1, st_depth[lanes, slot2])
            )
            sp = jnp.where(push, sp + 1, sp)
        return sp, st_node, st_lo, st_sz, st_depth, tgt_id, tgt_w, n_tgt

    state = (sp, st_node, st_lo, st_sz, st_depth, tgt_id, tgt_w, n_tgt)
    state = jax.lax.while_loop(cond, body, state)
    return state[5], state[6]


# ---------------------------------------------------------------------------
# Learned bsdfSamplingFraction (AdamOptimizer, guided_path.cpp:69-133,655-697)
# ---------------------------------------------------------------------------
#
# The reference steps Adam once per ~2 units of statistical weight (its
# batchSize=1 accumulator fires when the accumulated weight EXCEEDS 1 —
# every second unit-weight record) and re-evaluates the loss gradient at
# the CURRENT variable for every record. A single step per splat batch
# with the batch-mean gradient — the previous implementation here —
# freezes the optimizer at production batch sizes: the oracle in
# tests/test_estimator_oracle.py shows the reference fraction moving
# 0.50 -> 0.85 over a 2000-record stream while one-step batching stays
# at 0.502, making the kl/var losses inert.
#
# TPU-native redesign. The per-record loss gradient of both losses is a
# RATIONAL function of the sampling fraction f (x = bsdfPdf - dTreePdf,
# c = dTreePdf / x, mix = x*(c+f)):
#
#   dl/df (kl)  = -(product / woPdf)        * 1/(c + f)
#   dl/df (var) = -(product^2 / (woPdf*x))  * 1/(c + f)^2
#
# so per-(leaf, c-bucket) coefficient sums S0 (+ the first-order moment
# S1 = sum coeff*(c - c_bucket)) are sufficient statistics to
# re-evaluate the batch-mean gradient at ANY f: 31 log-spaced buckets
# per sign of x (c >= 0 for x > 0; c <= -1 for x < 0, so c+f never
# crosses 0 for f in (0,1)). The chain then runs as an ADAM_ROUNDS-round
# scan over the leaf table: round t advances each leaf by its share of
# k = floor(weight/2) reference steps using the constant-gradient
# closed form for (m1, m2, sum of m1_t), with the gradient re-read from
# the bucket stats at the leaf's CURRENT variable — preserving the
# reference chain's step count AND its self-limiting feedback (the
# gradient shrinks as f moves toward the optimum, which a single
# batch-start gradient cannot see). The gradient at the batch-start
# variable uses the exact per-record values (the bucket basis only
# supplies the DELTA to a moved variable), so single-record batches
# reproduce the reference chain exactly; the weight remainder (< 2) and
# its gradient carry across batches in opt_bgrad/opt_bweight like the
# reference's batchGradient/batchAccumulation.

ADAM_B = 62       # c-buckets: 31 log-spaced per sign of x
ADAM_ROUNDS = 64  # gradient re-evaluation rounds per splat batch
_ADAM_LO, _ADAM_SPAN = -3.0, 7.0  # log10(c + 1e-3) bucket range


def _adam_bucket_centers():
    import numpy as np

    i = np.arange(31)
    z = _ADAM_LO + (i + 0.5) * (_ADAM_SPAN / 31)
    pos = 10.0**z - 1e-3
    # module-level NUMPY constant: caching a jnp array created inside a
    # traced context leaks the trace; jnp.asarray per call is a no-op
    # constant embed
    return np.concatenate([pos, -(pos + 1.0)]).astype(np.float32)


_ADAM_CHAT = _adam_bucket_centers()  # [ADAM_B] bucket-center c values


def _adam_bucket_index(c):
    """Bucket id for c = dTreePdf/x: 0..30 for c >= 0, 31..61 for
    c <= -1 (u = -c-1 >= 0 shares the log mapping)."""
    neg = c < 0
    u = jnp.where(neg, -c - 1.0, c)
    z = jnp.log10(jnp.maximum(u, 0.0) + 1e-3)
    idx = jnp.clip(((z - _ADAM_LO) * (31 / _ADAM_SPAN)).astype(jnp.int32),
                   0, 30)
    return jnp.where(neg, idx + 31, idx)


def _adam_chain(sdt, dtree_id, product, wo_pdf, bsdf_pdf, dtree_pdf,
                stat_w, valid_e, learn_fraction):
    """Returns the updated (opt_var, opt_m1, opt_m2, opt_iter,
    opt_bgrad, opt_bweight) leaf arrays after consuming this record
    batch with reference step cadence (see block comment above)."""
    chat = jnp.asarray(_ADAM_CHAT)
    is_kl = learn_fraction == "kl"
    rp = 1.0 if is_kl else 2.0
    T = sdt.opt_var.shape[0]
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8

    var0 = sdt.opt_var[dtree_id]
    frac0 = jax.nn.sigmoid(var0)
    x = bsdf_pdf - dtree_pdf
    mix0 = frac0 * bsdf_pdf + (1 - frac0) * dtree_pdf
    # exact per-record gradient at the batch-start variable
    # (optimizeBsdfSamplingFraction, guided_path.cpp:672-697)
    ratio0 = (product / jnp.maximum(mix0, 1e-38)) ** rp
    dl_dv0 = (-ratio0 / jnp.maximum(wo_pdf, 1e-38) * x
              * frac0 * (1 - frac0) + 0.01 * var0)
    opt_ok = valid_e & (product > 0) & jnp.isfinite(dl_dv0)
    g0 = jnp.where(opt_ok, dl_dv0 * stat_w, 0.0)
    w = jnp.where(opt_ok, stat_w, 0.0)

    # bucket statistics for the variable-moved gradient delta
    c = dtree_pdf / jnp.where(jnp.abs(x) > 1e-30, x, 1e-30)
    coeff = (product / jnp.maximum(wo_pdf, 1e-38) if is_kl
             else product * product / (jnp.maximum(wo_pdf, 1e-38)
                                       * jnp.where(jnp.abs(x) > 1e-30,
                                                   x, 1e-30)))
    stat_ok = opt_ok & (jnp.abs(x)
                        > 1e-5 * (bsdf_pdf + dtree_pdf + 1e-30))
    b_idx = _adam_bucket_index(c)
    cell = dtree_id * ADAM_B + jnp.where(stat_ok, b_idx, 0)
    cw = jnp.where(stat_ok, coeff * stat_w, 0.0)
    from ..ops.reduce import bincount_add2

    S0, S1 = bincount_add2(
        (jnp.zeros(T * ADAM_B), jnp.zeros(T * ADAM_B)), cell,
        cw, cw * (c - chat[jnp.clip(b_idx, 0, ADAM_B - 1)]))
    S0 = S0.reshape(T, ADAM_B)
    S1 = S1.reshape(T, ADAM_B)
    G0, W = bincount_add2(
        (sdt.opt_bgrad, sdt.opt_bweight), dtree_id, g0, w)

    def data_grad(f):
        """Bucket-approximated mean dl/dvariable data term at fraction
        f [T] (first-order Taylor in c around each bucket center)."""
        d = chat[None, :] + f[:, None]
        d = jnp.where(jnp.abs(d) > 1e-4, d, jnp.where(d < 0, -1e-4, 1e-4))
        if is_kl:
            p0 = 1.0 / d
            p1 = -p0 * p0
        else:
            p0 = 1.0 / (d * d)
            p1 = -2.0 * p0 / d
        s = -(S0 * p0 + S1 * p1).sum(-1)
        return s * f * (1 - f) / jnp.maximum(W, 1e-38)

    f0 = jax.nn.sigmoid(sdt.opt_var)
    d0 = data_grad(f0)
    k = jnp.floor(W * 0.5).astype(jnp.int32)  # reference steps to take
    q, r = k // ADAM_ROUNDS, k % ADAM_ROUNDS

    def round_step(carry, t):
        var, m1, m2, it = carry
        s = (q + (t < r)).astype(jnp.float32)
        f = jax.nn.sigmoid(var)
        g = (G0 / jnp.maximum(W, 1e-38) + (data_grad(f) - d0)
             + 0.01 * (var - sdt.opt_var))
        a1 = b1**s
        a2 = b2**s
        m1n = a1 * m1 + (1 - a1) * g
        m2n = a2 * m2 + (1 - a2) * g * g
        # sum_{t=1..s} m1_t for the variable update (exact for the
        # constant-gradient window; equals m1n at s = 1)
        geo = b1 * (1 - a1) / (1 - b1)
        summ1 = m1 * geo + g * (s - geo)
        it_mid = it.astype(jnp.float32) + (s + 1) * 0.5
        alr = lr * jnp.sqrt(1 - b2**it_mid) / (1 - b1**it_mid)
        varn = jnp.clip(
            var - alr * summ1 / (jnp.sqrt(jnp.maximum(m2n, 0.0)) + eps),
            -20.0, 20.0)
        do = s > 0
        return (jnp.where(do, varn, var), jnp.where(do, m1n, m1),
                jnp.where(do, m2n, m2),
                it + s.astype(jnp.int32)), None

    (var, m1, m2, it), _ = jax.lax.scan(
        round_step, (sdt.opt_var, sdt.opt_m1, sdt.opt_m2, sdt.opt_iter),
        jnp.arange(ADAM_ROUNDS))

    # remainder (< 2 weight) carries to the next batch with its gradient
    # evaluated at the final variable (the reference's partial
    # batchGradient holds the most recent records' gradients likewise)
    rem_w = W - 2.0 * k.astype(jnp.float32)
    f = jax.nn.sigmoid(var)
    g_end = (G0 / jnp.maximum(W, 1e-38) + (data_grad(f) - d0)
             + 0.01 * (var - sdt.opt_var))
    any_w = W > 0
    rem_g = jnp.where(any_w, g_end * rem_w, 0.0)
    return (var, m1, m2, it, rem_g, jnp.where(any_w, rem_w, 0.0))


# ---------------------------------------------------------------------------
# Splatting (training records -> building pool)
# ---------------------------------------------------------------------------

def splat_records(sdt: SDTreeArrays, rec, spatial_filter="nearest",
                  directional_filter="nearest", learn_fraction=None,
                  u_jitter=None):
    """Accumulate a flat batch of DTreeRecords into the building pool.

    rec: dict of flat arrays
      p [N,3] world position, d [N,3] direction,
      radiance [N] (mean localRadiance), product [N],
      wo_pdf, bsdf_pdf, dtree_pdf [N], stat_weight [N],
      is_delta [N] bool, valid [N] bool, voxel [N,3] dtree voxel size
    Returns updated SDTreeArrays.

    nearest / stochastic spatial filters re-resolve the spatial leaf at the
    (jittered) position (Vertex::commit, guided_path.cpp:1742-1767);
    the box filters are handled by guiding.box_filter.

    FAST PATH: when the tracer precomputed the splat targets at shade
    time (rec carries "sp_id" and "cell" / "pc"+"cell_depth" — see
    regen.shade_hit), the per-record spatial lookup and directional
    descent are skipped entirely: those tree walks over the stacked
    record stream (N = K x L rows, mostly invalid) were the measured
    bottleneck of every training pass — ~20 sequential gather rounds at
    2M+ lanes per splat — while the same walks at shade time run once
    per REAL vertex at wavefront width. The splat then reduces to
    sort-based bincounts.
    """
    valid = rec["valid"]
    stat_w0 = jnp.where(valid, rec["stat_weight"], 0.0)
    irradiance0 = rec["radiance"] / jnp.maximum(rec["wo_pdf"], 1e-38)
    fast = "sp_id" in rec and spatial_filter != "box"

    if spatial_filter == "box":
        # volume-overlap splat to every overlapping spatial leaf
        tgt_ids, tgt_w = stree_box_targets(sdt, rec["p"], rec["voxel"])
        K = tgt_ids.shape[1]
        dtree_id = tgt_ids.reshape(-1)
        factor = tgt_w.reshape(-1)
        rep = lambda a: jnp.repeat(a, K, axis=0)
        valid_e = rep(valid) & (dtree_id >= 0) & (factor > 0)
        stat_w = rep(stat_w0) * factor
        irradiance = rep(irradiance0)
        d = rep(rec["d"])
        bsdf_pdf = rep(rec["bsdf_pdf"])
        dtree_pdf = rep(rec["dtree_pdf"])
        wo_pdf = rep(rec["wo_pdf"])
        product = rep(rec["product"])
        is_delta = rep(rec["is_delta"])
        dtree_id = jnp.maximum(dtree_id, 0)
    elif fast:
        # spatial leaf (incl. any stochastic jitter) resolved at shade
        dtree_id = jnp.where(valid, rec["sp_id"], 0)
        valid_e = valid
        stat_w = stat_w0
        irradiance = irradiance0
        d = None
        bsdf_pdf = rec["bsdf_pdf"]
        dtree_pdf = rec["dtree_pdf"]
        wo_pdf = rec["wo_pdf"]
        product = rec["product"]
        is_delta = rec["is_delta"]
    else:
        p = rec["p"]
        if spatial_filter == "stochastic":
            # jitter within the leaf's voxel, clip to the STree cube
            # (Vertex::commit EStochasticBox, :1746-1762)
            off = (u_jitter - 0.5) * rec["voxel"]
            p = jnp.clip(p + off, sdt.aabb_min, sdt.aabb_min + sdt.aabb_size)
        dtree_id, _ = lookup(sdt, p)
        dtree_id = jnp.where(valid, dtree_id, 0)
        valid_e = valid
        stat_w = stat_w0
        irradiance = irradiance0
        d = rec["d"]
        bsdf_pdf = rec["bsdf_pdf"]
        dtree_pdf = rec["dtree_pdf"]
        wo_pdf = rec["wo_pdf"]
        product = rec["product"]
        is_delta = rec["is_delta"]

    rec_ok = valid_e & ~is_delta & jnp.isfinite(stat_w) & (stat_w > 0)
    irr_ok = rec_ok & jnp.isfinite(irradiance) & (irradiance > 0)

    from ..ops.reduce import bincount_add

    # statistical weight always accumulates for non-delta records (:395-397)
    db_statw = bincount_add(
        sdt.db_statw, dtree_id, jnp.where(rec_ok, stat_w, 0.0)
    )

    amount = jnp.where(irr_ok, irradiance * stat_w, 0.0)
    if directional_filter == "box" and fast:
        qb_flat = bincount_add(
            sdt.qb_sum.reshape(-1), rec["cell4"].reshape(-1),
            (amount[:, None] * rec["w4"]).reshape(-1))
    elif directional_filter == "box":
        # bounded 4-corner box targets over the packed building-tree
        # topology — same estimator as the machine-mode precompute
        # (oracle-tested exact on refined trees; internal-cell residuals
        # push down uniformly at build, host._pushdown_residuals). The
        # legacy dynamic-stack walk (dtree_box_splat) blew up both the
        # TPU watchdog (unbounded while_loop on refined trees) and the
        # program size; kept only as the test referee.
        pc = dir_to_canonical(d)
        root = sdt.db_root[dtree_id]
        _, _, depth = descend_cell_packed(sdt.qb_pack2, root, pc, None,
                                          sdt.q_depth)
        cell4, w4 = dtree_box_targets4_packed(sdt.qb_pack2, root, pc,
                                              depth, sdt.q_depth)
        qb_flat = bincount_add(
            sdt.qb_sum.reshape(-1), cell4.reshape(-1),
            (amount[:, None] * w4).reshape(-1))
    elif fast:
        qb_flat = bincount_add(sdt.qb_sum.reshape(-1), rec["cell"], amount)
    else:
        root = sdt.db_root[dtree_id]
        pc = dir_to_canonical(d)
        node, quad, _ = descend_to_leaf(sdt.qb_child, root, pc, sdt.q_depth)
        qb_flat = bincount_add(sdt.qb_sum.reshape(-1), node * 4 + quad, amount)

    out = {f: getattr(sdt, f) for f in SDTreeArrays.FIELDS}
    out["db_statw"] = db_statw
    out["qb_sum"] = qb_flat.reshape(sdt.qb_sum.shape)

    # --- learned bsdfSamplingFraction: Adam on the KL/variance loss -------
    if learn_fraction is not None:
        for f, v in zip(
            ("opt_var", "opt_m1", "opt_m2", "opt_iter", "opt_bgrad",
             "opt_bweight"),
            _adam_chain(sdt, dtree_id, product, wo_pdf, bsdf_pdf,
                        dtree_pdf, stat_w, valid_e, learn_fraction),
        ):
            out[f] = v

    # preserve the depth class (pytree aux): splat output must carry the
    # same static metadata as its input so it can flow through scan
    return SDTreeArrays(s_depth=sdt.s_depth, q_depth=sdt.q_depth, **out)
