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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.warp import INV_FOURPI, canonical_to_dir, dir_to_canonical

MAX_S_DEPTH = 64  # spatial descent bound
MAX_Q_DEPTH = 20  # quadtree depth cap (DTree::reset maxDepth, :1112)


class SDTreeArrays:
    FIELDS = (
        "aabb_min", "aabb_size",
        "s_child", "s_dtree",
        # packed descent tables (one gather per level): s_pack = [child0,
        # child1, dtree, pad] int32; q*_pack = [sum0..3, bitcast(child0..3)]
        "s_pack", "qs_pack",
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


def lookup(sdt: SDTreeArrays, p_world):
    """Find the spatial leaf containing each point.

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
        pc = dir_to_canonical(d)
        root = sdt.db_root[dtree_id]
        depth = _depth_at(sdt.qb_child, root, pc, sdt.q_depth)
        qb_flat = dtree_box_splat(
            sdt.qb_sum.reshape(-1), sdt.qb_child, root, pc, amount, depth
        )
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
        ratio_power = 1.0 if learn_fraction == "kl" else 2.0
        var = sdt.opt_var[dtree_id]
        frac = jax.nn.sigmoid(var)
        mix = frac * bsdf_pdf + (1 - frac) * dtree_pdf
        ratio = (product / jnp.maximum(mix, 1e-38)) ** ratio_power
        dloss_dfrac = -ratio / jnp.maximum(wo_pdf, 1e-38) * (bsdf_pdf - dtree_pdf)
        dloss_dvar = dloss_dfrac * frac * (1 - frac) + 0.01 * var
        opt_ok = valid_e & (product > 0) & jnp.isfinite(dloss_dvar)
        g = jnp.where(opt_ok, dloss_dvar * stat_w, 0.0)
        w = jnp.where(opt_ok, stat_w, 0.0)
        from ..ops.reduce import bincount_add2

        bgrad, bweight = bincount_add2(
            (sdt.opt_bgrad, sdt.opt_bweight), dtree_id, g, w
        )

        # batched Adam step (batchSize=1 in the reference -> step whenever
        # accumulated weight exceeds 1; here once per splat batch)
        do_step = bweight > 1.0
        grad = bgrad / jnp.maximum(bweight, 1e-38)
        it = sdt.opt_iter + do_step.astype(jnp.int32)
        lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
        itf = jnp.maximum(it, 1).astype(jnp.float32)
        alr = lr * jnp.sqrt(1 - b2**itf) / (1 - b1**itf)
        m1 = jnp.where(do_step, b1 * sdt.opt_m1 + (1 - b1) * grad, sdt.opt_m1)
        m2 = jnp.where(do_step, b2 * sdt.opt_m2 + (1 - b2) * grad * grad, sdt.opt_m2)
        new_var = sdt.opt_var - alr * m1 / (jnp.sqrt(jnp.maximum(m2, 0.0)) + eps)
        new_var = jnp.clip(new_var, -20.0, 20.0)
        out["opt_var"] = jnp.where(do_step, new_var, sdt.opt_var)
        out["opt_m1"] = m1
        out["opt_m2"] = m2
        out["opt_iter"] = it
        out["opt_bgrad"] = jnp.where(do_step, 0.0, bgrad)
        out["opt_bweight"] = jnp.where(do_step, 0.0, bweight)

    # preserve the depth class (pytree aux): splat output must carry the
    # same static metadata as its input so it can flow through scan
    return SDTreeArrays(s_depth=sdt.s_depth, q_depth=sdt.q_depth, **out)
