"""Host-side SD-tree topology management (numpy, between iterations).

Device passes only *accumulate* into frozen-topology pools
(guiding.sdtree); the cheap-but-sequential topology work — STree::refine
(guided_path.cpp:957-998), STreeNode::subdivide (:876-895),
DTree::reset (:456-514) and DTree::build (:520-533, QuadTreeNode::build
:346-366) — runs here once per iteration, then fresh padded pools are
uploaded. DTree reset is level-synchronous across all dtrees at once
(vectorized BFS) instead of the reference's per-tree DFS; topologies are
identical up to node numbering, and slabs stay per-dtree contiguous so
.sdt dumps keep local child indices.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .sdtree import MAX_Q_DEPTH, SDTreeArrays

UINT16_CAP = 65535  # per-dtree node cap (reference :499-503)


class HostSDTree:
    def __init__(self, aabb_min, aabb_max):
        # cube extension (STree ctor, guided_path.cpp:855-859)
        size = np.asarray(aabb_max, np.float64) - np.asarray(aabb_min, np.float64)
        self.aabb_min = np.asarray(aabb_min, np.float64)
        self.aabb_size = float(size.max())

        # spatial tree
        self.s_child = np.full((1, 2), -1, np.int64)
        self.s_dtree = np.array([0], np.int64)  # leaf -> dtree row

        # one dtree, one root node, per pool
        self.b_off = np.array([0], np.int64)
        self.b_cnt = np.array([1], np.int64)
        self.qb_sum = np.zeros((1, 4), np.float64)
        self.qb_child = np.full((1, 4), -1, np.int64)

        self.s_off = np.array([0], np.int64)
        self.s_cnt = np.array([1], np.int64)
        self.qs_sum = np.zeros((1, 4), np.float64)
        self.qs_child = np.full((1, 4), -1, np.int64)

        self.statw_b = np.zeros(1)
        self.statw_s = np.zeros(1)
        self.sum_s = np.zeros(1)
        self.maxdepth = np.ones(1, np.int64)

        self.opt_var = np.zeros(1)
        self.opt_m1 = np.zeros(1)
        self.opt_m2 = np.zeros(1)
        self.opt_iter = np.zeros(1, np.int64)
        self.opt_bgrad = np.zeros(1)
        self.opt_bweight = np.zeros(1)

    # -- accounting ----------------------------------------------------------

    @property
    def num_dtrees(self):
        return len(self.b_off)

    def approx_memory_mb(self):
        nodes = len(self.qb_sum) + len(self.qs_sum)
        return nodes * (4 * 4 + 4 * 2) / 1e6  # sums f32 + children u16

    # -- device sync ----------------------------------------------------------

    def pull(self, sdt: SDTreeArrays):
        """Copy device accumulation back (building sums, statweights, Adam)."""
        qb = np.asarray(sdt.qb_sum, np.float64)
        self.qb_sum = qb[: len(self.qb_sum)]
        self.statw_b = np.asarray(sdt.db_statw, np.float64)[: self.num_dtrees]
        for f in ("opt_var", "opt_m1", "opt_m2", "opt_bgrad", "opt_bweight"):
            setattr(self, f, np.asarray(getattr(sdt, f), np.float64)[: self.num_dtrees])
        self.opt_iter = np.asarray(sdt.opt_iter, np.int64)[: self.num_dtrees]

    def push(self, pad_pow2=True, min_caps=None, fixed_depths=None) -> SDTreeArrays:
        """Upload as padded device arrays.

        min_caps / fixed_depths keep array shapes and descent trip counts
        STABLE across refinement iterations: every distinct shape or trip
        count is a fresh XLA compile (~25-30 s on the TPU tunnel), which
        dominated whole renders when the tree grew through power-of-two
        buckets each iteration. The guided driver passes generous fixed
        capacities so the whole render compiles once per config.
        """
        caps = min_caps or {}

        def pad_to(n, mini=256):
            if not pad_pow2:
                return n
            p = mini
            while p < n:
                p *= 2
            return p

        S = pad_to(len(self.s_child), caps.get("S", 256))
        T = pad_to(self.num_dtrees, caps.get("T", 256))
        Qb = pad_to(len(self.qb_sum), caps.get("Q", 256))
        Qs = pad_to(len(self.qs_sum), caps.get("Q", 256))

        def pad(a, n, fill=0):
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        f32 = lambda a, n, fill=0: jnp.asarray(pad(a, n, fill), jnp.float32)
        i32 = lambda a, n, fill=0: jnp.asarray(pad(a, n, fill).astype(np.int32))

        # packed descent tables + static trip counts (rounded to 4)
        s_pack = np.zeros((len(self.s_child), 4), np.int64)
        s_pack[:, 0] = self.s_child[:, 0]
        s_pack[:, 1] = self.s_child[:, 1]
        s_pack[:, 2] = self.s_dtree
        qs_pack = np.zeros((len(self.qs_sum), 8), np.float32)
        qs_pack[:, :4] = self.qs_sum
        qs_pack[:, 4:] = self.qs_child.astype(np.int32).view(np.float32)

        def round4(x, cap):
            return int(min(((max(int(x), 1) + 3) // 4) * 4, cap))

        from .sdtree import MAX_Q_DEPTH, MAX_S_DEPTH

        s_depth = round4(self._stree_depth(), MAX_S_DEPTH)
        q_depth = round4(
            max(
                int(self.maxdepth.max()) if len(self.maxdepth) else 1,
                int(self._building_depth()),
            ),
            MAX_Q_DEPTH,
        )
        if fixed_depths is not None:
            s_depth = max(s_depth, min(fixed_depths[0], MAX_S_DEPTH))
            q_depth = max(q_depth, min(fixed_depths[1], MAX_Q_DEPTH))

        return SDTreeArrays(
            s_depth=s_depth,
            q_depth=q_depth,
            aabb_min=jnp.asarray(self.aabb_min, jnp.float32),
            aabb_size=jnp.float32(self.aabb_size),
            s_child=i32(self.s_child, S, 0),
            s_dtree=i32(self.s_dtree, S, 0),
            s_pack=i32(s_pack, S, 0),
            qs_pack=f32(qs_pack, Qs, 0),
            qs_sum=f32(self.qs_sum, Qs),
            qs_child=i32(self.qs_child, Qs, -1),
            ds_root=i32(self.s_off, T),
            ds_sum=f32(self.sum_s, T),
            ds_statw=f32(self.statw_s, T),
            qb_sum=f32(self.qb_sum, Qb),
            qb_child=i32(self.qb_child, Qb, -1),
            db_root=i32(self.b_off, T),
            db_statw=f32(self.statw_b, T),
            opt_var=f32(self.opt_var, T),
            opt_m1=f32(self.opt_m1, T),
            opt_m2=f32(self.opt_m2, T),
            opt_iter=i32(self.opt_iter, T),
            opt_bgrad=f32(self.opt_bgrad, T),
            opt_bweight=f32(self.opt_bweight, T),
        )

    # -- build (end of iteration): sums up, copy building -> sampling --------

    def build(self):
        """QuadTreeNode::build + DTree::build + DTreeWrapper::build."""
        cnt = len(self.qb_sum)
        # node depths: children always have larger indices within a slab;
        # propagate bottom-up by iterating levels via topological order.
        depth = self._node_depths(self.qb_child, self.b_off, self.b_cnt)
        maxd = depth.max() if cnt else 0
        for lev in range(int(maxd), 0, -1):
            nodes = np.nonzero(depth == lev - 1)[0]
            if len(nodes) == 0:
                continue
            ch = self.qb_child[nodes]  # [n,4]
            internal = ch >= 0
            if not internal.any():
                continue
            child_tot = self.qb_sum[np.maximum(ch, 0)].sum(axis=-1)
            self.qb_sum[nodes] = np.where(internal, child_tot, self.qb_sum[nodes])

        roots = self.b_off
        self.sum_s = self.qb_sum[roots].sum(axis=-1)

        # sampling = building (DTreeWrapper::build, :610-617)
        self.qs_sum = self.qb_sum.copy()
        self.qs_child = self.qb_child.copy()
        self.s_off = self.b_off.copy()
        self.s_cnt = self.b_cnt.copy()
        self.statw_s = self.statw_b.copy()
        self.maxdepth = self._tree_maxdepth(depth, self.b_cnt)

    def distribution_stats(self):
        """Per-iteration SD-tree distribution statistics, matching the
        reference's post-build report (guided_path.cpp:1121-1186):
        min/avg/max over the sampling D-trees of depth, mean radiance,
        node count and statistical weight."""
        statw = self.statw_s
        active = statw > 0
        mean = np.where(active, self.sum_s / (4 * np.pi * np.maximum(statw, 1e-300)), 0.0)

        def mam(v, mask=None):
            v = v[mask] if mask is not None and mask.any() else v
            if len(v) == 0:
                return dict(min=0.0, avg=0.0, max=0.0)
            return dict(min=float(v.min()), avg=float(v.mean()),
                        max=float(v.max()))

        return dict(
            n_dtrees=int(self.num_dtrees),
            stree_depth=int(self._stree_depth()),
            depth=mam(self.maxdepth.astype(np.float64)),
            mean_radiance=mam(mean, active),
            nodes=mam(self.s_cnt.astype(np.float64)),
            stat_weight=mam(statw, active),
            approx_memory_mb=float(self.approx_memory_mb()),
        )

    def _node_depths(self, q_child, off, cnt):
        """Vectorized level-BFS: roots have depth 0, children of the current
        frontier get depth+1 (children always have larger indices)."""
        depth = np.zeros(len(q_child), np.int64)
        frontier = off[cnt > 0]
        d = 0
        while len(frontier):
            kids = q_child[frontier].ravel()
            kids = kids[kids >= 0]
            depth[kids] = d + 1
            frontier = kids
            d += 1
        return depth

    def _tree_maxdepth(self, depth, cnt):
        """Per-dtree max node depth + 1, via segment max over slabs."""
        md = np.ones(self.num_dtrees, np.int64)
        if len(depth) == 0:
            return md
        owner = np.repeat(np.arange(self.num_dtrees), cnt)
        np.maximum.at(md, owner, depth + 1)
        return md

    def _stree_depth(self):
        depth = 1
        frontier = np.array([0])
        while True:
            internal = frontier[self.s_dtree[frontier] < 0]
            if len(internal) == 0:
                return depth
            frontier = self.s_child[internal].ravel()
            depth += 1

    def _building_depth(self):
        depth = self._node_depths(self.qb_child, self.b_off, self.b_cnt)
        return (depth.max() + 1) if len(depth) else 1

    # -- reset (start of iteration) -------------------------------------------

    def refine_and_reset(self, iter_idx, spp_per_pass, s_tree_threshold,
                         d_tree_threshold, sd_tree_max_mb=-1):
        """resetSDTree (guided_path.cpp:1108-1113): STree::refine with the
        iteration-scaled threshold, then DTree::reset for every leaf."""
        threshold = np.sqrt((2.0**iter_idx) * spp_per_pass / 4.0) * s_tree_threshold
        self._stree_refine(threshold, sd_tree_max_mb)
        self._dtree_reset_all(d_tree_threshold)

    def _stree_refine(self, samples_required, max_mb):
        if max_mb >= 0 and self.approx_memory_mb() >= max_mb:
            return
        # stack walk; leaves with building statweight > threshold subdivide,
        # children inherit a copy of the dtree with halved statweight
        copies = []  # (source dtree, halvings) per NEW dtree
        stack = [0]
        s_child = self.s_child.tolist()
        s_dtree = self.s_dtree.tolist()
        statw = self.statw_b.copy().tolist()
        dtree_src = list(range(self.num_dtrees))
        while stack:
            idx = stack.pop()
            if s_dtree[idx] >= 0:
                t = s_dtree[idx]
                if statw[t] > samples_required and len(s_child) < 2**31 - 3:
                    # subdivide: two children copy dtree t
                    for i in range(2):
                        s_child.append([-1, -1])
                        new_t = len(statw)
                        s_dtree.append(new_t)
                        statw.append(statw[t] / 2)
                        dtree_src.append(dtree_src[t])
                        s_child[idx][i] = len(s_child) - 1
                    s_dtree[idx] = -1
                    stack.extend(s_child[idx])
            else:
                stack.extend(s_child[idx])

        self.s_child = np.array(s_child, np.int64).reshape(-1, 2)
        s_dtree = np.array(s_dtree, np.int64)

        # compact dtrees: keep only leaves' dtrees, in leaf order
        leaf_nodes = np.nonzero(s_dtree >= 0)[0]
        old_ids = s_dtree[leaf_nodes]
        src = np.array(dtree_src, np.int64)[old_ids]
        new_statw = np.array(statw)[old_ids]

        # rebuild pools by gathering source slabs
        self._gather_dtrees(src, new_statw)
        self.s_dtree = np.full(len(self.s_child), -1, np.int64)
        self.s_dtree[leaf_nodes] = np.arange(len(leaf_nodes))

    def _gather_dtrees(self, src, new_statw_b):
        """Recreate per-dtree slabs for the new dtree list `src` (source
        dtree row per new dtree), remapping global child indices."""

        def regather(off, cnt, q_sum, q_child):
            n_cnt = cnt[src]
            n_off = np.concatenate([[0], np.cumsum(n_cnt)[:-1]])
            total = int(n_cnt.sum())
            ns = np.zeros((total, 4), q_sum.dtype)
            nc = np.full((total, 4), -1, np.int64)
            for i, s in enumerate(src):
                o, c, no = off[s], cnt[s], n_off[i]
                ns[no : no + c] = q_sum[o : o + c]
                blk = q_child[o : o + c]
                nc[no : no + c] = np.where(blk >= 0, blk - o + no, -1)
            return n_off, n_cnt, ns, nc

        self.b_off, self.b_cnt, self.qb_sum, self.qb_child = regather(
            self.b_off, self.b_cnt, self.qb_sum, self.qb_child
        )
        self.s_off, self.s_cnt, self.qs_sum, self.qs_child = regather(
            self.s_off, self.s_cnt, self.qs_sum, self.qs_child
        )
        self.statw_b = new_statw_b
        self.statw_s = self.statw_s[src]
        self.sum_s = self.sum_s[src]
        self.maxdepth = self.maxdepth[src]
        for f in ("opt_var", "opt_m1", "opt_m2", "opt_iter", "opt_bgrad", "opt_bweight"):
            setattr(self, f, getattr(self, f)[src])

    def _dtree_reset_all(self, threshold):
        """Level-synchronous DTree::reset across all dtrees: new building
        topology refines the sampling tree wherever a quadrant carries more
        than `threshold` of the tree's total energy (fraction 0.25^depth
        when the total is zero), subdividing virtually past old leaves with
        sum/4 inheritance; max depth 20; all sums zeroed afterwards."""
        T = self.num_dtrees
        totals = self.sum_s  # previous tree total (root sum)

        # frontier: the nodes created at the previous level
        cur_dtree = np.arange(T)
        cur_src = self.s_off.copy()  # real source nodes (or -1 = virtual)
        cur_sums = self.qs_sum[cur_src].copy()

        levels_dtree = []  # per level: dtree id of each node
        levels_children = []  # per level: [n,4] temp child ids (-1 leaf)
        next_tmp = T
        per_tree_count = np.ones(T, np.int64)

        depth = 1
        while True:
            n_cur = len(cur_dtree)
            cur_children = np.full((n_cur, 4), -1, np.int64)
            if depth >= MAX_Q_DEPTH or n_cur == 0:
                levels_dtree.append(cur_dtree)
                levels_children.append(cur_children)
                break

            tot = totals[cur_dtree]
            frac = np.where(
                tot[:, None] > 0,
                cur_sums / np.maximum(tot[:, None], 1e-300),
                0.25**depth,
            )
            sub = frac > threshold  # [n,4]
            # respect the 65535-node cap per dtree (:499-503)
            add_cnt = np.zeros(T, np.int64)
            np.add.at(add_cnt, cur_dtree, sub.sum(axis=1))
            over = (per_tree_count + add_cnt) > UINT16_CAP
            if over.any():
                sub &= ~over[cur_dtree][:, None]
                add_cnt = np.zeros(T, np.int64)
                np.add.at(add_cnt, cur_dtree, sub.sum(axis=1))
            per_tree_count += add_cnt

            n_new = int(sub.sum())
            rows, quads = np.nonzero(sub)
            new_ids = next_tmp + np.arange(n_new)
            next_tmp += n_new
            cur_children[rows, quads] = new_ids

            levels_dtree.append(cur_dtree)
            levels_children.append(cur_children)
            if n_new == 0:
                break

            # child source nodes in the old sampling tree; virtual children
            # inherit sum/4 in all four quadrants (:492-497)
            src_valid = cur_src[rows] >= 0
            src_child = np.where(
                src_valid,
                self.qs_child[np.maximum(cur_src[rows], 0), quads],
                -1,
            )
            new_sums = np.where(
                (src_child >= 0)[:, None],
                self.qs_sum[np.maximum(src_child, 0)],
                (cur_sums[rows, quads] / 4.0)[:, None],
            )

            cur_dtree = cur_dtree[rows]
            cur_src = src_child
            cur_sums = new_sums
            depth += 1

        dtree_all = np.concatenate(levels_dtree)
        children_all = np.concatenate(levels_children, axis=0)
        N = len(dtree_all)

        # renumber: per-dtree contiguous slabs, stable creation order inside
        order = np.argsort(dtree_all, kind="stable")
        remap = np.empty(N, np.int64)
        remap[order] = np.arange(N)
        new_children = np.where(children_all >= 0, remap[np.maximum(children_all, 0)], -1)
        new_children = new_children[order]

        cnt = np.bincount(dtree_all, minlength=T)
        off = np.concatenate([[0], np.cumsum(cnt)[:-1]])

        self.b_off, self.b_cnt = off, cnt
        self.qb_sum = np.zeros((N, 4))
        self.qb_child = new_children
        self.statw_b = np.zeros(T)

    # -- .sdt dump -------------------------------------------------------------

    def leaf_boxes(self):
        """(pos, size) world-space box per spatial leaf, by dtree id."""
        out_pos = np.zeros((self.num_dtrees, 3))
        out_size = np.zeros((self.num_dtrees, 3))

        def walk(node, lo, size, axis):
            t = self.s_dtree[node]
            if t >= 0:
                out_pos[t] = lo
                out_size[t] = size
                return
            h = size.copy()
            h[axis] /= 2
            walk(self.s_child[node, 0], lo, h, (axis + 1) % 3)
            lo2 = lo.copy()
            lo2[axis] += h[axis]
            walk(self.s_child[node, 1], lo2, h, (axis + 1) % 3)

        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, len(self.s_child) + 100))
        walk(0, self.aabb_min.copy(), np.full(3, self.aabb_size), 0)
        sys.setrecursionlimit(old)
        return out_pos, out_size
