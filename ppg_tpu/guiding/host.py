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

        # ping-pong buffer pool for the big per-node arrays: this class
        # reallocates pool-sized arrays every iteration, and on hosts
        # with slow first-touch page faults (observed ~60 MB/s here) the
        # refaulting of freed mmap'd arenas dominates refine/reset/build
        # at production tree sizes. Each key alternates between two
        # power-of-two-capacity slots, so a newly produced array never
        # aliases the immediately-preceding one of the same kind (the
        # only liveness window the topology code has).
        self._pool = {}
        self._pp = {}

    def _alloc(self, key, shape, dtype):
        n = int(np.prod(shape))
        slot = self._pp[key] = 1 - self._pp.get(key, 0)
        cur = self._pool.get((key, slot))
        if cur is None or cur.dtype != np.dtype(dtype) or cur.size < n:
            cap = 256
            while cap < n:
                cap *= 2
            # grow BOTH slots together and pre-touch them: faulting in
            # brand-new pages measures ~45 MB/s on this host while
            # re-touching pooled pages runs at memory bandwidth, so the
            # fault cost must be paid here (once per capacity doubling),
            # never inside the steady-state iteration path.
            for s in (slot, 1 - slot):
                buf = self._pool.get((key, s))
                if buf is None or buf.dtype != np.dtype(dtype) or buf.size < cap:
                    buf = np.empty(cap, dtype)
                    buf[:: max(4096 // buf.itemsize, 1)] = 0  # touch each page
                    self._pool[(key, s)] = buf
            cur = self._pool[(key, slot)]
        return cur[:n].reshape(shape)

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

        # multi-level packed tables (sdtree.lookup / sample_pdf_dir:
        # one row gather descends S_PACK_K / Q_PACK_K levels — the
        # sequential gather chain IS the guided descent cost on TPU).
        # Built by table composition: leaves self-loop with 0 consumed
        # levels, so composing the 1-level map with itself is exact.
        ns = len(self.s_child)
        internal = self.s_dtree < 0
        k1 = np.where(internal[:, None], self.s_child, np.arange(ns)[:, None])
        k1 = k1.astype(np.int64)
        c1 = internal.astype(np.int64)
        k2 = np.empty((ns, 4), np.int64)
        c2 = np.empty((ns, 4), np.int64)
        for h0 in range(2):
            mid = k1[:, h0]
            for h1 in range(2):
                k2[:, h0 + 2 * h1] = k1[mid, h1]
                c2[:, h0 + 2 * h1] = c1 + c1[mid]
        s_pack4 = np.empty((ns, 32), np.int64)
        for j0 in range(4):
            mid = k2[:, j0]
            for j1 in range(4):
                s_pack4[:, j0 + 4 * j1] = k2[mid, j1]
                s_pack4[:, 16 + j0 + 4 * j1] = c2[:, j0] + c2[mid, j1]

        def topo_pack2(kids):
            """2-level topology tables for a quadtree pool: rest-node
            [N,16] (node after two quadrant choices with leaf stalls)
            and meta [N,16] (levels consumed | done<<2), slot =
            qA + 4*qB."""
            n = len(kids)
            nn = np.arange(n, dtype=np.int64)
            rest = np.empty((n, 16), np.int32)
            meta = np.empty((n, 16), np.int32)
            for qa in range(4):
                c1q = kids[:, qa]
                mids = np.where(c1q >= 0, c1q, 0)
                for qb in range(4):
                    c2q = kids[mids, qb]
                    slot = qa + 4 * qb
                    rest[:, slot] = np.where(
                        c1q < 0, nn,
                        np.where(c2q < 0, mids, np.maximum(c2q, 0)))
                    cons = np.where(c1q < 0, 1, 2)
                    done = (c1q < 0) | (c2q < 0)
                    meta[:, slot] = cons | (done << 2)
            return rest, meta

        nq = len(self.qs_sum)
        kids = self.qs_child.astype(np.int64)
        sums = self.qs_sum.astype(np.float32)
        qs_pack2 = np.zeros((nq, 52), np.float32)
        qs_pack2[:, :4] = sums
        for qa in range(4):
            c1q = kids[:, qa]
            mids = np.where(c1q >= 0, c1q, 0)
            qs_pack2[:, 4 + 4 * qa:8 + 4 * qa] = np.where(
                (c1q >= 0)[:, None], sums[mids], 0.0)
        rest, meta = topo_pack2(kids)
        qs_pack2[:, 20:36] = rest.view(np.float32)
        qs_pack2[:, 36:52] = meta.view(np.float32)

        # building-tree topology pack (training splat-target descents)
        kidsb = self.qb_child.astype(np.int64)
        rb, mb = topo_pack2(kidsb)
        qb_pack2 = np.concatenate(
            [np.maximum(kidsb, 0).astype(np.int32), rb, mb], axis=1)

        d_meta = np.zeros((self.num_dtrees, 4), np.float32)
        d_meta[:, 0] = self.s_off[: self.num_dtrees].astype(
            np.int32).view(np.float32)
        d_meta[:, 1] = self.sum_s[: self.num_dtrees]
        d_meta[:, 2] = self.statw_s[: self.num_dtrees]
        d_meta[:, 3] = self.opt_var[: self.num_dtrees]

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
            s_pack4=i32(s_pack4, S, 0),
            qs_pack2=f32(qs_pack2, Qs, 0),
            qb_pack2=i32(qb_pack2, Qb, 0),
            d_meta=f32(d_meta, T, 0),
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

    def _pushdown_residuals(self):
        """Distribute box-splat residuals accumulated on INTERNAL
        quadrant cells down to the leaves before the bottom-up build.

        The 4-corner box splat (sdtree.dtree_box_targets4) clamps its
        descent at the splat box's own depth; when a quadrant there is
        still internal, the whole subtree's share lands on that internal
        cell. Pushing it down uniformly by area (child quadrants get a
        quarter each, level by level) reproduces the reference recursion
        (QuadTreeNode::record, guided_path.cpp:322-338) exactly for
        cells fully inside the box and blurs only the box-boundary cells
        of deeper-than-box neighbours. No-op (and skipped) when no
        internal cell holds a residual."""
        internal = self.qb_child >= 0
        if not len(self.qb_sum) or not (self.qb_sum[internal] != 0).any():
            return
        levels = getattr(self, "_levels", None)
        if levels is None:
            depth = self._node_depths(self.qb_child, self.b_off, self.b_cnt)
            maxd = int(depth.max()) if len(depth) else 0
            levels = [np.nonzero(depth == lev)[0] for lev in range(maxd + 1)]
        for nodes in levels[:-1]:
            if len(nodes) == 0:
                continue
            r0 = self.qb_sum[nodes]
            ch0 = self.qb_child[nodes]
            # residuals are sparse in production (box-boundary cells of
            # deeper-than-box neighbours only): narrow to live rows
            live = ((ch0 >= 0) & (r0 != 0)).any(axis=1)
            if not live.any():
                continue
            nodes = nodes[live]
            ch = ch0[live]
            mask = ch >= 0
            r = r0[live]  # residual on internal quadrants
            share = np.where(mask, r, 0.0) * 0.25
            kids = ch[mask]
            # children are unique (one parent quadrant each): direct
            # vectorized add, no np.add.at needed
            self.qb_sum[kids] += share[mask][:, None]
            self.qb_sum[nodes] = np.where(mask, 0.0, r)

    def build(self):
        """QuadTreeNode::build + DTree::build + DTreeWrapper::build.

        Native single-pass kernel when the toolchain is available;
        otherwise the per-level numpy path (using the node lists cached
        by the last reset when valid — topology is frozen in between)."""
        from .native import get_lib

        lib = get_lib()
        if lib is not None:
            import ctypes

            N, T = len(self.qb_sum), self.num_dtrees
            qb_sum = np.ascontiguousarray(self.qb_sum, np.float64)
            qb_child = np.ascontiguousarray(self.qb_child, np.int64)
            b_off = np.ascontiguousarray(self.b_off, np.int64)
            b_cnt = np.ascontiguousarray(self.b_cnt, np.int64)
            sum_s = np.zeros(T)
            maxdepth = np.zeros(T, np.int64)
            p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
            f64, i64 = ctypes.c_double, ctypes.c_int64
            lib.ppg_sdt_pushdown(N, p(qb_sum, f64), p(qb_child, i64))
            lib.ppg_sdt_build(N, T, p(qb_sum, f64), p(qb_child, i64),
                              p(b_off, i64), p(b_cnt, i64), p(sum_s, f64),
                              p(maxdepth, i64))
            self.qb_sum = qb_sum
            self.sum_s = sum_s
            qs_sum = self._alloc("qs_sum", qb_sum.shape, np.float64)
            np.copyto(qs_sum, qb_sum)
            self.qs_sum = qs_sum
            qs_child = self._alloc("qs_child", qb_child.shape, np.int64)
            np.copyto(qs_child, qb_child)
            self.qs_child = qs_child
            self.s_off = self.b_off.copy()
            self.s_cnt = self.b_cnt.copy()
            self.statw_s = self.statw_b.copy()
            self.maxdepth = maxdepth
            return

        self._pushdown_residuals()
        levels = getattr(self, "_levels", None)
        if levels is not None:
            counts = self._level_counts
            maxdepth = np.ones(self.num_dtrees, np.int64)
            for l, c in enumerate(counts):
                maxdepth = np.where(c > 0, l + 1, maxdepth)
        else:
            depth = self._node_depths(self.qb_child, self.b_off, self.b_cnt)
            maxd = int(depth.max()) if len(depth) else 0
            levels = [np.nonzero(depth == lev)[0] for lev in range(maxd + 1)]
            maxdepth = self._tree_maxdepth(depth, self.b_cnt)

        # bottom-up: internal node sums become their children's totals
        # (QuadTreeNode::build, guided_path.cpp:346-366)
        for nodes in reversed(levels[:-1]):
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
        qs_sum = self._alloc("qs_sum", self.qb_sum.shape, self.qb_sum.dtype)
        np.copyto(qs_sum, self.qb_sum)
        self.qs_sum = qs_sum
        qs_child = self._alloc("qs_child", self.qb_child.shape, np.int64)
        np.copyto(qs_child, self.qb_child)
        self.qs_child = qs_child
        self.s_off = self.b_off.copy()
        self.s_cnt = self.b_cnt.copy()
        self.statw_s = self.statw_b.copy()
        self.maxdepth = maxdepth

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
        # Level-synchronous vectorized subdivision (the reference's DFS at
        # guided_path.cpp:957-998 pushes split children back on its stack;
        # splitting every over-threshold leaf per level until none remain
        # produces the identical topology since children inherit exactly
        # half the statweight). Node numbering differs from a DFS, but the
        # final compaction below orders dtrees by leaf node index either
        # way.
        s_child = self.s_child
        s_dtree = self.s_dtree.copy()
        statw = self.statw_b.copy()
        dtree_src = np.arange(self.num_dtrees, dtype=np.int64)
        frontier = np.nonzero(s_dtree >= 0)[0]
        while len(frontier):
            t = s_dtree[frontier]
            can = statw[t] > samples_required
            if not can.any() or len(s_child) >= 2**31 - 3:
                break
            split = frontier[can]
            ts = t[can]
            k = len(split)
            base_node = len(s_child)
            kids = base_node + np.arange(2 * k, dtype=np.int64)
            s_child = np.concatenate(
                [s_child, np.full((2 * k, 2), -1, np.int64)])
            s_child[split, 0] = kids[0::2]
            s_child[split, 1] = kids[1::2]
            new_t = len(statw) + np.arange(2 * k, dtype=np.int64)
            s_dtree = np.concatenate([s_dtree, new_t])
            s_dtree[split] = -1
            # children inherit a copy of the dtree with halved statweight
            # (STreeNode::subdivide, :876-895)
            statw = np.concatenate([statw, np.repeat(statw[ts] / 2, 2)])
            dtree_src = np.concatenate(
                [dtree_src, np.repeat(dtree_src[ts], 2)])
            frontier = kids

        self.s_child = s_child

        # compact dtrees: keep only leaves' dtrees, in leaf order
        leaf_nodes = np.nonzero(s_dtree >= 0)[0]
        old_ids = s_dtree[leaf_nodes]
        src = dtree_src[old_ids]
        new_statw = statw[old_ids]

        if len(src) == self.num_dtrees and (src == np.arange(len(src))).all():
            # no splits: topology and slab layout are unchanged, skip the
            # full-pool regather (the steady-state case once the tree has
            # converged — every iteration calls refine regardless)
            self.statw_b = new_statw
            return

        # rebuild pools by gathering source slabs
        self._gather_dtrees(src, new_statw)
        self.s_dtree = np.full(len(self.s_child), -1, np.int64)
        self.s_dtree[leaf_nodes] = np.arange(len(leaf_nodes))

    def _gather_dtrees(self, src, new_statw_b):
        """Recreate per-dtree slabs for the new dtree list `src` (source
        dtree row per new dtree), remapping global child indices."""
        from .native import get_lib

        lib = get_lib()

        def regather_native(off, cnt, q_sum, q_child, key):
            import ctypes

            n_cnt = cnt[src]
            n_off = np.concatenate([[0], np.cumsum(n_cnt)[:-1]])
            total = int(n_cnt.sum())
            q_sum = np.ascontiguousarray(q_sum, np.float64)
            q_child = np.ascontiguousarray(q_child, np.int64)
            srcc = np.ascontiguousarray(src, np.int64)
            offc = np.ascontiguousarray(off, np.int64)
            cntc = np.ascontiguousarray(cnt, np.int64)
            noffc = np.ascontiguousarray(n_off, np.int64)
            ns = self._alloc(key + "_sum", (total, 4), np.float64)
            nc = self._alloc(key + "_child", (total, 4), np.int64)
            p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
            f64, i64 = ctypes.c_double, ctypes.c_int64
            lib.ppg_sdt_regather(len(src), p(srcc, i64), p(offc, i64),
                                 p(cntc, i64), p(q_sum, f64), p(q_child, i64),
                                 p(noffc, i64), p(ns, f64), p(nc, i64))
            return n_off, n_cnt, ns, nc

        def regather(off, cnt, q_sum, q_child, key):
            if lib is not None:
                return regather_native(off, cnt, q_sum, q_child, key)
            # flat gather: element i of the new pool reads source slab
            # row off[src[seg]] + (i - n_off[seg]); child links shift by
            # (new slab start - old slab start)
            n_cnt = cnt[src]
            n_off = np.concatenate([[0], np.cumsum(n_cnt)[:-1]])
            total = int(n_cnt.sum())
            src_off = np.repeat(off[src], n_cnt)
            seg_start = np.repeat(n_off, n_cnt)
            src_idx = src_off + (np.arange(total, dtype=np.int64) - seg_start)
            # mode="clip" skips numpy's per-element bounds check, which is
            # ~60x slower than the gather itself; src_idx is in range by
            # construction (slab offsets + within-slab ranks)
            ns = self._alloc(key + "_sum", (total, 4), q_sum.dtype)
            np.take(q_sum, src_idx, axis=0, out=ns, mode="clip")
            blk = self._alloc(key + "_scratch", (total, 4), np.int64)
            np.take(q_child, src_idx, axis=0, out=blk, mode="clip")
            nc = self._alloc(key + "_child", (total, 4), np.int64)
            np.subtract(seg_start, src_off, out=seg_start)
            np.add(blk, seg_start[:, None], out=nc)
            np.copyto(nc, -1, where=blk < 0)
            return n_off, n_cnt, ns, nc

        self.b_off, self.b_cnt, self.qb_sum, self.qb_child = regather(
            self.b_off, self.b_cnt, self.qb_sum, self.qb_child, "qb"
        )
        self.s_off, self.s_cnt, self.qs_sum, self.qs_child = regather(
            self.s_off, self.s_cnt, self.qs_sum, self.qs_child, "qs"
        )
        self.statw_b = new_statw_b
        self._levels = None  # node numbering changed; reset re-caches
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
        sum/4 inheritance; max depth 20; all sums zeroed afterwards.

        Dispatches to the native kernel (guiding/native/sdtree_host.cpp)
        when available; the numpy fallback below produces the identical
        node numbering (asserted by tests/test_host_scalability.py).

        The per-level tree-id array stays SORTED (level 0 is arange(T);
        children are emitted in row-major (node, quadrant) order), so the
        final per-dtree-slab node numbering — by tree, then level, then
        within-level creation order, identical to a stable argsort of the
        concatenated levels — is computed arithmetically from bincounts:
        final(node) = slab_off[tree] + nodes_in_earlier_levels[tree] +
        rank_within_level(tree). No argsort/remap over the whole pool
        (profiled 123 s -> <1 s at 22M nodes / 262k dtrees)."""
        T = self.num_dtrees
        totals = self.sum_s  # previous tree total (root sum)

        from .native import get_lib

        lib = get_lib()
        if lib is not None:
            import ctypes

            tot = np.ascontiguousarray(totals, np.float64)
            s_off = np.ascontiguousarray(self.s_off, np.int64)
            qs_sum = np.ascontiguousarray(self.qs_sum, np.float64)
            qs_child = np.ascontiguousarray(self.qs_child, np.int64)
            p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
            f64, i64 = ctypes.c_double, ctypes.c_int64
            N = lib.ppg_sdt_reset(T, p(tot, f64), p(s_off, i64),
                                  p(qs_sum, f64), p(qs_child, i64),
                                  float(threshold), MAX_Q_DEPTH, UINT16_CAP)
            qb_child = self._alloc("qb_child", (N, 4), np.int64)
            cnt = np.empty(T, np.int64)
            lib.ppg_sdt_reset_copy(p(qb_child, i64), p(cnt, i64))
            self.b_cnt = cnt
            self.b_off = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            qb_sum = self._alloc("qb_sum", (N, 4), np.float64)
            qb_sum.fill(0.0)
            self.qb_sum = qb_sum
            self.qb_child = qb_child
            self.statw_b = np.zeros(T)
            self._levels = None
            return

        # frontier: the nodes created at the previous level
        cur_dtree = np.arange(T, dtype=np.int64)
        cur_src = self.s_off.copy()  # real source nodes (or -1 = virtual)
        cur_sums = self.qs_sum[cur_src]

        level_tree = []    # per level: sorted dtree id per node
        level_rank = []    # per level: rank of each node within its dtree
        level_sub = []     # per level: (rows, quads) of subdivided quadrants
        counts = []        # per level: [T] nodes per dtree
        per_tree_count = np.ones(T, np.int64)
        empty = (np.zeros(0, np.int64), np.zeros(0, np.int64))

        depth = 1
        while True:
            n_cur = len(cur_dtree)
            cl = np.bincount(cur_dtree, minlength=T)
            starts = np.concatenate([[0], np.cumsum(cl)[:-1]])
            level_tree.append(cur_dtree)
            level_rank.append(np.arange(n_cur, dtype=np.int64)
                              - starts[cur_dtree])
            counts.append(cl)
            if depth >= MAX_Q_DEPTH or n_cur == 0:
                level_sub.append(empty)
                break

            tot = totals[cur_dtree]
            frac = np.where(
                tot[:, None] > 0,
                cur_sums / np.maximum(tot[:, None], 1e-300),
                0.25**depth,
            )
            sub = frac > threshold  # [n,4]
            # respect the 65535-node cap per dtree (:499-503)
            add_cnt = np.bincount(
                cur_dtree, weights=sub.sum(axis=1), minlength=T
            ).astype(np.int64)
            over = (per_tree_count + add_cnt) > UINT16_CAP
            if over.any():
                sub &= ~over[cur_dtree][:, None]
                add_cnt = np.bincount(
                    cur_dtree, weights=sub.sum(axis=1), minlength=T
                ).astype(np.int64)
            per_tree_count += add_cnt

            rows, quads = np.nonzero(sub)  # row-major: stays tree-sorted
            level_sub.append((rows, quads))
            if len(rows) == 0:
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

        cnt = np.zeros(T, np.int64)
        for c in counts:
            cnt += c
        off = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        N = int(cnt.sum())

        qb_child = self._alloc("qb_child", (N, 4), np.int64)
        qb_child.fill(-1)
        node_levels = []  # final pool index per node, per level
        before = np.zeros(T, np.int64)  # nodes of this tree in levels < l
        for l in range(len(level_tree)):
            t_l = level_tree[l]
            node_final = off[t_l] + before[t_l] + level_rank[l]
            rows, quads = level_sub[l]
            before = before + counts[l]
            if len(rows):
                ct = t_l[rows]
                # children of level-l nodes ARE level l+1, in the same order
                child_final = off[ct] + before[ct] + level_rank[l + 1]
                qb_child[node_final[rows], quads] = child_final
            node_levels.append(node_final)

        self.b_off, self.b_cnt = off, cnt
        qb_sum = self._alloc("qb_sum", (N, 4), np.float64)
        qb_sum.fill(0.0)
        self.qb_sum = qb_sum
        self.qb_child = qb_child
        self.statw_b = np.zeros(T)
        # level cache: build() consumes it right after the render passes
        # (topology is frozen in between); refine invalidates it
        self._levels = node_levels
        self._level_counts = counts

    # -- .sdt dump -------------------------------------------------------------

    def leaf_boxes(self):
        """(pos, size) world-space box per spatial leaf, by dtree id.
        Iterative level-BFS (the split axis cycles x->y->z per DEPTH, so a
        whole frontier level shares one axis); no recursion limit games at
        production tree sizes."""
        out_pos = np.zeros((self.num_dtrees, 3))
        out_size = np.zeros((self.num_dtrees, 3))
        nodes = np.array([0], np.int64)
        lo = self.aabb_min[None, :].copy()
        size = np.full((1, 3), self.aabb_size)
        axis = 0
        while len(nodes):
            t = self.s_dtree[nodes]
            leaf = t >= 0
            out_pos[t[leaf]] = lo[leaf]
            out_size[t[leaf]] = size[leaf]
            internal = ~leaf
            if not internal.any():
                break
            n = nodes[internal]
            l0 = lo[internal]
            h = size[internal].copy()
            h[:, axis] /= 2
            l1 = l0.copy()
            l1[:, axis] += h[:, axis]
            nodes = np.concatenate([self.s_child[n, 0], self.s_child[n, 1]])
            lo = np.concatenate([l0, l1])
            size = np.concatenate([h, h])
            axis = (axis + 1) % 3
        return out_pos, out_size
