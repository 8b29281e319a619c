"""Host SD-tree topology ops at production scale (VERDICT r2 item 8).

The reference refines the spatial tree with a recursive DFS and per-leaf
OpenMP loops (guided_path.cpp:957-998, :924-933); the sdTreeMaxMemory
regimes it supports reach ~100k spatial leaves. The host rebuild must
stay out of Python-per-leaf land: refine + reset + build at 100k+ leaves
(~11M quadtree nodes at default thresholds) in ~1 s of CPU time, with no
recursion-depth dependence. Wall-clock is not assertable here — the CI
vCPU is time-shared with 10x jitter — so the budget is process_time.

The fast path is the native kernel (ppg_tpu/guiding/native/
sdtree_host.cpp); the vectorized numpy fallback must produce the
IDENTICAL node numbering (referee test below).
"""

import time

import numpy as np

from ppg_tpu.guiding import native
from ppg_tpu.guiding.host import HostSDTree


def _cascade_tree(target_leaves, threshold=1000.0):
    """One refine call cascades the root statweight down to ~target
    leaves (children inherit half the weight and re-split while above
    threshold)."""
    t = HostSDTree(np.zeros(3), np.ones(3))
    levels = int(np.ceil(np.log2(target_leaves)))
    t.statw_b = np.array([threshold * (2.0 ** levels) * 0.99])
    t._stree_refine(threshold, -1)
    return t


def test_refine_reset_build_100k_leaves_cpu_budget():
    t = _cascade_tree(100_000)
    n = t.num_dtrees
    assert n >= 100_000, n

    # warm-up iteration boundaries: pays the one-time RSS growth of the
    # ping-pong buffer pool (~45 MB/s to fault in brand-new pages on this
    # host; both pool slots are live after two iterations; production
    # renders run 10+ iterations)
    t.statw_b = np.full(n, 10.0)
    for seed in (1, 2):
        t.refine_and_reset(0, 4, 12000, 0.01, -1)
        t.qb_sum[...] = np.abs(np.random.default_rng(seed).normal(
            size=t.qb_sum.shape))
        t.build()

    # timed steady-state iteration: refine (no-op splits, still walks
    # all leaves), reset (rebuilds every leaf's quadtree from the now
    # energy-carrying sampling trees), build (bottom-up sums over the
    # whole pool)
    start = time.process_time()
    t.refine_and_reset(0, 4, 12000, 0.01, -1)
    elapsed_reset = time.process_time() - start
    t.qb_sum[...] = np.abs(np.random.default_rng(0).normal(
        size=t.qb_sum.shape))
    start = time.process_time()
    t.build()
    elapsed_build = time.process_time() - start
    nodes = len(t.qb_sum)
    assert nodes > 8_000_000, nodes
    budget = 2.0 if native.get_lib() is not None else 60.0
    assert elapsed_reset + elapsed_build < budget, (
        f"refine+reset+build took {elapsed_reset:.2f}+{elapsed_build:.2f}s "
        f"CPU at {n} leaves / {nodes} nodes")

    # structural invariants at scale
    assert len(t.b_off) == t.num_dtrees
    assert (t.b_cnt > 0).all()
    # after build, internal node sums equal their children's totals
    # (QuadTreeNode::build, guided_path.cpp:346-366): spot-check roots
    roots = t.b_off[:100]
    ch = t.qb_child[roots]
    internal = ch >= 0
    if internal.any():
        child_tot = t.qb_sum[np.maximum(ch, 0)].sum(axis=-1)
        got = np.where(internal, child_tot, t.qb_sum[roots])
        np.testing.assert_allclose(t.qb_sum[roots], got, rtol=1e-12)


def test_native_reset_build_matches_numpy():
    """The native kernel and the numpy fallback must agree bit-for-bit on
    topology (same slab layout, same child links) and to float tolerance
    on built sums, on a tree with real (nonzero) radiance totals."""
    if native.get_lib() is None:
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.default_rng(42)

    def make():
        t = _cascade_tree(64)
        t.statw_b = np.full(t.num_dtrees, 10.0)
        # two iterations so sampling trees carry structured energy
        for _ in range(2):
            t.refine_and_reset(0, 4, 12000, 0.01, -1)
            t.qb_sum = rng.random(t.qb_sum.shape) ** 8  # spiky energy
            t.build()
        return t

    rng = np.random.default_rng(42)
    a = make()
    rng = np.random.default_rng(42)
    b = make()
    # a: native path for the final reset; b: numpy fallback
    a._dtree_reset_all(0.01)
    lib_backup = native._lib
    try:
        native._lib = False  # force fallback
        b._dtree_reset_all(0.01)
    finally:
        native._lib = lib_backup

    np.testing.assert_array_equal(a.b_cnt, b.b_cnt)
    np.testing.assert_array_equal(a.b_off, b.b_off)
    np.testing.assert_array_equal(a.qb_child, b.qb_child)

    # and build() parity on identical accumulated sums
    sums = rng.random(a.qb_sum.shape)
    a.qb_sum = sums.copy()
    b.qb_sum = sums.copy()
    a.build()
    lib_backup = native._lib
    try:
        native._lib = False
        b.build()
    finally:
        native._lib = lib_backup
    np.testing.assert_allclose(a.qb_sum, b.qb_sum, rtol=1e-12)
    np.testing.assert_allclose(a.sum_s, b.sum_s, rtol=1e-12)
    np.testing.assert_array_equal(a.maxdepth, b.maxdepth)
    np.testing.assert_array_equal(a.qs_child, b.qs_child)


def test_native_regather_matches_numpy():
    """STree refine's slab regather: native kernel vs the numpy fallback
    on a tree that actually splits (statweight above threshold)."""
    if native.get_lib() is None:
        import pytest

        pytest.skip("no native toolchain")

    def make(force_numpy):
        rng = np.random.default_rng(7)
        t = _cascade_tree(64)
        t.statw_b = np.full(t.num_dtrees, 10.0)
        t.refine_and_reset(0, 4, 12000, 0.01, -1)
        t.qb_sum = rng.random(t.qb_sum.shape) ** 4
        t.build()
        # now split: half the leaves exceed the refine threshold
        t.statw_b = np.where(np.arange(t.num_dtrees) % 2 == 0, 5e4, 10.0)
        lib_backup = native._lib
        try:
            if force_numpy:
                native._lib = False
            t._stree_refine(12000.0, -1)
        finally:
            native._lib = lib_backup
        return t

    a, b = make(False), make(True)
    assert a.num_dtrees == b.num_dtrees and a.num_dtrees > 64
    for f in ("b_off", "b_cnt", "qb_child", "s_off", "s_cnt", "qs_child",
              "s_dtree"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)
    for f in ("qb_sum", "qs_sum", "statw_b"):
        np.testing.assert_allclose(getattr(a, f), getattr(b, f), err_msg=f)


def test_leaf_boxes_iterative_matches_partition():
    """leaf_boxes at depth >> default recursion limit: boxes tile the
    root cube exactly (total volume preserved, disjoint by construction
    of the axis-cycling binary split)."""
    t = _cascade_tree(4096)
    pos, size = t.leaf_boxes()
    assert len(pos) == t.num_dtrees
    vol = size.prod(axis=1).sum()
    np.testing.assert_allclose(vol, t.aabb_size ** 3, rtol=1e-9)
    assert (pos >= t.aabb_min - 1e-12).all()
    assert (pos + size <= t.aabb_min + t.aabb_size + 1e-9).all()


def test_vectorized_refine_matches_reference_semantics():
    """Cascading split: statweight W at the root with threshold c yields
    a perfect tree of 2^ceil(log2(W/c)) leaves each carrying W/2^L; the
    reference DFS produces exactly this (halving per subdivide)."""
    t = HostSDTree(np.zeros(3), np.ones(3))
    t.statw_b = np.array([16000.0])
    t._stree_refine(1000.0, -1)
    # 16000 -> 8000 -> 4000 -> 2000 -> 1000 (not > threshold, stop): 16 leaves
    assert t.num_dtrees == 16
    np.testing.assert_allclose(t.statw_b, 1000.0)
    # memory cap: refine with an exhausted budget is a no-op
    before = t.num_dtrees
    t.statw_b = np.full(before, 1e12)
    t._stree_refine(1000.0, 0)
    assert t.num_dtrees == before
