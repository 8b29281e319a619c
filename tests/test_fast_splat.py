"""Shade-time splat-target precompute (the descent-free splat fast path)
vs the legacy per-record walks, plus the 4-corner box directional splat
vs the exact recursion (QuadTreeNode::record, guided_path.cpp:322-338).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ppg_tpu.guiding import records as R
from ppg_tpu.guiding import sdtree as G
from ppg_tpu.guiding.host import HostSDTree

from test_estimator_oracle import _oracle_box_splat, _refined_tree


def _uniform_tree(depth=4):
    """A quadtree pool uniformly refined to `depth` (every leaf equally
    deep): the 4-corner splat never clamps, so it must match the exact
    recursion cell for cell."""
    host = HostSDTree((0, 0, 0), (1, 1, 1))
    # manual uniform pool, breadth-first
    child = [[-1, -1, -1, -1]]
    frontier = [0]
    for _ in range(depth - 1):
        nxt = []
        for n in frontier:
            kids = []
            for _q in range(4):
                child.append([-1, -1, -1, -1])
                kids.append(len(child) - 1)
            child[n] = kids
            nxt.extend(kids)
        frontier = nxt
    q_child = np.asarray(child, np.int64)
    host.qb_child = q_child
    host.qb_sum = np.zeros((len(q_child), 4))
    host.b_off = np.array([0], np.int64)
    host.b_cnt = np.array([len(q_child)], np.int64)
    host._levels = None
    return host, host.push()


def test_box_targets4_exact_on_uniform_tree():
    host, sdt = _uniform_tree(depth=4)
    q_child = np.asarray(sdt.qb_child)
    rng = np.random.default_rng(11)
    L = 96
    pc = rng.uniform(0.01, 0.99, (L, 2)).astype(np.float32)
    amount = rng.uniform(0.5, 2.0, L).astype(np.float32)
    root = jnp.zeros(L, jnp.int32)

    _, _, depth = G.descend_cell(sdt.qb_child, root, jnp.asarray(pc),
                                 sdt.q_depth)
    cell, w = G.dtree_box_targets4(sdt.qb_child, root, jnp.asarray(pc),
                                   depth, sdt.q_depth)
    got = np.zeros(sdt.qb_sum.size, np.float64)
    np.add.at(got, np.asarray(cell).ravel(),
              (amount[:, None] * np.asarray(w)).ravel())

    want = np.zeros_like(got)
    for i in range(L):
        for k, v in _oracle_box_splat(q_child, 0, pc[i], amount[i]).items():
            want[k] += v
    np.testing.assert_allclose(got[: want.size], want, rtol=2e-4, atol=1e-5)


def test_box_targets4_pushdown_conserves_on_refined_tree():
    """On an adaptively refined tree the corner splat clamps at the box
    depth and the build-time pushdown distributes internal residuals:
    totals must match the exact recursion, and per-subtree aggregates at
    the clamp depth are exact (only intra-subtree placement blurs)."""
    host, sdt = _refined_tree(n_refines=4, seed=5)
    q_child = np.asarray(sdt.qb_child)
    root_i = int(np.asarray(sdt.db_root)[0])
    rng = np.random.default_rng(3)
    L = 128
    pc = (0.5 + rng.normal(0, 0.05, (L, 2))).clip(0.01, 0.99).astype(
        np.float32)
    amount = np.ones(L, np.float32)
    root = jnp.full(L, root_i, jnp.int32)

    _, _, depth = G.descend_cell(sdt.qb_child, root, jnp.asarray(pc),
                                 sdt.q_depth)
    cell, w = G.dtree_box_targets4(sdt.qb_child, root, jnp.asarray(pc),
                                   depth, sdt.q_depth)
    flat = np.zeros(sdt.qb_sum.size, np.float64)
    np.add.at(flat, np.asarray(cell).ravel(),
              (amount[:, None] * np.asarray(w)).ravel())

    # run the host pushdown on these sums
    nq = len(host.qb_sum)
    host.qb_sum = flat[: nq * 4].reshape(nq, 4).copy()
    host._levels = None
    host._pushdown_residuals()
    got = host.qb_sum.reshape(-1)

    want = np.zeros_like(got)
    for i in range(L):
        for k, v in _oracle_box_splat(q_child, root_i, pc[i],
                                      amount[i]).items():
            want[k] += v
    # internal cells hold nothing after pushdown
    internal = (q_child >= 0).reshape(-1)[: got.size]
    assert np.abs(got[internal]).max() == 0.0
    # energy conserved exactly (same domain clipping both sides)
    np.testing.assert_allclose(got.sum(), want.sum(), rtol=1e-6)
    # placement matches within the documented area-uniform blur
    assert np.abs(got - want).sum() / want.sum() < 0.15


def _mini_scene():
    from ppg_tpu.integrators.driver import make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.render.sensor import make_sensor
    from ppg_tpu.scene.testscenes import mini_cbox

    sc = mini_cbox(res=16, max_depth=8)
    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    return sc, dev, sensor, make_config


def _train_tree(sc, dev, sensor, make_config, spatial, directional,
                precompute, sdt, key, L=256, spp=2, K=24):
    from dataclasses import replace

    from ppg_tpu.integrators.regen import trace_regen

    cfg = make_config(sc, guiding=True, record_vertices=True,
                      max_depth=8)
    if precompute:
        cfg = replace(cfg, splat_spatial=spatial, splat_dir=directional)
    out, _ = trace_regen(dev, cfg, key, sensor, 0, L, jnp.int32(spp), K,
                         sdtree=sdt)
    recs = R.vertex_records(out["vertices"]["bsdf"], 1.0)
    if precompute:
        assert "sp_id" in recs
        uj = None
    else:
        assert "sp_id" not in recs
        uj = jax.random.uniform(jax.random.fold_in(key, 999),
                                (recs["valid"].shape[0], 3))
    return G.splat_records(sdt, recs, spatial, directional, None, uj)


def test_fast_nearest_matches_legacy():
    sc, dev, sensor, mc = _mini_scene()
    host = HostSDTree(sc.aabb_min, sc.aabb_max)
    sdt = host.push()
    key = jax.random.key(0)
    t_fast = _train_tree(sc, dev, sensor, mc, "nearest", "nearest", True,
                         sdt, key)
    t_leg = _train_tree(sc, dev, sensor, mc, "nearest", "nearest", False,
                        sdt, key)
    np.testing.assert_allclose(np.asarray(t_fast.qb_sum),
                               np.asarray(t_leg.qb_sum),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_fast.db_statw),
                               np.asarray(t_leg.db_statw),
                               rtol=1e-5, atol=1e-6)


def test_fast_box_dir_matches_legacy_totals():
    """nearest spatial + box directional: same traced records both ways;
    per-tree totals agree (cell placement may defer deep-neighbour
    residuals to the build pushdown)."""
    sc, dev, sensor, mc = _mini_scene()
    host = HostSDTree(sc.aabb_min, sc.aabb_max)
    sdt = host.push()
    key = jax.random.key(1)
    t_fast = _train_tree(sc, dev, sensor, mc, "nearest", "box", True,
                         sdt, key)
    t_leg = _train_tree(sc, dev, sensor, mc, "nearest", "box", False,
                        sdt, key)
    np.testing.assert_allclose(np.asarray(t_fast.db_statw),
                               np.asarray(t_leg.db_statw),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(t_fast.qb_sum)),
                               float(jnp.sum(t_leg.qb_sum)),
                               rtol=1e-4)


def test_fast_stochastic_preserves_totals():
    """Stochastic spatial filter: jitter draws differ between the two
    paths (shade-time vs splat-time streams) but the record set is
    identical, so tree-wide totals must agree."""
    sc, dev, sensor, mc = _mini_scene()
    host = HostSDTree(sc.aabb_min, sc.aabb_max)
    sdt = host.push()
    key = jax.random.key(2)
    t_fast = _train_tree(sc, dev, sensor, mc, "stochastic", "nearest",
                         True, sdt, key)
    t_leg = _train_tree(sc, dev, sensor, mc, "stochastic", "nearest",
                        False, sdt, key)
    np.testing.assert_allclose(float(jnp.sum(t_fast.db_statw)),
                               float(jnp.sum(t_leg.db_statw)), rtol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(t_fast.qb_sum)),
                               float(jnp.sum(t_leg.qb_sum)), rtol=2e-2)
