import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppg_tpu.guiding import sdtree as G
from ppg_tpu.guiding.host import HostSDTree


def fresh(aabb_min=(0, 0, 0), aabb_max=(1, 1, 1)):
    return HostSDTree(np.array(aabb_min, float), np.array(aabb_max, float))


def splat(sdt, p, d, radiance, statw=1.0, **kw):
    n = len(p)
    rec = dict(
        p=jnp.asarray(p, jnp.float32),
        d=jnp.asarray(d, jnp.float32),
        radiance=jnp.asarray(radiance, jnp.float32),
        product=jnp.zeros(n, jnp.float32),
        wo_pdf=jnp.ones(n, jnp.float32),
        bsdf_pdf=jnp.ones(n, jnp.float32),
        dtree_pdf=jnp.zeros(n, jnp.float32),
        stat_weight=jnp.full(n, statw, jnp.float32),
        is_delta=jnp.zeros(n, bool),
        valid=jnp.ones(n, bool),
        voxel=jnp.ones((n, 3), jnp.float32),
    )
    rec.update(kw)
    return G.splat_records(sdt, rec)


def test_record_build_invariants():
    host = fresh()
    sdt = host.push()
    # two records, both into the single root dtree
    p = [[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]]
    d = [[0, 0, 1.0], [0, 0, -1.0]]
    sdt = splat(sdt, p, d, [2.0, 3.0])
    host.pull(sdt)
    host.build()
    # root tree total = sum of irradiance*statweight
    assert abs(host.sum_s[0] - 5.0) < 1e-5
    assert abs(host.statw_s[0] - 2.0) < 1e-5
    # +z maps to canonical x=1 edge, -z to x=0 edge
    sums = host.qs_sum[0]
    assert sums.sum() == pytest.approx(5.0, rel=1e-5)


def test_quadtree_sums_propagate_after_reset():
    host = fresh()
    sdt = host.push()
    rng = np.random.default_rng(0)
    n = 8000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p = rng.random((n, 3))
    sdt = splat(sdt, p, d, np.full(n, 1.0))
    host.pull(sdt)
    host.build()
    host.refine_and_reset(0, 4, s_tree_threshold=100000, d_tree_threshold=0.01)
    # building tree refined: root subdivided (each quadrant has 25% > 1%)
    assert host.b_cnt[0] > 1
    assert np.all(host.qb_sum == 0)
    # record again, build, check internal node sums equal child sums
    sdt = host.push()
    sdt = splat(sdt, p, d, np.full(n, 1.0))
    host.pull(sdt)
    host.build()
    off, cnt = host.s_off[0], host.s_cnt[0]
    ch = host.qs_child[off : off + cnt]
    sums = host.qs_sum[off : off + cnt]
    for i in range(cnt):
        for q in range(4):
            if ch[i, q] >= 0:
                assert sums[i, q] == pytest.approx(
                    host.qs_sum[ch[i, q]].sum(), rel=1e-4
                ), (i, q)
    assert host.sum_s[0] == pytest.approx(n, rel=1e-4)


def test_dtree_sample_matches_pdf_chi2():
    """GOF: quadtree sample() histogram vs pdf() (the reference's chi^2
    pattern from test_chisquare.cpp applied to the directional tree)."""
    host = fresh()
    sdt = host.push()
    rng = np.random.default_rng(1)
    # anisotropic target: directions clustered toward +z
    n = 8000
    d = rng.normal(size=(n, 3)) + [0, 0, 2.5]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p = rng.random((n, 3))
    w = np.ones(n)
    sdt = splat(sdt, p, d, w)
    host.pull(sdt)
    host.build()
    for _ in range(2):  # refine the directional tree twice
        host.refine_and_reset(0, 4, 10**9, 0.01)
        sdt = host.push()
        sdt = splat(sdt, p, d, w)
        host.pull(sdt)
        host.build()
    sdt = host.push()

    m = 80000
    key = jax.random.key(0)
    u = jax.random.uniform(key, (m, G.MAX_Q_DEPTH + 2))
    tid = jnp.zeros(m, jnp.int32)
    dirs = np.asarray(G.sample_dir(sdt, tid, u))
    from ppg_tpu.core.warp import dir_to_canonical

    pc = np.asarray(dir_to_canonical(jnp.asarray(dirs)))
    B = 8
    hist, _, _ = np.histogram2d(
        pc[:, 0], pc[:, 1], bins=B, range=[[0, 1], [0, 1]]
    )
    # expected bin mass: average the (piecewise-constant, possibly finer
    # than the bins) pdf over a dense subgrid within each bin
    S = 16
    g = (np.arange(B * S) + 0.5) / (B * S)
    cx, cy = np.meshgrid(g, g, indexing="ij")
    centers = np.stack([cx.ravel(), cy.ravel()], -1)
    from ppg_tpu.core.warp import canonical_to_dir

    dd = np.asarray(canonical_to_dir(jnp.asarray(centers)))
    pdf_fine = np.asarray(
        G.pdf_dir(sdt, jnp.zeros(len(dd), jnp.int32), jnp.asarray(dd))
    ).reshape(B, S, B, S)
    pdf = pdf_fine.mean(axis=(1, 3))
    expected = pdf * 4 * np.pi / (B * B) * m
    # pooled significance test (expected is exact here — the quadtree
    # pdf is piecewise constant and averaged analytically per bin)
    from chi2util import chi2_test

    ok, stats = chi2_test(hist.ravel(), expected.ravel(), None,
                          significance=0.01, n_tests=1)
    assert ok, stats
    # and pdf integrates to ~1
    total_p = (pdf * 4 * np.pi / (B * B)).sum()
    assert abs(total_p - 1.0) < 0.02


def test_stree_refine_splits_and_halves():
    host = fresh((0, 0, 0), (2, 2, 2))
    sdt = host.push()
    n = 5000
    rng = np.random.default_rng(2)
    p = rng.random((n, 3)) * 2
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sdt = splat(sdt, p, d, np.ones(n))
    host.pull(sdt)
    host.build()
    assert host.statw_b[0] == pytest.approx(n, rel=1e-4)
    host.refine_and_reset(0, 4, s_tree_threshold=1000, d_tree_threshold=0.01)
    # 5000 > 1000*sqrt(4/4) -> split; children 2500 each > 1000 -> split again
    assert host.num_dtrees >= 4
    sdt = host.push()
    tid, voxel = G.lookup(sdt, jnp.asarray([[0.1, 0.1, 0.1], [1.9, 1.9, 1.9]], jnp.float32))
    tid = np.asarray(tid)
    assert tid[0] != tid[1]


def test_lookup_voxel_size():
    host = fresh((0, 0, 0), (4, 4, 4))
    # force two splits (x then y) by hand
    host.s_child = np.array([[1, 2], [-1, -1], [3, 4]], np.int64).reshape(-1, 2)
    host.s_dtree = np.array([-1, 0, -1, 1, 2], np.int64)
    host.s_child = np.array(
        [[1, 2], [-1, -1], [3, 4], [-1, -1], [-1, -1]], np.int64
    )
    # dtrees: give 3 fresh roots
    host.b_off = np.array([0, 1, 2])
    host.b_cnt = np.array([1, 1, 1])
    host.qb_sum = np.zeros((3, 4))
    host.qb_child = np.full((3, 4), -1, np.int64)
    host.s_off = host.b_off.copy()
    host.s_cnt = host.b_cnt.copy()
    host.qs_sum = np.zeros((3, 4))
    host.qs_child = np.full((3, 4), -1, np.int64)
    for f in ("statw_b", "statw_s", "sum_s", "opt_var", "opt_m1", "opt_m2",
              "opt_bgrad", "opt_bweight"):
        setattr(host, f, np.zeros(3))
    host.opt_iter = np.zeros(3, np.int64)
    host.maxdepth = np.ones(3, np.int64)
    sdt = host.push()
    p = jnp.asarray([[0.5, 0.5, 0.5], [3.0, 0.5, 0.5], [3.0, 3.0, 0.5]], jnp.float32)
    tid, voxel = G.lookup(sdt, p)
    assert list(np.asarray(tid)) == [0, 1, 2]
    np.testing.assert_allclose(np.asarray(voxel)[0], [2, 4, 4])
    np.testing.assert_allclose(np.asarray(voxel)[1], [2, 2, 4])


def test_uniform_fallback_pdf():
    host = fresh()
    sdt = host.push()
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    pdf = np.asarray(G.pdf_dir(sdt, jnp.zeros(1, jnp.int32), d))
    np.testing.assert_allclose(pdf, 1.0 / (4 * np.pi), rtol=1e-6)


def test_sdt_roundtrip(tmp_path):
    from ppg_tpu.io.sdt import dump_sdtree, read_sdt

    host = fresh()
    sdt = host.push()
    rng = np.random.default_rng(3)
    n = 10000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sdt = splat(sdt, rng.random((n, 3)), d, np.ones(n))
    host.pull(sdt)
    host.build()
    path = str(tmp_path / "t.sdt")
    dump_sdtree(path, host, np.eye(4))
    cam, trees = read_sdt(path)
    np.testing.assert_allclose(cam, np.eye(4))
    assert len(trees) == 1
    assert trees[0]["stat_weight"] == n
    assert trees[0]["sums"].sum() == pytest.approx(host.qs_sum[0].sum(), rel=1e-5)


def test_fused_sample_pdf_matches_separate():
    """sample_pdf_dir (the fused one-chain sample+pdf walk) must agree
    with sample_dir + pdf_dir on a refined tree, for both lane kinds."""
    host = fresh()
    sdt = host.push()
    rng = np.random.default_rng(7)
    n = 6000
    d = rng.normal(size=(n, 3)) + [0.5, -0.3, 1.8]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p = rng.random((n, 3))
    sdt = splat(sdt, p, d, np.ones(n))
    host.pull(sdt)
    host.build()
    for _ in range(3):
        host.refine_and_reset(0, 4, 200, 0.01)
        sdt = host.push()
        sdt = splat(sdt, p, d, np.ones(n))
        host.pull(sdt)
        host.build()
    sdt = host.push()

    L = 512
    dtree_id, _ = G.lookup(sdt, jnp.asarray(rng.random((L, 3)), jnp.float32))
    u = jnp.asarray(rng.random((L, G.MAX_Q_DEPTH + 2)), jnp.float32)

    # tree lanes: fused direction bitwise-equals sample_dir, fused pdf
    # equals pdf_dir of that direction
    is_point = jnp.zeros(L, bool)
    pc_dummy = jnp.full((L, 2), 0.25, jnp.float32)
    d_f, pdf_f = G.sample_pdf_dir(sdt, dtree_id, u, is_point, pc_dummy)
    d_s = G.sample_dir(sdt, dtree_id, u)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_s),
                               rtol=0, atol=0)
    pdf_ref = G.pdf_dir(sdt, dtree_id, d_s)
    np.testing.assert_allclose(np.asarray(pdf_f), np.asarray(pdf_ref),
                               rtol=2e-5, atol=1e-8)

    # point lanes: fused pdf equals pdf_dir at the queried direction
    dq = rng.normal(size=(L, 3))
    dq /= np.linalg.norm(dq, axis=-1, keepdims=True)
    dq = jnp.asarray(dq, jnp.float32)
    from ppg_tpu.core.warp import dir_to_canonical

    _, pdf_pt = G.sample_pdf_dir(sdt, dtree_id, u, jnp.ones(L, bool),
                                 dir_to_canonical(dq))
    pdf_ref2 = G.pdf_dir(sdt, dtree_id, dq)
    np.testing.assert_allclose(np.asarray(pdf_pt), np.asarray(pdf_ref2),
                               rtol=2e-5, atol=1e-8)

    # fresh (unrefined, zero-sum) tree: uniform fallback on both kinds
    host2 = fresh()
    sdt2 = host2.push()
    d_f2, pdf_f2 = G.sample_pdf_dir(sdt2, jnp.zeros(L, jnp.int32), u,
                                    is_point, pc_dummy)
    np.testing.assert_allclose(np.asarray(pdf_f2),
                               np.full(L, 1.0 / (4 * np.pi)), rtol=1e-6)
