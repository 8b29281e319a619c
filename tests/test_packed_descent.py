"""Multi-level packed descent tables vs the one-gather-per-level
reference walks (VERDICT r4 item 3 — the guided descent tax): the
packed spatial lookup (s_pack4, 4 levels per gather), the packed fused
sample+pdf quadtree walk (qs_pack2, 2 levels per gather) and the
d_meta row must reproduce lookup_ref / sample_pdf_dir_ref exactly on
refined trees built from random training streams."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppg_tpu.guiding import sdtree as G
from ppg_tpu.guiding.host import HostSDTree
from ppg_tpu.ops.reduce import bincount_add


def _refined_tree(seed=0, n_rounds=3, n_records=4000):
    """Build a host tree refined on a random radiance stream so both
    the spatial tree and several quadtrees have non-trivial topology."""
    rng = np.random.default_rng(seed)
    host = HostSDTree(np.zeros(3, np.float32), 2.0)
    for it in range(n_rounds):
        host.refine_and_reset(it, 4, 100, 0.01, -1)
        sdt = host.push()
        p = rng.random((n_records, 3), np.float32) * 2.0
        d = rng.normal(size=(n_records, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        dtree_id, _ = G.lookup(sdt, jnp.asarray(p))
        pc = G.dir_to_canonical(jnp.asarray(d))
        root = sdt.db_root[dtree_id]
        node, quad, _ = G.descend_to_leaf(sdt.qb_child, root, pc,
                                          sdt.q_depth)
        amount = jnp.asarray(rng.random(n_records), jnp.float32)
        qb = bincount_add(sdt.qb_sum.reshape(-1), node * 4 + quad,
                          amount)
        host.qb_sum = np.asarray(qb, np.float64).reshape(
            -1, 4)[: len(host.qb_sum)]
        host.statw_b = host.statw_b + float(n_records) / max(
            host.num_dtrees, 1)
        host.build()
    return host


@pytest.fixture(scope="module")
def tree():
    host = _refined_tree()
    return host.push()


def test_packed_lookup_matches_ref(tree):
    rng = np.random.default_rng(7)
    p = jnp.asarray(rng.random((3000, 3), np.float32) * 2.2 - 0.1)
    id_ref, vox_ref = G.lookup_ref(tree, p)
    id_new, vox_new = G.lookup(tree, p)
    np.testing.assert_array_equal(np.asarray(id_new), np.asarray(id_ref))
    np.testing.assert_allclose(np.asarray(vox_new), np.asarray(vox_ref),
                               rtol=0, atol=0)


def test_packed_sample_pdf_matches_ref(tree):
    rng = np.random.default_rng(11)
    L = 4096
    p = jnp.asarray(rng.random((L, 3), np.float32) * 2.0)
    dtree_id, _ = G.lookup(tree, p)
    u = jnp.asarray(rng.random((L, G.MAX_Q_DEPTH + 2), np.float32))
    is_point = jnp.asarray(rng.random(L) < 0.5)
    d_pt = rng.normal(size=(L, 3)).astype(np.float32)
    d_pt /= np.linalg.norm(d_pt, axis=-1, keepdims=True)
    pc = G.dir_to_canonical(jnp.asarray(d_pt))

    d_ref, pdf_ref = G.sample_pdf_dir_ref(tree, dtree_id, u, is_point, pc)
    d_new, pdf_new = G.sample_pdf_dir(tree, dtree_id, u, is_point, pc)
    np.testing.assert_allclose(np.asarray(pdf_new), np.asarray(pdf_ref),
                               rtol=1e-6, atol=1e-7)
    # sampled directions only meaningful for tree lanes
    sel = ~np.asarray(is_point)
    np.testing.assert_allclose(np.asarray(d_new)[sel],
                               np.asarray(d_ref)[sel],
                               rtol=1e-5, atol=1e-6)


def test_packed_pdf_dir2_matches_pdf_dir(tree):
    rng = np.random.default_rng(13)
    L = 4096
    p = jnp.asarray(rng.random((L, 3), np.float32) * 2.0)
    dtree_id, _ = G.lookup(tree, p)
    d = rng.normal(size=(L, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pdf_a = G.pdf_dir(tree, dtree_id, jnp.asarray(d))
    pdf_b = G.pdf_dir2(tree, dtree_id, jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(pdf_b), np.asarray(pdf_a),
                               rtol=1e-6, atol=1e-7)


def test_packed_descend_cell_matches_ref(tree):
    rng = np.random.default_rng(19)
    L = 4096
    p = jnp.asarray(rng.random((L, 3), np.float32) * 2.0)
    dtree_id, _ = G.lookup(tree, p)
    root = tree.db_root[jnp.maximum(dtree_id, 0)]
    pc = jnp.asarray(rng.random((L, 2), np.float32))
    n_ref, q_ref, d_ref = G.descend_cell(tree.qb_child, root, pc,
                                         tree.q_depth)
    n_new, q_new, d_new = G.descend_cell_packed(tree.qb_pack2, root, pc,
                                                None, tree.q_depth)
    np.testing.assert_array_equal(np.asarray(n_new), np.asarray(n_ref))
    np.testing.assert_array_equal(np.asarray(q_new), np.asarray(q_ref))
    np.testing.assert_array_equal(np.asarray(d_new), np.asarray(d_ref))


def test_packed_descend_clamped_matches_ref(tree):
    rng = np.random.default_rng(23)
    L = 4096
    p = jnp.asarray(rng.random((L, 3), np.float32) * 2.0)
    dtree_id, _ = G.lookup(tree, p)
    root = tree.db_root[jnp.maximum(dtree_id, 0)]
    pc = jnp.asarray(rng.random((L, 2), np.float32))
    for lim in (1, 2, 3, 5, 9):
        dl = jnp.full(L, lim, jnp.int32)
        n_ref, q_ref, d_ref = G.descend_cell_clamped(
            tree.qb_child, root, pc, dl, tree.q_depth)
        n_new, q_new, d_new = G.descend_cell_packed(
            tree.qb_pack2, root, pc, dl, tree.q_depth)
        np.testing.assert_array_equal(np.asarray(n_new),
                                      np.asarray(n_ref), err_msg=str(lim))
        np.testing.assert_array_equal(np.asarray(q_new),
                                      np.asarray(q_ref), err_msg=str(lim))
        np.testing.assert_array_equal(np.asarray(d_new),
                                      np.asarray(d_ref), err_msg=str(lim))


def test_packed_box_targets_match_ref(tree):
    rng = np.random.default_rng(29)
    L = 2048
    p = jnp.asarray(rng.random((L, 3), np.float32) * 2.0)
    dtree_id, _ = G.lookup(tree, p)
    root = tree.db_root[jnp.maximum(dtree_id, 0)]
    pc = jnp.asarray(rng.random((L, 2), np.float32))
    _, _, dep = G.descend_cell(tree.qb_child, root, pc, tree.q_depth)
    c_ref, w_ref = G.dtree_box_targets4(tree.qb_child, root, pc, dep,
                                        tree.q_depth)
    c_new, w_new = G.dtree_box_targets4_packed(tree.qb_pack2, root, pc,
                                               dep, tree.q_depth)
    np.testing.assert_array_equal(np.asarray(c_new), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_ref),
                               rtol=0, atol=0)


def test_dtree_meta_matches_scalar_gathers(tree):
    rng = np.random.default_rng(17)
    ids = jnp.asarray(
        rng.integers(-1, max(int(tree.ds_root.shape[0] // 4), 2),
                     size=512), jnp.int32)
    root, uniform, frac = G.dtree_meta(tree, ids)
    idsafe = jnp.maximum(ids, 0)
    np.testing.assert_array_equal(np.asarray(root),
                                  np.asarray(tree.ds_root[idsafe]))
    np.testing.assert_allclose(
        np.asarray(frac),
        np.asarray(G.sampling_fraction(tree, ids)), rtol=1e-6)
    mean = (tree.ds_sum[idsafe] * G.INV_FOURPI
            / jnp.maximum(tree.ds_statw[idsafe], 1e-38))
    uni_ref = (~(mean > 0) | (tree.ds_statw[idsafe] <= 0)) | (ids < 0)
    np.testing.assert_array_equal(np.asarray(uniform),
                                  np.asarray(uni_ref))
