"""CPU-oracle tests quantifying the documented estimator deviations
(VERDICT round-1 item 5): each bounded-stack / batched device routine is
compared against an exact numpy implementation of the reference rule.

Reference rules: QuadTreeNode::record box splat (guided_path.cpp:
322-338), STreeNode::record spatial box filter (:823-839,935-943),
AdamOptimizer batchSize=1 (:85-110,672-697), unbounded-depth Li loop
(:1771,1798)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppg_tpu.guiding import sdtree as G
from ppg_tpu.guiding.host import HostSDTree

from test_guiding import fresh, splat


# ---------------------------------------------------------------------------
# directional box splat vs exact recursion
# ---------------------------------------------------------------------------

def _oracle_depth2(q_child, root, pc):
    """Leaf depth at pc (DTree::depthAt): root leaf = 1."""
    node = int(root)
    x, y = float(pc[0]), float(pc[1])
    depth = 1
    while True:
        qx, qy = x >= 0.5, y >= 0.5
        ch = int(q_child[node, (1 if qx else 0) | (2 if qy else 0)])
        if ch < 0:
            return depth
        node = ch
        x = x * 2 - (1.0 if qx else 0.0)
        y = y * 2 - (1.0 if qy else 0.0)
        depth += 1


def _oracle_box_splat(q_child, root, pc, amount):
    """Exact recursive area-overlap splat (QuadTreeNode::record,
    guided_path.cpp:322-338): returns {flat quadrant id: added sum}."""
    depth = _oracle_depth2(q_child, root, pc)
    size = 0.5 ** depth
    value = amount / (size * size)
    lo = np.array(pc) - size / 2
    hi = np.array(pc) + size / 2
    out = {}

    def rec(node, ox, oy, sz):
        half = sz / 2
        for q in range(4):
            cx = ox + (half if q & 1 else 0.0)
            cy = oy + (half if q & 2 else 0.0)
            w = max(min(hi[0], cx + half) - max(lo[0], cx), 0.0) * \
                max(min(hi[1], cy + half) - max(lo[1], cy), 0.0)
            if w <= 0:
                continue
            ch = int(q_child[node, q])
            if ch < 0:
                out[node * 4 + q] = out.get(node * 4 + q, 0.0) + value * w
            else:
                rec(ch, cx, cy, half)

    rec(int(root), 0.0, 0.0, 1.0)
    return out


def _refined_tree(n_refines=3, seed=0):
    """A directional tree refined a few times from concentrated splats."""
    rng = np.random.default_rng(seed)
    host = fresh()
    sdt = host.push()
    n = 2048
    p = np.full((n, 3), 0.5)
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) + 0.5  # hemisphere concentration
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    w = np.exp(2.0 * d[:, 2])
    sdt = splat(sdt, p, d, w)
    for _ in range(n_refines):
        host.pull(sdt)
        host.refine_and_reset(0, 4, 10 ** 9, 0.01)
        sdt = host.push()
        sdt = splat(sdt, p, d, w)
    host.pull(sdt)
    host.build()
    return host, host.push()


def test_dtree_box_splat_matches_recursive_oracle():
    host, sdt = _refined_tree()
    q_child = np.asarray(sdt.qb_child)
    root = int(np.asarray(sdt.db_root)[0])
    rng = np.random.default_rng(7)
    L = 64
    pc = rng.uniform(0.02, 0.98, (L, 2)).astype(np.float32)
    amount = rng.uniform(0.5, 2.0, L).astype(np.float32)

    base = sdt.qb_sum.reshape(-1)
    depth = G._depth_at(sdt.qb_child, jnp.full(L, root, jnp.int32),
                        jnp.asarray(pc), sdt.q_depth)
    got = np.asarray(G.dtree_box_splat(
        base, sdt.qb_child, jnp.full(L, root, jnp.int32),
        jnp.asarray(pc), jnp.asarray(amount), depth)) - np.asarray(base)

    want = np.zeros_like(got)
    for i in range(L):
        for k, v in _oracle_box_splat(q_child, root, pc[i], amount[i]).items():
            want[k] += v
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)
    # total deposited mass agrees with the exact recursion (domain
    # clipping loses the same boundary energy in both)
    np.testing.assert_allclose(got.sum(), want.sum(), rtol=1e-4)


def test_dtree_box_splat_truncation_quantified():
    """Adversarial case: records at the center corner of a deep tree
    overlap the most leaves. The bounded D_TARGETS collector must still
    keep >99.9% of the energy (VERDICT: quantify the documented
    deviation; the reference recursion is exact)."""
    host, sdt = _refined_tree(n_refines=5)
    q_child = np.asarray(sdt.qb_child)
    root = int(np.asarray(sdt.db_root)[0])
    rng = np.random.default_rng(3)
    L = 128
    # cluster records near quadrant boundaries (max overlap counts)
    pc = (0.5 + rng.normal(0, 0.02, (L, 2))).clip(0.01, 0.99).astype(
        np.float32)
    amount = np.ones(L, np.float32)
    base = sdt.qb_sum.reshape(-1)
    depth = G._depth_at(sdt.qb_child, jnp.full(L, root, jnp.int32),
                        jnp.asarray(pc), sdt.q_depth)
    got = np.asarray(G.dtree_box_splat(
        base, sdt.qb_child, jnp.full(L, root, jnp.int32),
        jnp.asarray(pc), jnp.asarray(amount), depth)) - np.asarray(base)
    kept = got.sum() / amount.sum()
    assert kept > 0.999, f"box splat kept only {kept:.6f} of the energy"


# ---------------------------------------------------------------------------
# spatial box targets vs exact recursion
# ---------------------------------------------------------------------------

def _spatial_tree(seed=0):
    rng = np.random.default_rng(seed)
    host = fresh()
    sdt = host.push()
    n = 4096
    p = rng.uniform(0, 0.4, (n, 3))  # concentrated -> uneven splits
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sdt = splat(sdt, p, d, np.ones(n))
    for it in range(3):
        host.pull(sdt)
        host.refine_and_reset(it, 4, 200, 0.01)
        sdt = host.push()
        sdt = splat(sdt, p, d, np.ones(n))
    host.pull(sdt)
    return host, host.push()


def _oracle_stree_targets(s_child, s_dtree, x, v):
    lo = x - v / 2
    hi = x + v / 2
    vol = max(v[0] * v[1] * v[2], 1e-38)
    out = {}

    def rec(node, nlo, nsz, depth):
        ov = np.prod(np.maximum(np.minimum(hi, nlo + nsz)
                                - np.maximum(lo, nlo), 0.0))
        if ov <= 0:
            return
        dt = int(s_dtree[node])
        if dt >= 0:
            out[dt] = out.get(dt, 0.0) + ov / vol
            return
        ax = depth % 3
        half = nsz.copy()
        half[ax] /= 2
        rec(int(s_child[node, 0]), nlo, half, depth + 1)
        off = nlo.copy()
        off[ax] += half[ax]
        rec(int(s_child[node, 1]), off, half, depth + 1)

    rec(0, np.zeros(3), np.ones(3), 0)
    return out


def test_stree_box_targets_match_oracle():
    host, sdt = _spatial_tree()
    s_child = np.asarray(sdt.s_child)
    s_dtree = np.asarray(sdt.s_dtree)
    n_leaves = int((s_dtree >= 0).sum())
    assert n_leaves >= 4  # the refinement actually split

    rng = np.random.default_rng(11)
    L = 64
    amin = np.asarray(sdt.aabb_min)
    asize = np.asarray(sdt.aabb_size)
    p = rng.uniform(0.05, 0.95, (L, 3)).astype(np.float32)
    p_world = (amin + p * asize).astype(np.float32)
    voxel = (rng.uniform(0.05, 0.3, (L, 3)) * asize).astype(np.float32)

    ids, ws = G.stree_box_targets(sdt, jnp.asarray(p_world),
                                  jnp.asarray(voxel))
    ids, ws = np.asarray(ids), np.asarray(ws)
    for i in range(L):
        got = {}
        for j in range(ids.shape[1]):
            if ids[i, j] >= 0 and ws[i, j] > 0:
                got[int(ids[i, j])] = got.get(int(ids[i, j]), 0.0) + ws[i, j]
        want = _oracle_stree_targets(s_child, s_dtree, p[i],
                                     voxel[i] / asize)
        assert set(got) == set(want), (i, got, want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=3e-4,
                                       atol=1e-6)


# ---------------------------------------------------------------------------
# Adam: batched step vs the reference's per-record batchSize=1
# ---------------------------------------------------------------------------

def _adam_oracle(records, per_record, ratio_power=1.0, var0=0.0):
    """Reference AdamOptimizer (guided_path.cpp:85-133) +
    optimizeBsdfSamplingFraction gradient (:672-697). per_record=True is
    the reference batchSize=1 rule (step whenever accumulated weight
    reaches 1); False replays our one-step-per-splat-batch rule."""
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    m1 = m2 = 0.0
    it = 0
    var = var0
    bgrad = bweight = 0.0

    def grad_of(r, var):
        product, wo_pdf, bsdf_pdf, dtree_pdf, sw = r
        frac = 1.0 / (1.0 + np.exp(-var))
        mix = frac * bsdf_pdf + (1 - frac) * dtree_pdf
        ratio = (product / max(mix, 1e-38)) ** ratio_power
        dl_df = -ratio / max(wo_pdf, 1e-38) * (bsdf_pdf - dtree_pdf)
        return dl_df * frac * (1 - frac) + 0.01 * var

    def step(var, m1, m2, it, grad):
        it += 1
        alr = lr * np.sqrt(1 - b2 ** it) / (1 - b1 ** it)
        m1 = b1 * m1 + (1 - b1) * grad
        m2 = b2 * m2 + (1 - b2) * grad * grad
        var = np.clip(var - alr * m1 / (np.sqrt(max(m2, 0.0)) + eps),
                      -20.0, 20.0)
        return var, m1, m2, it

    if per_record:
        for r in records:
            sw = r[4]
            bgrad += grad_of(r, var) * sw
            bweight += sw
            if bweight >= 1.0:
                var, m1, m2, it = step(var, m1, m2, it, bgrad / bweight)
                bgrad = bweight = 0.0
    else:
        # one batch: gradients all evaluated at the initial var
        for r in records:
            sw = r[4]
            bgrad += grad_of(r, var0) * sw
            bweight += sw
        if bweight > 1.0:
            var, m1, m2, it = step(var, m1, m2, it, bgrad / bweight)
    return var


def _adam_records(seed=5, n=24):
    rng = np.random.default_rng(seed)
    recs = []
    for _ in range(n):
        recs.append((
            float(rng.uniform(0.2, 2.0)),    # product
            float(rng.uniform(0.3, 1.5)),    # wo_pdf
            float(rng.uniform(0.2, 1.2)),    # bsdf_pdf
            float(rng.uniform(0.05, 1.0)),   # dtree_pdf
            1.0,                             # stat weight
        ))
    return recs


def _device_adam(records, batched):
    """Run splat_records with learn_fraction on a fresh 1-dtree tree:
    all records hit dtree 0. batched=False feeds records one call at a
    time (our accumulate-until-weight>1 rule)."""
    host = fresh()
    sdt = host.push()

    def call(rs):
        n = len(rs)
        rec = dict(
            p=jnp.full((n, 3), 0.5, jnp.float32),
            d=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1)),
            radiance=jnp.ones(n, jnp.float32),
            product=jnp.asarray([r[0] for r in rs], jnp.float32),
            wo_pdf=jnp.asarray([r[1] for r in rs], jnp.float32),
            bsdf_pdf=jnp.asarray([r[2] for r in rs], jnp.float32),
            dtree_pdf=jnp.asarray([r[3] for r in rs], jnp.float32),
            stat_weight=jnp.asarray([r[4] for r in rs], jnp.float32),
            is_delta=jnp.zeros(n, bool),
            valid=jnp.ones(n, bool),
            voxel=jnp.ones((n, 3), jnp.float32),
        )
        return rec

    if batched:
        sdt = G.splat_records(sdt, call(records), learn_fraction="kl")
    else:
        for r in records:
            sdt = G.splat_records(sdt, call([r]), learn_fraction="kl")
    return float(np.asarray(sdt.opt_var)[0])


def test_adam_sequential_matches_reference_oracle():
    """Fed one record per splat batch, the device Adam must reproduce
    the reference batchSize=1 chain exactly (same math, same cadence —
    our weight>1 gate vs the reference's >=1 shifts each step one
    record later, so compare against our-cadence oracle and check the
    reference-cadence difference is the single-step lag only)."""
    recs = _adam_records(n=12)
    got = _device_adam(recs, batched=False)

    # our cadence: steps fire when accumulated weight EXCEEDS 1
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    var = m1 = m2 = 0.0
    it = 0
    bgrad = bweight = 0.0
    for r in recs:
        product, wo_pdf, bsdf_pdf, dtree_pdf, sw = r
        frac = 1.0 / (1.0 + np.exp(-var))
        mix = frac * bsdf_pdf + (1 - frac) * dtree_pdf
        ratio = product / max(mix, 1e-38)
        g = (-ratio / max(wo_pdf, 1e-38) * (bsdf_pdf - dtree_pdf)
             * frac * (1 - frac) + 0.01 * var)
        bgrad += g * sw
        bweight += sw
        if bweight > 1.0:
            it += 1
            grad = bgrad / bweight
            alr = lr * np.sqrt(1 - b2 ** it) / (1 - b1 ** it)
            m1 = b1 * m1 + (1 - b1) * grad
            m2 = b2 * m2 + (1 - b2) * grad * grad
            var = np.clip(var - alr * m1 / (np.sqrt(max(m2, 0.0)) + eps),
                          -20.0, 20.0)
            bgrad = bweight = 0.0
    np.testing.assert_allclose(got, var, rtol=1e-4, atol=1e-6)


def test_adam_batch_step_deviation_quantified():
    """One step per splat batch (ours) vs per-record batchSize=1 (the
    reference): quantify the learned-variable gap on a realistic record
    stream. The deviation shrinks as batches shrink; at production
    chunking (record batches per chunk-scan step) the measured gap on
    the logit stays small — recorded here as the acceptance bound."""
    recs = _adam_records(n=24)
    ref = _adam_oracle(recs, per_record=True)
    ours = _device_adam(recs, batched=True)
    gap = abs(ours - ref)
    # sigmoid(var) is the sampling fraction: bound the FRACTION gap
    f_ref = 1.0 / (1.0 + np.exp(-ref))
    f_ours = 1.0 / (1.0 + np.exp(-ours))
    assert abs(f_ours - f_ref) < 0.06, (ours, ref, gap)


def _adam_oracle_true_cadence(records, ratio_power=1.0, var0=0.0):
    """Exact reference chain: AdamOptimizer batchSize=1 fires when the
    accumulated weight EXCEEDS 1 (guided_path.cpp:89 is a strict '>'),
    i.e. one step per 2 units of statistical weight, gradient
    re-evaluated at the current variable for every record."""
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    m1 = m2 = 0.0
    it = 0
    var = var0
    bg = bw = 0.0
    for product, wo, bp, dp, sw in records:
        frac = 1.0 / (1.0 + np.exp(-var))
        mix = frac * bp + (1 - frac) * dp
        g = (-((product / max(mix, 1e-38)) ** ratio_power)
             / max(wo, 1e-38) * (bp - dp) * frac * (1 - frac) + 0.01 * var)
        bg += g * sw
        bw += sw
        if bw > 1.0:
            it += 1
            grad = bg / bw
            alr = lr * np.sqrt(1 - b2 ** it) / (1 - b1 ** it)
            m1 = b1 * m1 + (1 - b1) * grad
            m2 = b2 * m2 + (1 - b2) * grad * grad
            var = np.clip(var - alr * m1 / (np.sqrt(max(m2, 0.0)) + eps),
                          -20.0, 20.0)
            bg = bw = 0.0
    return var


def _device_adam_chunks(records, loss, batch=400):
    host = fresh()
    sdt = host.push()
    for i in range(0, len(records), batch):
        rs = records[i:i + batch]
        n = len(rs)
        rec = dict(
            p=jnp.full((n, 3), 0.5, jnp.float32),
            d=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1)),
            radiance=jnp.ones(n, jnp.float32),
            product=jnp.asarray([r[0] for r in rs], jnp.float32),
            wo_pdf=jnp.asarray([r[1] for r in rs], jnp.float32),
            bsdf_pdf=jnp.asarray([r[2] for r in rs], jnp.float32),
            dtree_pdf=jnp.asarray([r[3] for r in rs], jnp.float32),
            stat_weight=jnp.asarray([r[4] for r in rs], jnp.float32),
            is_delta=jnp.zeros(n, bool),
            valid=jnp.ones(n, bool),
            voxel=jnp.ones((n, 3), jnp.float32),
        )
        sdt = G.splat_records(sdt, rec, learn_fraction=loss)
    return float(np.asarray(sdt.opt_var)[0])


def test_adam_long_stream_tracks_reference():
    """Round-4 regression (the kl-inertness bug): on a 2000-record
    stream whose optimum pulls the fraction far from 0.5, the batched
    device chain must land within 0.02 of the exact reference chain in
    FRACTION space for both loss modes and both pull directions. The
    pre-fix one-step-per-batch rule froze at ~0.502 while the reference
    reached 0.96 on the same stream, making kl/var losses inert at
    production batch sizes."""
    rng = np.random.default_rng(3)
    n = 2000
    up = [(float(rng.uniform(0.5, 2.0)), float(rng.uniform(0.3, 1.5)),
           float(rng.uniform(0.6, 1.4)), float(rng.uniform(0.02, 0.4)), 1.0)
          for _ in range(n)]
    down = [(p, w, dp, bp, sw) for (p, w, bp, dp, sw) in up]
    for loss, rp in (("kl", 1.0), ("var", 2.0)):
        for name, recs in (("up", up), ("down", down)):
            ref = _adam_oracle_true_cadence(recs, ratio_power=rp)
            got = _device_adam_chunks(recs, loss)
            f_ref = 1.0 / (1.0 + np.exp(-ref))
            f_got = 1.0 / (1.0 + np.exp(-got))
            assert abs(f_got - f_ref) < 0.02, (loss, name, f_ref, f_got)
            assert abs(f_ref - 0.5) > 0.3, (loss, name, f_ref)


# ---------------------------------------------------------------------------
# regen record-tail truncation
# ---------------------------------------------------------------------------

def test_regen_record_tail_truncation_bounded():
    """Training records of paths spanning the dispatch boundary lose the
    tail radiance (regen.py trace_regen docstring). With K sized by
    iterations_for() the lost mass must stay under 1% of the total
    recorded radiance (VERDICT: quantify the documented deviation)."""
    from ppg_tpu.scene.testscenes import mini_cbox
    from ppg_tpu.integrators.driver import make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.integrators.regen import trace_regen, iterations_for
    from ppg_tpu.render.sensor import make_sensor

    sc = mini_cbox(res=16, max_depth=8)
    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    cfg = make_config(sc, guiding=True, record_vertices=True)
    tree = HostSDTree(sc.aabb_min, sc.aabb_max).push()
    key = jax.random.key(2)
    spp = 4
    L = 256

    def mass(K):
        out, _ = trace_regen(dev, cfg, key, sensor, 0, L,
                             jnp.int32(spp), int(K), sdtree=tree)
        v = out["vertices"]["bsdf"]
        rad = np.asarray(v["radiance"], np.float64)
        valid = np.asarray(v["valid"])
        if rad.ndim > valid.ndim:
            valid = valid[..., None]
        return float(np.where(valid, rad, 0.0).sum())

    K_sized = iterations_for(spp, cfg.max_depth, cfg.rr_depth)
    m_sized = mass(K_sized)
    m_full = mass(int(K_sized * 4))
    assert m_full > 0
    loss = abs(m_full - m_sized) / m_full
    assert loss < 0.01, f"record tail loss {loss:.4f}"


# ---------------------------------------------------------------------------
# unlimited path depth
# ---------------------------------------------------------------------------

def test_unlimited_depth_matches_deep_cap():
    """maxDepth=-1 (unbounded, RR-terminated — guided_path.cpp:1798)
    must agree with a deep explicit cap at matched seeds: RR kills all
    paths long before 64 bounces, so the two configs draw identical
    streams and identical images."""
    from dataclasses import replace

    from ppg_tpu.scene.testscenes import mini_cbox
    from ppg_tpu.integrators.driver import make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.integrators.regen import trace_regen, iterations_for
    from ppg_tpu.render.sensor import make_sensor

    sc = mini_cbox(res=16, max_depth=-1)
    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    cfg = make_config(sc, guiding=False, record_vertices=False)
    assert cfg.max_depth == -1
    cfg_deep = replace(cfg, max_depth=65)
    key = jax.random.key(4)
    L, spp = 256, 4
    K = iterations_for(spp, -1, cfg.rr_depth)

    out_u, _ = trace_regen(dev, cfg, key, sensor, 0, L, jnp.int32(spp),
                           int(K))
    out_d, _ = trace_regen(dev, cfg_deep, key, sensor, 0, L,
                           jnp.int32(spp), int(K))
    np.testing.assert_allclose(np.asarray(out_u["rgb"]),
                               np.asarray(out_d["rgb"]), rtol=1e-5)
    assert float(np.asarray(out_u["rgb"]).sum()) > 0
