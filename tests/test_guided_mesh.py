"""Guided training over a device mesh (virtual 8-CPU): the production
GuidedPathTracer driver sharded via _guided_mesh_pass.

Reference roles: the scheduler fan-out of performRenderPasses
(mitsuba/src/libcore/sched.h:351-484, librender/renderproc.cpp) and the
lock-free concurrent SD-tree accumulation it feeds
(guided_path.cpp:59-62) — here pixel chunks shard over the mesh 'tiles'
axis and the additive tree accumulators psum over ICI.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ppg_tpu.scene.testscenes import mini_cbox


def _tracer(mesh=None, nee="never", loss="none"):
    from ppg_tpu.integrators.guided import GuidedPathTracer

    sc = mini_cbox(res=32, budget=8, max_depth=4, nee=nee)
    over = {"bsdfSamplingFractionLoss": loss} if loss != "none" else None
    return GuidedPathTracer(sc, chunk=256, mesh=mesh, overrides=over)


def test_record_free_pass_exact_across_mesh_sizes():
    """A record-free pass draws per-chunk sample streams keyed only by
    the global chunk index, so device count cannot change the image:
    mesh(1) and mesh(4) must agree bit-for-bit (each flat-film slot is
    written by exactly one device; psum adds zeros)."""
    import jax

    from ppg_tpu.integrators.guided import _guided_mesh_pass
    from ppg_tpu.parallel.mesh import make_mesh

    g1 = _tracer(make_mesh(1))
    g4 = _tracer(make_mesh(4))
    key = jax.random.key(11)

    outs = []
    for g, cpd in ((g1, 4), (g4, 1)):
        cfg = g._cfg(is_built=False, do_nee=False, is_final=True)
        assert not cfg.record_vertices
        tree = g._push()
        img, w, sq, _, counts = _guided_mesh_pass(
            g.scene_dev, cfg, g.sensor, tree, key, np.int32(0), g.chunk,
            np.int32(4), 200, cpd, "nearest", "nearest", None, g.mesh)
        outs.append((np.asarray(img), np.asarray(w), np.asarray(sq)))
        assert int(np.asarray(counts[2])) == 4 * 4 * 256  # all samples done
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
    assert outs[0][1][:1024].min() == 4  # every film pixel got its spp


def test_training_pass_accumulates_and_replicates():
    """Training over mesh(4): the psum'd building tree must carry every
    device's records (statweight counts all committed vertices) and the
    returned tree must be replicated (identical across devices)."""
    import jax

    from ppg_tpu.integrators.guided import _guided_mesh_pass
    from ppg_tpu.parallel.mesh import make_mesh

    g = _tracer(make_mesh(4))
    cfg = g._cfg(is_built=False, do_nee=False, is_final=False)
    assert cfg.record_vertices
    tree = g._push()
    key = jax.random.key(7)
    img, w, sq, tree2, counts = _guided_mesh_pass(
        g.scene_dev, cfg, g.sensor, tree, key, np.int32(0), g.chunk,
        np.int32(2), 80, 1, "nearest", "nearest", None, g.mesh)
    n_verts = int(np.asarray(counts[1]))
    assert n_verts > 0
    d_sw = np.asarray(tree2.db_statw) - np.asarray(tree.db_statw)
    assert d_sw.sum() > 0
    assert np.asarray(tree2.qb_sum).sum() > np.asarray(tree.qb_sum).sum()


def test_full_guided_render_mesh_matches_single_device():
    """End-to-end GuidedPathTracer.render() through the mesh path vs the
    single-device path at the same seed/budget: image means must agree
    within a variance-derived bound (5 sigma of the mean-luminance
    standard error from the tracer's own per-pass variance estimator —
    the splat interleave differs during training, so the comparison is
    statistical, not bitwise)."""
    from ppg_tpu.parallel.mesh import make_mesh

    g1 = _tracer()
    img1 = g1.render(seed=3, spp_budget=8)
    gm = _tracer(make_mesh(4))
    imgm = gm.render(seed=3, spp_budget=8)

    lum = lambda im: (0.212671 * im[..., 0] + 0.715160 * im[..., 1]
                      + 0.072169 * im[..., 2])
    m1, mm = float(lum(img1).mean()), float(lum(imgm).mean())
    npx = img1.shape[0] * img1.shape[1]
    # variance stat = avg per-pixel per-sample luminance variance
    var = max(s["variance"] for s in (g1.stats + gm.stats))
    spp = 8
    se = np.sqrt(2.0 * var / (spp * npx))  # both images are noisy
    assert abs(m1 - mm) < 5 * se + 0.02 * m1, (m1, mm, se)


def test_learned_fraction_mesh_runs():
    """Adam-learned bsdfSamplingFraction through the mesh path (per-
    device chains pmean-averaged at the pass end): runs and moves the
    optimizer state."""
    from ppg_tpu.parallel.mesh import make_mesh

    gm = _tracer(make_mesh(2), nee="never", loss="kl")
    img = gm.render(seed=1, spp_budget=8)
    assert np.isfinite(img).all()
    ov = np.asarray(gm.sdtree.opt_var)
    assert np.isfinite(ov).all()


def test_mesh_kl_nee_always_agreement_and_adam_bound():
    """VERDICT r2 item 5: nee=always + loss=kl through the mesh path.

    (a) the mesh(4) render agrees with single-device within the
    variance-derived bound (same statistical argument as
    test_full_guided_render_mesh_matches_single_device);
    (b) the Adam pmean-vs-serial deviation is MEASURED: the learned
    per-leaf sampling fractions sigmoid(opt_var) of the mesh(4) run
    (4 device chains pmean-averaged per pass, _guided_mesh_pass) stay
    within a small bound of the mesh(1) run's serial chain — the mesh
    analog of the reference's spinlock-serialized updates
    (guided_path.cpp:719-737); single-device batching itself is bounded
    <0.06 by tests/test_estimator_oracle.py."""
    import jax

    from ppg_tpu.guiding.sdtree import sampling_fraction
    from ppg_tpu.parallel.mesh import make_mesh

    imgs, fracs, tracers = [], [], []
    for n_dev in (1, 4):
        g = _tracer(make_mesh(n_dev), nee="always", loss="kl")
        # budget large enough that iteration 1 TRAINS with a BUILT
        # tree (the fraction learner only steps when is_built;
        # merge-final folds small budgets into one record-free pass)
        imgs.append(g.render(seed=5, spp_budget=48))
        tracers.append(g)
        n_leaves = int(np.asarray(g.sdtree.db_statw).shape[0])
        fr = np.asarray(sampling_fraction(
            g.sdtree, np.arange(n_leaves, dtype=np.int32)))
        fracs.append(fr)

    lum = lambda im: (0.212671 * im[..., 0] + 0.715160 * im[..., 1]
                      + 0.072169 * im[..., 2])
    m1, mm = float(lum(imgs[0]).mean()), float(lum(imgs[1]).mean())
    npx = imgs[0].shape[0] * imgs[0].shape[1]
    var = max(s["variance"] for t in tracers for s in t.stats)
    se = np.sqrt(2.0 * var / (48 * npx))
    assert abs(m1 - mm) < 5 * se + 0.02 * m1, (m1, mm, se)

    # (b) measured pmean-vs-serial Adam bound on ACTIVE leaves (leaves
    # whose optimizer actually stepped in both runs — the building-pool
    # statweight is reset after the final build, so use the Adam second
    # moment as the activity marker); inactive leaves stay at the 0.5
    # prior
    active = (np.asarray(tracers[0].sdtree.opt_m2) > 0) \
        & (np.asarray(tracers[1].sdtree.opt_m2) > 0)
    gap = np.abs(fracs[0] - fracs[1])[active[:fracs[0].shape[0]]]
    assert gap.size > 0
    assert float(gap.max()) < 0.15, float(gap.max())
    assert float(gap.mean()) < 0.05, float(gap.mean())
