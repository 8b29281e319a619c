"""Agreement tests for the regenerative persistent-wavefront tracer
(integrators/regen.py) against the classic fixed-bounce wavefront
(integrators/wavefront.py), which is the reference implementation of the
Li() semantics (guided_path.cpp:1712-2157).

Both estimators are unbiased for the same integrand, so equal-spp means
must agree within Monte-Carlo noise; sample bookkeeping (started / done
counts) must be exact.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ppg_tpu.scene.testscenes import mini_cbox


def _renders(nee="never", spp=48, res=40, max_depth=6, **regen_kw):
    from ppg_tpu.integrators.driver import make_config, render, render_regen

    sc = mini_cbox(res=res, max_depth=max_depth, nee=nee)
    cfg = make_config(sc, guiding=False, record_vertices=False)
    img_c = render(sc, spp=spp, seed=3, cfg=cfg)
    img_r = render_regen(sc, spp=spp, seed=4, cfg=cfg, **regen_kw)
    return img_c, img_r


def _assert_agree(img_c, img_r, spp, block_tol=0.25):
    # whole-image means: any systematic estimator difference shows up at
    # the >5% level, far above the pooled-MC noise of ~10^5 samples
    mc, mr = float(img_c.mean()), float(img_r.mean())
    assert abs(mc - mr) / mc < 0.05, (mc, mr)
    # 8x8-downsampled block means agree (catches pixel-indexing /
    # lane-ownership bugs, which displace energy spatially); per-block
    # tolerance is loose because nee=never light hits are heavy-tailed
    h = (img_c.shape[0] // 8) * 8
    w = (img_c.shape[1] // 8) * 8

    def blocks(im):
        return im[:h, :w].mean(-1).reshape(h // 8, 8, w // 8, 8).mean((1, 3))

    bc, br = blocks(img_c), blocks(img_r)
    mask = bc > 0.1 * bc.mean()
    assert np.median(np.abs(bc - br)[mask] / bc[mask]) < block_tol


def test_regen_matches_classic_nee_never():
    # nee=never is heavy-tailed (hit-or-miss luminaire): needs the spp
    # to pull the pooled-mean MC error well under the 5% gate
    spp = 256
    img_c, img_r = _renders(nee="never", spp=spp, res=24)
    _assert_agree(img_c, img_r, spp)


def test_regen_matches_classic_nee_always():
    spp = 48
    img_c, img_r = _renders(nee="always", spp=spp)
    _assert_agree(img_c, img_r, spp)


def test_regen_exact_sample_counts():
    import jax
    import jax.numpy as jnp

    from ppg_tpu.integrators.driver import _regen_dispatch, make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.render.sensor import make_sensor

    sc = mini_cbox(res=32, max_depth=6)
    dev = DeviceScene.from_scene(sc)
    cfg = make_config(sc, guiding=False, record_vertices=False)
    sensor = make_sensor(sc.sensor, sc.film)
    L, spp = 1024, 11
    out, _ = _regen_dispatch(
        dev, cfg, jax.random.key(0), np.int32(7), sensor=sensor,
        pix_start=jnp.int32(0), L=L, spp=jnp.int32(spp),
        K=jnp.int32(spp * 24 + 64), carry=None, it_base=jnp.int32(0))
    assert bool(out["all_done"])
    np.testing.assert_array_equal(np.asarray(out["started"]), spp)
    np.testing.assert_array_equal(np.asarray(out["done"]), spp)
    # every completed sample weighs exactly 1 in the film
    np.testing.assert_array_equal(np.asarray(out["w"]), float(spp))


def test_regen_continuation_dispatches():
    # tiny K forces the driver's carry-continuation path; the result must
    # still complete every sample and agree with the classic estimator
    spp = 32
    img_c, img_r = _renders(nee="never", spp=spp, res=32, K=24)
    _assert_agree(img_c, img_r, spp)


def test_regen_machine_matches_classic_nee_always():
    # the budgeted segment machine (the big-scene traversal path,
    # regen.machine_body) must compute the same estimator as the classic
    # per-bounce regen body; cfg.force_machine engages it on the small
    # scene where the brute-force sweep normally wins
    import dataclasses

    from ppg_tpu.integrators.driver import make_config, render, render_regen

    spp = 96
    sc = mini_cbox(res=24, max_depth=6, nee="always")
    cfg = make_config(sc, guiding=False, record_vertices=False)
    img_c = render(sc, spp=spp, seed=3, cfg=cfg)
    cfg_m = dataclasses.replace(cfg, force_machine=True)
    img_m = render_regen(sc, spp=spp, seed=4, cfg=cfg_m, chunk=1024)
    _assert_agree(img_c, img_m, spp)


def test_regen_machine_matches_classic_nee_never():
    import dataclasses

    from ppg_tpu.integrators.driver import make_config, render, render_regen

    spp = 256
    sc = mini_cbox(res=24, max_depth=6, nee="never")
    cfg = make_config(sc, guiding=False, record_vertices=False)
    img_c = render(sc, spp=spp, seed=3, cfg=cfg)
    cfg_m = dataclasses.replace(cfg, force_machine=True)
    img_m = render_regen(sc, spp=spp, seed=4, cfg=cfg_m, chunk=1024)
    _assert_agree(img_c, img_m, spp)


def test_regen_machine_exact_sample_counts():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ppg_tpu.integrators.driver import _regen_dispatch, make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.render.sensor import make_sensor

    sc = mini_cbox(res=32, max_depth=6, nee="always")
    dev = DeviceScene.from_scene(sc)
    cfg = dataclasses.replace(
        make_config(sc, guiding=False, record_vertices=False),
        force_machine=True)
    sensor = make_sensor(sc.sensor, sc.film)
    L, spp = 1024, 11
    out, _ = _regen_dispatch(
        dev, cfg, jax.random.key(0), np.int32(7), sensor=sensor,
        pix_start=jnp.int32(0), L=L, spp=jnp.int32(spp),
        K=jnp.int32(spp * 24 + 64), carry=None, it_base=jnp.int32(0))
    assert bool(out["all_done"])
    np.testing.assert_array_equal(np.asarray(out["started"]), spp)
    np.testing.assert_array_equal(np.asarray(out["done"]), spp)
    np.testing.assert_array_equal(np.asarray(out["w"]), float(spp))


def test_regen_machine_nee_through_mask():
    # the machine's shadow walk doubles as the evalTransmittance
    # null/mask chain: agreement with the classic tracer on a masked
    # panel scene exercises the pass-through restarts
    import dataclasses

    from ppg_tpu.integrators.driver import make_config, render, render_regen
    from ppg_tpu.scene.testscenes import mini_cbox_panel

    sc = mini_cbox_panel(res=32, nee="always", panel="mask", opacity=0.6)
    cfg = make_config(sc, guiding=False, record_vertices=False)
    img_c = render(sc, spp=96, seed=5, cfg=cfg)
    cfg_m = dataclasses.replace(cfg, force_machine=True)
    img_m = render_regen(sc, spp=96, seed=6, cfg=cfg_m, chunk=1024)
    m_c, m_m = float(img_c.mean()), float(img_m.mean())
    assert abs(m_c - m_m) / m_c < 0.06, (m_c, m_m)


def test_regen_eligibility_gate():
    from ppg_tpu.integrators.driver import make_config, regen_eligible

    sc = mini_cbox(res=16)
    cfg = make_config(sc, guiding=False, record_vertices=False)
    assert regen_eligible(sc, cfg)
    cfg_rec = make_config(sc, guiding=False, record_vertices=True)
    assert not regen_eligible(sc, cfg_rec)


def test_guided_final_pass_regen_matches_classic():
    # the guided driver's record-free (final) batches go through the
    # regen tracer; forcing the classic path must give the same estimator
    from ppg_tpu.integrators.guided import GuidedPathTracer

    sc = mini_cbox(res=24, max_depth=5, nee="never")
    sc.integrator.update(dict(type="guided_path", budgetType="spp",
                              budget=24, sppPerPass=4))

    # statistics: the guided mini-cbox image mean at this budget has a
    # per-seed std of ~10% (tracked per-pass variance ~10 at mean 0.28),
    # so a single-seed comparison at 12% tolerance is only ~1.2 sigma —
    # average 3 seeds per mode (sigma of the mode-mean difference drops
    # to ~5.7%, making 12% a ~2 sigma gate)
    means = {}
    for mode in ("regen", "classic"):
        acc = []
        for seed in (0, 1, 2):
            tracer = GuidedPathTracer(sc, chunk=576)
            if mode == "classic":
                tracer._regen_ok = lambda cfg: False
                tracer._regen_train_ok = lambda cfg: False
            img = tracer.render(seed=seed)
            assert np.isfinite(img).all()
            acc.append(float(img.mean()))
        means[mode] = np.mean(acc)
    ma, mb = means["regen"], means["classic"]
    assert abs(ma - mb) / mb < 0.12, (ma, mb)


def test_guided_regen_training_with_learned_fraction():
    # the regen record path must feed the Adam bsdfSamplingFraction
    # learner (kl loss) without NaNs and produce a usable image
    from ppg_tpu.integrators.guided import GuidedPathTracer

    sc = mini_cbox(res=16, max_depth=4, nee="always")
    sc.integrator.update(dict(type="guided_path", budgetType="spp",
                              budget=12, sppPerPass=4,
                              bsdfSamplingFractionLoss="kl"))
    tracer = GuidedPathTracer(sc, chunk=256)
    img = tracer.render(seed=2)
    assert np.isfinite(img).all() and img.mean() > 0.01



def test_regen_queue_matches_legacy():
    # the shared pixel-queue (lanes claim pixels/sample-blocks from a
    # global head) must agree with the fixed lane<->pixel binding: both
    # draw independent samples of the same estimator
    img_c, img_q = _renders(nee="never", spp=48, queue=True, chunk=512)
    _assert_agree(img_c, img_q, 48)


def test_regen_queue_exact_counts_and_determinism():
    # every pixel receives exactly spp samples through the queue film
    # (weight channel), across both bodies, blocks, and slot overflow
    # (tiny slot buffers force flush-stall continuation dispatches)
    import jax

    from ppg_tpu.integrators.driver import _regen_dispatch, make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.render.sensor import make_sensor

    sc = mini_cbox(res=24, max_depth=5, nee="always")
    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    n_pix = 24 * 24
    films = []
    for fm in (False, True):
        cfg = make_config(sc, guiding=False, record_vertices=False,
                          force_machine=fm)
        for _ in range(2):  # determinism: identical reruns
            carry = None
            for i in range(40):
                out, carry = _regen_dispatch(
                    dev, cfg, jax.random.key(0), np.int32(i),
                    sensor=sensor, pix_start=np.int32(0), L=128,
                    spp=np.int32(9), K=np.int32(200), carry=carry,
                    it_base=np.int32(i * 200), qstart=np.int32(0),
                    qend=np.int32(n_pix * 3), n_film=n_pix + 1,
                    n_blocks=3, n_slots=4)
                if bool(out["all_done"]):
                    break
            film = np.asarray(carry["film"])[:n_pix]
            assert (film[:, 6] == 9).all(), film[:, 6]
            assert np.isfinite(film).all()
            films.append(film)
        assert np.array_equal(films[-1], films[-2])
    # both bodies integrate the same estimator
    m0, m1 = films[0][:, :3].mean(), films[2][:, :3].mean()
    assert abs(m0 - m1) / max(m1, 1e-9) < 0.1, (m0, m1)
