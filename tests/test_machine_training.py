"""Machine-record training: the budgeted segment machine's stacked
(slot, fresh, vert) stream must be estimator-equivalent to the classic
per-bounce record body — same suffix-sum radiance semantics, same splat
totals in expectation (guided_path.cpp:1712-2157 + recordRadiance)."""

import dataclasses

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ppg_tpu.scene.testscenes import mini_cbox


def _trace(cfg, sc, spp=32, seed=0, K=None):
    from ppg_tpu.guiding.host import HostSDTree
    from ppg_tpu.integrators.regen import iterations_for, trace_regen
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.render.sensor import make_sensor

    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    sdt = HostSDTree(sc.aabb_min, sc.aabb_max).push()
    L = sc.film["width"] * sc.film["height"]
    K = K or iterations_for(spp, cfg.max_depth, cfg.rr_depth)
    out, _ = trace_regen(dev, cfg, jax.random.key(seed), sensor,
                         0, L, np.int32(spp), int(K), sdtree=sdt)
    return dev, out


def _splat_energy(sc, out):
    from ppg_tpu.guiding import records as R
    from ppg_tpu.guiding import sdtree as G
    from ppg_tpu.guiding.host import HostSDTree

    sdt = HostSDTree(sc.aabb_min, sc.aabb_max).push()
    recs = R.vertex_records(out["vertices"]["bsdf"], 1.0)
    sdt2 = G.splat_records(sdt, recs)
    return (float(np.sum(np.asarray(sdt2.db_statw))),
            float(np.sum(np.asarray(sdt2.qb_sum))))


@pytest.fixture(scope="module")
def scene():
    return mini_cbox(res=40, max_depth=6, nee="never")


def test_machine_records_match_classic(scene):
    from ppg_tpu.integrators.driver import make_config

    cfg = make_config(scene, guiding=True, record_vertices=True,
                      is_built=False)
    cfg_m = dataclasses.replace(cfg, force_machine=True)
    cfg_c = dataclasses.replace(cfg, force_classic=True)
    _, out_m = _trace(cfg_m, scene, spp=48, seed=0)
    _, out_c = _trace(cfg_c, scene, spp=48, seed=1)

    # images agree (both unbiased, independent streams)
    im_m = np.asarray(out_m["rgb"]) / np.asarray(out_m["w"])[..., None]
    im_c = np.asarray(out_c["rgb"]) / np.asarray(out_c["w"])[..., None]
    mm, mc = float(im_m.mean()), float(im_c.mean())
    assert abs(mm - mc) / mc < 0.05, (mm, mc)

    # record statistics agree: statistical-weight totals are exact
    # sample counts (one per valid vertex), radiance-energy within noise
    sw_m, e_m = _splat_energy(scene, out_m)
    sw_c, e_c = _splat_energy(scene, out_c)
    assert sw_m > 0 and e_m > 0
    assert abs(sw_m - sw_c) / sw_c < 0.05, (sw_m, sw_c)
    assert abs(e_m - e_c) / e_c < 0.12, (e_m, e_c)


def test_machine_records_sample_counts(scene):
    from ppg_tpu.integrators.driver import make_config

    cfg = dataclasses.replace(
        make_config(scene, guiding=True, record_vertices=True,
                    is_built=False), force_machine=True)
    _, out = _trace(cfg, scene, spp=16, seed=7)
    done = np.asarray(out["done"])
    # <=1% of samples may still be in flight at the static-K cutoff
    assert (done >= 16).mean() > 0.99, done.min()
    assert np.asarray(out["n_vertices"]) > 0


def test_guided_training_through_machine(scene):
    """End-to-end: guided iterations with machine-record training on a
    force_machine config produce a finite image close to the classic
    training path's."""
    from ppg_tpu.integrators.guided import GuidedPathTracer

    sc = mini_cbox(res=24, max_depth=5, nee="never")
    sc.integrator.update(dict(type="guided_path", budgetType="spp",
                              budget=48, sppPerPass=4))
    imgs = {}
    for mode in ("machine", "classic"):
        tracer = GuidedPathTracer(sc, chunk=576)
        if mode == "machine":
            base = tracer.base_cfg
            tracer.base_cfg = dataclasses.replace(base, force_machine=True)
            tracer._regen_train_ok = lambda cfg: True
        else:
            tracer._regen_train_ok = lambda cfg: False
        imgs[mode] = np.asarray(tracer.render(seed=5))
    a, b = imgs["machine"], imgs["classic"]
    assert np.isfinite(a).all()
    ma, mb = float(a.mean()), float(b.mean())
    assert abs(ma - mb) / mb < 0.12, (ma, mb)


def test_queue_training_matches_slab(scene):
    """The banked-record queue training loop (one shared pixel queue,
    early-exit while_loop, records splatted per continuation dispatch)
    must be estimator-equivalent to the per-slab record path: same
    image in expectation, same splatted tree statistics within noise."""
    from ppg_tpu.integrators.guided import GuidedPathTracer

    sc = mini_cbox(res=24, max_depth=5, nee="never")
    sc.integrator.update(dict(type="guided_path", budgetType="spp",
                              budget=16, sppPerPass=4))
    out = {}
    for mode in ("queue", "slab"):
        tracer = GuidedPathTracer(sc, chunk=576)
        tracer.train_mode = mode
        img = np.asarray(tracer.render(seed=3))
        rows = [r for r in tracer.stats if r.get("training")]
        var = np.mean([r["variance"] / max(r["spp"], 1)
                       for r in tracer.stats])
        out[mode] = (img, sum(r["n_rays"] for r in rows),
                     np.mean([r["avg_path_length"] for r in rows]), var)
    (ia, ra, pa, va), (ib, rb, pb, vb) = out["queue"], out["slab"]
    assert np.isfinite(ia).all()
    assert abs(ra - rb) / rb < 0.05, (ra, rb)   # ray-count statistics
    assert abs(pa - pb) / pb < 0.08, (pa, pb)   # path-length statistics
    # both estimators are unbiased with INDEPENDENT sample streams, so
    # the whole-image means differ only by Monte-Carlo noise: bound by
    # 4 sigma of the measured per-sample luminance variance
    ma, mb = float(ia.mean()), float(ib.mean())
    n_pix = ia.shape[0] * ia.shape[1]
    se = float(np.sqrt((va + vb) / n_pix))
    assert abs(ma - mb) < max(4.0 * se, 0.02 * mb), (ma, mb, se)


def test_device_fault_retry_recovers(scene, monkeypatch):
    """Failure-detection/recovery (sched.cpp failed-worker requeue
    role): a JaxRuntimeError thrown mid-iteration must trigger backend
    recovery and a retry that re-pushes the host tree, producing a
    normal finite image; the error propagates only after faultRetries
    consecutive failures."""
    import jax

    from ppg_tpu.integrators.guided import GuidedPathTracer

    sc = mini_cbox(res=16, max_depth=4, nee="never")
    sc.integrator.update(dict(type="guided_path", budgetType="spp",
                              budget=8, sppPerPass=4))
    tracer = GuidedPathTracer(sc, chunk=256)
    calls = dict(n=0, recovered=0)
    orig = tracer._render_passes

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError(
                "UNAVAILABLE: TPU worker process crashed (injected)")
        return orig(*a, **kw)

    # recovery probe must not spawn subprocesses in the test: stub it
    monkeypatch.setattr(tracer, "_render_passes", flaky)
    monkeypatch.setattr(
        tracer, "_recover_device",
        lambda: calls.__setitem__("recovered", calls["recovered"] + 1))
    img = np.asarray(tracer.render(seed=1))
    assert np.isfinite(img).all() and img.mean() > 0
    assert calls["recovered"] == 1
    assert tracer._faulted

    # exhausted retries propagate
    tracer2 = GuidedPathTracer(sc, chunk=256)
    tracer2.fault_retries = 1

    def always_fail(*a, **kw):
        raise jax.errors.JaxRuntimeError("UNAVAILABLE: down (injected)")

    monkeypatch.setattr(tracer2, "_render_passes", always_fail)
    monkeypatch.setattr(tracer2, "_recover_device", lambda: None)
    import pytest as _pytest

    with _pytest.raises(jax.errors.JaxRuntimeError):
        tracer2.render(seed=1)
