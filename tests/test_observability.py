"""Observability parity: avgPathLength, per-iteration SD-tree
distribution statistics, and the partial-image flush hook (reference
statistics.h:94 avgPathLength, guided_path.cpp:1121-1186,
mitsuba.cpp:92-127)."""

import numpy as np

from ppg_tpu.scene.testscenes import mini_cbox

def test_guided_observability_stats_and_flush():
    # avgPathLength + SD-tree distribution stats + partial-image flush
    # callback (reference statistics.h avgPathLength registry entry,
    # guided_path.cpp:1121-1186 distribution report, mitsuba.cpp:92-127
    # film flush)
    from ppg_tpu.integrators.guided import GuidedPathTracer

    sc = mini_cbox(res=16, max_depth=4, nee="never")
    sc.integrator.update(dict(type="guided_path", budgetType="spp",
                              budget=24, sppPerPass=4))
    tracer = GuidedPathTracer(sc, chunk=256)
    flushed = []
    tracer.flush_cb = flushed.append
    img = tracer.render(seed=5)
    assert np.isfinite(img).all()
    # every pass batch flushed a partial image of the film size
    assert len(flushed) >= 1
    assert flushed[0].shape == img.shape
    # avg path length is tracked and sane (paths have >= 1 vertex,
    # bounded by max_depth)
    lens = [s["avg_path_length"] for s in tracer.stats]
    assert all(1.0 <= v <= 4.0 for v in lens), lens
    assert all(s["n_rays"] > 0 for s in tracer.stats)
    # distribution stats recorded per iteration; the first build (a
    # recording iteration) must show real statistical weight
    assert len(tracer.tree_stats) >= 1
    ds = tracer.tree_stats[0]
    assert ds["n_dtrees"] >= 1
    assert ds["depth"]["max"] >= ds["depth"]["min"] >= 1
    assert ds["stat_weight"]["max"] > 0
