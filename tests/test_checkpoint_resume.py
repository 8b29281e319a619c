"""Render checkpoint/resume (RenderJob resume role): a render resumed
from a mid-run checkpoint must reproduce the uninterrupted result —
per-iteration seeds derive from the iteration index, so the resumed
loop replays the identical schedule."""

import os

import numpy as np

from ppg_tpu.integrators.guided import GuidedPathTracer
from ppg_tpu.scene.testscenes import mini_cbox


def test_resumed_render_matches_uninterrupted(tmp_path):
    sc = mini_cbox(res=32, budget=24, max_depth=4)
    ref = np.asarray(GuidedPathTracer(sc).render(seed=3))

    # run once with checkpointing, capturing the state after the FIRST
    # iteration by aborting via a flush callback exception
    ck = str(tmp_path / "r.ckpt")
    sc2 = mini_cbox(res=32, budget=24, max_depth=4)
    tr = GuidedPathTracer(sc2)

    class Abort(Exception):
        pass

    calls = {"n": 0}
    orig = tr._save_checkpoint

    def save_and_abort(path, state):
        orig(path, state)
        calls["n"] += 1
        if calls["n"] == 1:
            raise Abort()

    tr._save_checkpoint = save_and_abort
    try:
        tr.render(seed=3, checkpoint=ck)
        raise AssertionError("expected abort after first checkpoint")
    except Abort:
        pass
    assert os.path.exists(ck)

    # a fresh tracer resumes from the checkpoint and must match
    sc3 = mini_cbox(res=32, budget=24, max_depth=4)
    tr2 = GuidedPathTracer(sc3)
    out = np.asarray(tr2.render(seed=3, checkpoint=ck))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_checkpoint_mismatch_starts_fresh(tmp_path):
    ck = str(tmp_path / "r.ckpt")
    sc = mini_cbox(res=24, budget=8, max_depth=4)
    tr = GuidedPathTracer(sc)
    img1 = np.asarray(tr.render(seed=1, checkpoint=ck))
    # checkpoint written with seed 1 must not poison a seed-2 render
    sc2 = mini_cbox(res=24, budget=8, max_depth=4)
    img2 = np.asarray(GuidedPathTracer(sc2).render(seed=2, checkpoint=ck))
    assert np.isfinite(img2).all()
    assert abs(img2.mean() - img1.mean()) / max(img1.mean(), 1e-9) < 0.5
