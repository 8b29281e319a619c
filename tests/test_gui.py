"""Progressive render viewer (the mtsgui stand-in) under the headless
Agg backend."""

import os
import tempfile

import numpy as np

from ppg_tpu.scene.testscenes import MINI_CBOX


def test_gui_headless_progressive(tmp_path):
    from ppg_tpu.tools.gui import run_gui, tonemap

    xml = MINI_CBOX.format(res=24, budget=4, max_depth=4, nee="never")
    p = tmp_path / "s.xml"
    p.write_text(xml)
    out = tmp_path / "view.png"
    pr = run_gui(str(p), updates=2, spp_per_update=2, out=str(out),
                 chunk=576)
    assert pr.spp == 4
    assert out.exists()
    assert np.isfinite(pr.acc).all() and pr.acc.mean() > 0.01
    tm = tonemap(pr.acc, exposure=1.0)
    assert tm.max() <= 1.0 and tm.min() >= 0.0
