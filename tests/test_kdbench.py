"""kdbench utility (reference: mitsuba/src/utils/kdbench.cpp — accel
benchmark + exhaustive verification)."""

import json
import os

import pytest

from ppg_tpu.tools import kdbench


@pytest.mark.skipif(not os.path.isdir("/root/reference/scenes"),
                    reason="no reference mount")
def test_kdbench_cbox_verifies():
    out = kdbench.bench("/root/reference/scenes/cbox/cbox.xml",
                        lanes=4096, verify=2048, reps=1)
    assert out["tris"] > 0
    assert out["camera_hit_rate"] > 0.9  # box interior: camera rays hit
    assert out["mismatches"] == 0
    json.dumps(out)  # JSON-serializable
