"""Deformable (keyframe) shape (src/shapes/deformable.cpp): nested
frame shapes + times, linear vertex interpolation at the evaluation
time (single-sample snapshot — documented deviation from the 4D
space-time kd-tree)."""

import os
import textwrap

import numpy as np


def _load(tmp_path, time_attr):
    xml = os.path.join(tmp_path, f"d{time_attr}.xml")
    with open(xml, "w") as f:
        f.write(textwrap.dedent(f"""\
            <scene version="0.5.0">
              <shape type="deformable">
                <string name="times" value="0, 1"/>
                <float name="time" value="{time_attr}"/>
                <shape type="sphere">
                  <point name="center" x="0" y="0" z="0"/>
                </shape>
                <shape type="sphere">
                  <point name="center" x="2" y="0" z="0"/>
                </shape>
                <bsdf type="diffuse"/>
              </shape>
            </scene>"""))
    from ppg_tpu.scene.scene import load_scene

    return load_scene(xml)


def test_deformable_interpolates(tmp_path):
    sc0 = _load(tmp_path, 0.0)
    sc5 = _load(tmp_path, 0.5)
    sc1 = _load(tmp_path, 1.0)
    c0 = sc0.positions.mean(0)
    c5 = sc5.positions.mean(0)
    c1 = sc1.positions.mean(0)
    # tessellation centroid has a small pole bias; deltas are exact
    assert np.allclose(c5 - c0, [1.0, 0.0, 0.0], atol=1e-6)
    assert np.allclose(c1 - c0, [2.0, 0.0, 0.0], atol=1e-6)
    assert sc0.num_tris == sc5.num_tris == sc1.num_tris
    # interpolated normals stay unit
    n = sc5.normals
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


def test_deformable_clamps_out_of_range(tmp_path):
    sc1 = _load(tmp_path, 1.0)
    sc = _load(tmp_path, 5.0)  # past the last frame -> clamp
    assert np.allclose(sc.positions, sc1.positions, atol=1e-6)
