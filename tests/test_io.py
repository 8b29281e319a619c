import os

import numpy as np
import pytest

from ppg_tpu.io import exr
from ppg_tpu.io.obj import load_obj

REF = "/root/reference/scenes"


def test_exr_roundtrip_float(tmp_path):
    x = np.random.RandomState(0).rand(33, 65, 3).astype(np.float32) * 10
    p = str(tmp_path / "a.exr")
    exr.write(p, x, pixel_type="float")
    y, ch = exr.read(p)
    assert ch == ["R", "G", "B"]
    np.testing.assert_array_equal(x, y)


def test_exr_roundtrip_half_zip(tmp_path):
    x = np.random.RandomState(1).rand(100, 37, 3).astype(np.float32)
    p = str(tmp_path / "b.exr")
    exr.write(p, x, pixel_type="half", compression="zip")
    y, _ = exr.read(p)
    assert np.abs(x - y).max() < 1e-3


def test_exr_single_channel(tmp_path):
    x = np.random.RandomState(2).rand(16, 16).astype(np.float32)
    p = str(tmp_path / "c.exr")
    exr.write(p, x, pixel_type="float", compression="none")
    y, ch = exr.read(p)
    assert ch == ["Y"]
    np.testing.assert_array_equal(x, y[:, :, 0])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_exr_reads_reference_goldens():
    img, ch = exr.read(os.path.join(REF, "cbox/cbox.exr"))
    assert img.shape == (512, 512, 3)
    assert ch == ["R", "G", "B"]
    assert 0.1 < img.mean() < 1.0
    img2, _ = exr.read(os.path.join(REF, "kitchen/kitchen-reference.exr"))
    assert img2.shape == (400, 700, 3)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_obj_loader_cbox():
    m = load_obj(os.path.join(REF, "cbox/meshes/cbox_luminaire.obj"))
    assert m["faces"].shape == (2, 3)  # one quad -> two tris
    assert m["positions"].shape == (4, 3)
    assert m["normals"] is None


def test_obj_negative_and_mixed_indices(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\n"
        "f 1//1 2//1 3//1\nf -4//-1 -2//-1 -1//-1\n"
    )
    m = load_obj(str(p))
    assert m["faces"].shape == (2, 3)
    assert m["normals"].shape[1] == 3
