"""Film output formats: ldrfilm (PNG, ldrfilm.cpp), mfilm (matlab text,
mfilm.cpp), hdrfilm EXR default."""

import os
import tempfile

import numpy as np

from ppg_tpu.cli import _write_film


def test_ldrfilm_png(tmp_path):
    img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    out = str(tmp_path / "x.png")
    _write_film(out, img, {"type": "ldrfilm"})
    from PIL import Image

    back = np.asarray(Image.open(out)).astype(np.float32) / 255.0
    # sRGB roundtrip within quantization
    srgb = np.where(img <= 0.0031308, img * 12.92,
                    1.055 * img ** (1 / 2.4) - 0.055)
    assert np.abs(back - srgb).max() < 1.0 / 255 + 1e-3


def test_mfilm_matlab_text(tmp_path):
    img = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    out = str(tmp_path / "x.m")
    _write_film(out, img, {"type": "mfilm"})
    txt = open(out).read()
    assert txt.count("[") == 3 and ";" in txt and "," in txt


def test_cli_renders_ldr_scene(tmp_path):
    from ppg_tpu import cli

    xml = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld"><lookAt origin="0,1,-3" target="0,1,0" up="0,1,0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
 <film type="ldrfilm"><integer name="width" value="8"/>
  <integer name="height" value="8"/><rfilter type="box"/></film></sensor>
<shape type="rectangle"><transform name="toWorld"><rotate x="1" angle="-90"/></transform>
 <bsdf type="diffuse"/></shape>
<emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
</scene>"""
    p = tmp_path / "s.xml"
    p.write_text(xml)
    out = tmp_path / "s_out.png"
    cli.main([str(p), "-o", str(out), "--chunk", "64"])
    assert out.exists()
