"""Procedural texture tests (checkerboard/gridtexture rasterized into the
atlas, reference src/textures/{checkerboard,gridtexture}.cpp)."""

import os
import tempfile

import numpy as np

from ppg_tpu.integrators.driver import make_config, render
from ppg_tpu.scene.scene import load_scene

_SCENE = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="2"/></integrator>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld">
  <lookat origin="0, 2, 2.5" target="0, 0, 0" up="0, 1, 0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
 <film type="hdrfilm"><integer name="width" value="32"/>
  <integer name="height" value="32"/><rfilter type="box"/></film></sensor>
<shape type="rectangle"><transform name="toWorld">
  <rotate x="1" angle="-90"/><scale value="2"/></transform>
 <bsdf type="diffuse">{texture}</bsdf></shape>
<emitter type="directional"><vector name="direction" x="0" y="-1" z="0"/>
 <rgb name="irradiance" value="3, 3, 3"/></emitter>
</scene>"""


def _render(texture_xml):
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SCENE.format(texture=texture_xml))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False, do_nee=True)
        return render(sc, spp=32, chunk=1024, cfg=cfg)
    finally:
        os.unlink(path)


def test_checkerboard():
    img = _render(
        '<texture name="reflectance" type="checkerboard">'
        '<rgb name="color0" value="0.9, 0.1, 0.1"/>'
        '<rgb name="color1" value="0.1, 0.1, 0.9"/>'
        '<float name="uscale" value="4"/><float name="vscale" value="4"/>'
        '</texture>')
    r, b = img[..., 0], img[..., 2]
    assert (r > 2 * b).mean() > 0.1
    assert (b > 2 * r).mean() > 0.1


def test_gridtexture():
    img = _render(
        '<texture name="reflectance" type="gridtexture">'
        '<rgb name="color0" value="0.8, 0.8, 0.8"/>'
        '<rgb name="color1" value="0.05, 0.05, 0.05"/>'
        '<float name="lineWidth" value="0.1"/>'
        '<float name="uscale" value="4"/><float name="vscale" value="4"/>'
        '</texture>')
    lum = img.mean(-1)
    lit = lum[lum > 0]
    # field pixels bright, line pixels dark
    assert (lit > 0.4).mean() > 0.4
    assert (lit < 0.2).mean() > 0.05


class TestMipFiltering:
    def _atlas(self):
        import jax.numpy as jnp
        import numpy as np

        from ppg_tpu.scene.textures import TextureAtlas

        # high-frequency checker: mip top level converges to the mean
        img = np.zeros((64, 64, 3), np.float32)
        img[::2, ::2] = 1.0
        img[1::2, 1::2] = 1.0

        import tempfile, os
        from PIL import Image

        f = tempfile.NamedTemporaryFile(suffix=".png", delete=False)
        Image.fromarray((img * 255).astype(np.uint8)).save(f.name)
        atlas = TextureAtlas.build(
            [dict(_otype="bitmap", filename=f.name, gamma=1.0)], "/")
        os.unlink(f.name)
        return atlas

    def test_mip_chain_halves(self):
        import numpy as np

        atlas = self._atlas()
        mm = np.asarray(atlas.mip_meta).reshape(-1, 13, 3)
        assert tuple(mm[1, 0, 1:]) == (64, 64)
        assert tuple(mm[1, 1, 1:]) == (32, 32)
        assert tuple(mm[1, 6, 1:]) == (1, 1)
        assert tuple(mm[1, 12, 1:]) == (1, 1)  # repeats the top

    def test_minified_lookup_averages(self):
        import jax.numpy as jnp
        import numpy as np

        from ppg_tpu.scene.textures import sample_atlas

        atlas = self._atlas()
        tid = jnp.ones(4, jnp.int32)
        uv = jnp.asarray([[0.1, 0.1], [0.4, 0.7], [0.9, 0.2], [0.5, 0.5]])
        # footprint covering the whole texture -> area average ~0.5
        big = jnp.full((4, 2), 1.0)
        v = np.asarray(sample_atlas(atlas, tid, uv, big))
        np.testing.assert_allclose(v, 0.5, atol=0.05)
        # near-zero footprint -> base level point sample
        small = jnp.full((4, 2), 1e-8)
        v0 = np.asarray(sample_atlas(atlas, tid, uv, small))
        vb = np.asarray(sample_atlas(atlas, tid, uv))
        np.testing.assert_allclose(v0, vb, atol=1e-5)
