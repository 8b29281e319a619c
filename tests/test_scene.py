import os

import numpy as np
import pytest

from ppg_tpu.core import spectrum as spec
from ppg_tpu.core import transform as tf

REF = "/root/reference/scenes"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


def test_constant_spectrum_converts_near_identity():
    # a flat reflectance spectrum covering the full CIE range maps to an
    # equal-energy XYZ, i.e. the Rec709 rendition of illuminant E
    rgb = spec.spectrum_to_rgb([360, 830], [0.75, 0.75], zero_extend=False)
    xyz = spec.rgb_to_xyz(rgb)
    np.testing.assert_allclose(xyz, [0.75, 0.75, 0.75], atol=1e-3)


def test_luminance_roundtrip():
    rgb = np.array([0.2, 0.5, 0.8])
    assert abs(spec.luminance(rgb) - spec.rgb_to_xyz(rgb)[1]) < 1e-12


def test_d65_unit_luminance():
    d65 = spec.d65_rgb()
    assert abs(spec.luminance(d65) - 1.0) < 1e-6
    # D65 is bluish in linear RGB
    assert d65[2] > d65[0]


def test_lookat_matches_mitsuba_convention():
    m = tf.look_at([278, 273, -800], [278, 273, -799], [0, 1, 0])
    # camera z axis = viewing direction
    np.testing.assert_allclose(m[:3, 2], [0, 0, 1], atol=1e-12)
    # camera x axis = 'left' = up x dir
    np.testing.assert_allclose(m[:3, 0], [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(m[:3, 3], [278, 273, -800])


def test_transform_compose_order():
    from ppg_tpu.scene.xml_parser import _parse_transform
    import xml.etree.ElementTree as ET

    # scale then translate: point (1,0,0) -> (2,0,0) -> (5,0,0)
    e = ET.fromstring(
        '<transform name="toWorld"><scale value="2"/>'
        '<translate x="3"/></transform>'
    )
    m = _parse_transform(e, {})
    np.testing.assert_allclose(tf.apply_point(m, [1, 0, 0]), [5, 0, 0])


@needs_ref
def test_cbox_scene_builds():
    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(os.path.join(REF, "cbox/cbox.xml"))
    assert sc.num_tris == 36
    assert sc.emitters.num == 1
    # luminaire: 130x105 area at y=548.8 (two triangles)
    assert abs(1.0 / sc.emitters.inv_area[0] - 130 * 105) < 1e-3
    assert sc.integrator["type"] == "guided_path"
    assert sc.integrator["budgetType"] == "spp"
    assert sc.film["rfilter"] == "box"
    # all five materials are diffuse
    assert (sc.materials.mtype == 0).all()
    # the emitter radiance is strongly red-dominant
    r = sc.emitters.radiance[0]
    assert r[0] > r[1] > r[2] > 0


@needs_ref
def test_spaceship_scene_builds_with_missing_meshes():
    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(os.path.join(REF, "spaceship/spaceship.xml"))
    assert sc.num_tris > 1000
    assert sc.emitters.num >= 1


def test_defaults_substitution(tmp_path):
    p = tmp_path / "s.xml"
    p.write_text(
        """<scene version="0.5.0">
        <default name="res" value="64"/>
        <integrator type="path"><integer name="maxDepth" value="$depth"/></integrator>
        <sensor type="perspective"><float name="fov" value="45"/>
          <film type="hdrfilm"><integer name="width" value="$res"/>
          <integer name="height" value="$res"/></film>
        </sensor></scene>"""
    )
    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(str(p), defaults={"depth": 7})
    assert sc.integrator["maxDepth"] == 7
    assert sc.film["width"] == 64


def test_bvh8_from_inside_sphere_jitted():
    """Regression: rays cast from inside a tessellated sphere must hit it
    under jit. The XLA TPU backend miscompiled the fused leaf-triangle
    where-chain when non-leaf lanes fed NaN intermediates (mass misses);
    leaf inputs are now sanitized per lane."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppg_tpu.accel import traverse as TR
    from ppg_tpu.scene.shapes import make_sphere

    mesh = make_sphere(np.zeros(3), 100.0)
    geom = TR.build_geometry(mesh.positions, mesh.faces)
    rng = np.random.default_rng(3)
    L = 256
    dirs = rng.normal(size=(L, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = jnp.zeros((L, 3))
    d = jnp.asarray(dirs, jnp.float32)
    tmin = jnp.zeros(L)
    tmax = jnp.full(L, 1e9)
    oi, ot, _, _ = jax.jit(TR.bvh_closest)(geom, o, d, tmin, tmax)
    oi = np.asarray(oi)
    ot = np.asarray(ot)
    assert (oi >= 0).all(), f"missed {int((oi < 0).sum())}/{L} from inside"
    assert np.allclose(ot, 100.0, atol=0.5)


def test_bvh8_matches_brute_on_deep_random_soup():
    """Referee test on a tree deep enough to exercise the group stacks
    and the SoA 16-wide leaves: bvh_closest must agree with the
    brute-force sweep exactly on hit index (and t within fp tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppg_tpu.accel import traverse as TR

    rng = np.random.default_rng(11)
    T = 20000
    # clustered tris: deep, uneven BVH
    centers = rng.normal(size=(T, 1, 3)) * np.array([5.0, 1.0, 5.0])
    tris = centers + rng.normal(size=(T, 3, 3)) * 0.4
    positions = tris.reshape(-1, 3)
    faces = np.arange(3 * T, dtype=np.int32).reshape(-1, 3)
    geom = TR.build_geometry(positions, faces)
    W = geom.wide
    assert geom.rows.shape[1] == max(7 * W, 9 * W + 2)

    L = 512
    o = jnp.asarray(rng.normal(size=(L, 3)) * 4.0, jnp.float32)
    d = rng.normal(size=(L, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    tmin = jnp.zeros(L)
    tmax = jnp.full(L, 1e9)
    bi, bt, bu, bv = jax.jit(TR.bvh_closest)(geom, o, d, tmin, tmax)
    ri, rt, ru, rv = jax.jit(TR.brute_force_closest)(geom, o, d, tmin, tmax)
    bi, bt = np.asarray(bi), np.asarray(bt)
    ri, rt = np.asarray(ri), np.asarray(rt)
    hit = ri >= 0
    assert hit.sum() > L // 4  # the scene is dense enough to be a real test
    # identical triangle unless two tris tie in t within fp noise
    disagree = (bi != ri)
    tie = np.abs(np.where(hit, bt, 0) - np.where(hit, rt, 0)) < 1e-4
    assert (disagree & ~tie).sum() == 0, int((disagree & ~tie).sum())
    np.testing.assert_allclose(bt[hit], rt[hit], rtol=1e-4, atol=1e-4)
