"""Dipole subsurface scattering (reference src/subsurface/dipole.cpp)."""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_dipole_kernel_matches_reference_formula():
    import jax.numpy as jnp

    from ppg_tpu.subsurface import (PT_BLOCK, SubsurfArrays, dipole_params,
                                    lo_sub)
    from ppg_tpu.bsdf.fresnel import (fresnel_dielectric_ext,
                                      fresnel_diffuse_reflectance)

    row = dict(sigma_s=[2.0, 2.5, 3.0], sigma_a=[0.01, 0.02, 0.04],
               g=0.0, eta=1.3)
    prm = dipole_params(row)
    # one sample point at origin with E=(1,1,1), area 1
    P = PT_BLOCK
    pts = np.zeros((P, 3), np.float32)
    E = np.zeros((P, 3), np.float32)
    E[0] = 1.0
    area = np.zeros(P, np.float32)
    area[0] = 1.0
    pt_ss = np.full(P, -1, np.int32)
    pt_ss[0] = 0
    ss = SubsurfArrays(jnp.asarray(prm[None]), jnp.asarray(pts),
                       jnp.asarray(E), jnp.asarray(area),
                       jnp.asarray(pt_ss), jnp.zeros(1, jnp.int32), num=1)
    r = 0.3
    p = jnp.asarray([[r, 0, 0]], jnp.float32)
    out = np.asarray(lo_sub(ss, jnp.zeros(1, jnp.int32), p,
                            jnp.ones(1)))[0]

    zr, zv, st = prm[0:3], prm[3:6], prm[6:9]
    dr = np.sqrt(r * r + zr ** 2)
    dv = np.sqrt(r * r + zv ** 2)
    dmo = (1 / (4 * np.pi)) * (
        zr * (st + 1 / dr) * np.exp(-st * dr) / dr ** 2
        + zv * (st + 1 / dv) * np.exp(-st * dv) / dv ** 2)
    want = dmo / np.pi * (1 - float(np.asarray(
        fresnel_dielectric_ext(jnp.asarray([1.0]), jnp.asarray([1.3]))[0])))
    np.testing.assert_allclose(out, want, rtol=1e-4)
    # facing away -> zero
    back = np.asarray(lo_sub(ss, jnp.zeros(1, jnp.int32), p,
                             -jnp.ones(1)))[0]
    np.testing.assert_array_equal(back, 0.0)


def test_dipole_end_to_end_render():
    from ppg_tpu.integrators.driver import make_config, render
    from ppg_tpu.scene.scene import load_scene

    xml = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="3"/></integrator>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld"><lookAt origin="0,0,-4" target="0,0,0" up="0,1,0"/></transform>
 <sampler type="independent"/><film type="hdrfilm">
 <integer name="width" value="16"/><integer name="height" value="16"/>
 <rfilter type="box"/></film></sensor>
<shape type="sphere"><float name="radius" value="1"/>
 <subsurface type="dipole">
   <rgb name="sigmaS" value="2, 2.5, 3"/>
   <rgb name="sigmaA" value="0.01, 0.02, 0.04"/>
   <integer name="irrSamples" value="8"/>
 </subsurface>
 <bsdf type="plastic"><rgb name="diffuseReflectance" value="0,0,0"/></bsdf>
</shape>
<emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
</scene>"""
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        p = f.name
    try:
        sc = load_scene(p)
        assert len(sc.subsurfaces) == 1
        cfg = make_config(sc, guiding=False)
        assert cfg.has_subsurf
        img = render(sc, spp=8, chunk=256, cfg=cfg)
    finally:
        os.unlink(p)
    assert np.isfinite(img).all()
    # the translucent sphere glows: its pixels carry subsurface energy
    center = img[6:10, 6:10].mean()
    assert center > 0.05, center


def test_blue_noise_poisson_property():
    """blueNoisePointSet analog (bluenoise.cpp): every pair of accepted
    points is >= radius apart, and the count approaches Poisson-disk
    saturation density on a flat quad."""
    from ppg_tpu.subsurface import blue_noise_points

    # unit quad in the xy plane
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                         np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    rng = np.random.default_rng(3)
    radius = 0.05
    pts, tri_of, total = blue_noise_points(
        positions, faces, np.arange(2), radius, rng)
    assert abs(total - 1.0) < 1e-6
    assert tri_of.shape == (len(pts),)
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, -1)
    d2[np.arange(len(pts)), np.arange(len(pts))] = 1e9
    assert d2.min() >= radius * radius * (1 - 1e-6)
    # saturation: between ~30% and ~91% (hex packing) of pi r^2/4 disks
    dense = 1.0 / (np.pi * radius ** 2 / 4)
    assert 0.3 * dense < len(pts) < 0.91 * dense


def test_blue_noise_feeds_dipole_build():
    """build_subsurface picks blue noise when the radius is coarse
    enough and the padded set stays a PT_BLOCK multiple with the total
    area preserved."""
    from ppg_tpu.subsurface import PT_BLOCK, blue_noise_points

    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                         np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    rng = np.random.default_rng(5)
    pts, tri_of, total = blue_noise_points(
        positions, faces, np.arange(2), 0.12, rng)
    assert len(pts) > 10
    # normals come from the owning triangle: all +z here
    v = positions[faces[tri_of]]
    fn = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    assert np.all(fn[:, 2] > 0)
