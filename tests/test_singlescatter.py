"""Single-scattering subsurface (reference src/subsurface/singlescatter.cpp,
Holzschuch 2014 fast path): scene parsing, a brute-force quadrature oracle
of the estimator on an analytic cube, continuation semantics, and an
end-to-end render."""

import os
import tempfile

import numpy as np
import pytest

CUBE_SS_XML = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="4"/></integrator>
<sensor type="perspective"><float name="fov" value="45"/>
 <transform name="toWorld">
   <lookAt origin="0,0,4" target="0,0,0" up="0,1,0"/></transform>
 <sampler type="independent"/><film type="hdrfilm">
 <integer name="width" value="16"/><integer name="height" value="16"/>
 <rfilter type="box"/></film></sensor>
<shape type="cube">
 <subsurface type="singlescatter">
   <rgb name="sigmaS" value="0.6, 0.8, 1.0"/>
   <rgb name="sigmaA" value="0.05, 0.1, 0.2"/>
   <rgb name="g" value="0.1, 0.1, 0.1"/>
   <integer name="fssSamples" value="2"/>
   <integer name="singleScatterDepth" value="3"/>
   <bsdf type="dielectric"><float name="intIOR" value="1.5"/>
     <float name="extIOR" value="1.0"/></bsdf>
 </subsurface>
</shape>
<emitter type="point">
 <point name="position" x="0" y="3" z="0"/>
 <spectrum name="intensity" value="10"/></emitter>
</scene>"""


def _load(xml):
    from ppg_tpu.scene.scene import load_scene

    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        p = f.name
    try:
        return load_scene(p)
    finally:
        os.unlink(p)


def test_parse_singlescatter_row():
    sc = _load(CUBE_SS_XML)
    assert len(sc.subsurfaces) == 1
    row = sc.subsurfaces[0]
    assert row["kind"] == "singlescatter"
    # eta comes from the CHILD BSDF (singlescatter.cpp configure())
    np.testing.assert_allclose(row["eta"], 1.5 / 1.0, rtol=1e-6)
    assert row["fast"] is True
    assert row["fss_samples"] == 2
    assert row["ss_depth"] == 3
    np.testing.assert_allclose(row["g3"], [0.1, 0.1, 0.1])

    from ppg_tpu.integrators.driver import make_config, regen_eligible

    cfg = make_config(sc, guiding=False)
    assert cfg.has_sss and not cfg.has_subsurf
    assert not regen_eligible(sc, cfg)


def test_parse_sigmat_albedo_alternative():
    xml = CUBE_SS_XML.replace(
        '<rgb name="sigmaS" value="0.6, 0.8, 1.0"/>',
        '<rgb name="sigmaT" value="1.0, 2.0, 4.0"/>').replace(
        '<rgb name="sigmaA" value="0.05, 0.1, 0.2"/>',
        '<rgb name="albedo" value="0.5, 0.25, 0.75"/>')
    sc = _load(xml)
    row = sc.subsurfaces[0]
    np.testing.assert_allclose(row["sigma_s"], [0.5, 0.5, 3.0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(row["sigma_s"]) + np.asarray(row["sigma_a"]),
        [1.0, 2.0, 4.0], rtol=1e-6)


# ---------------------------------------------------------------------------
# numpy oracle: dense quadrature of the fast-path estimator on the unit cube
# ---------------------------------------------------------------------------

def _fresnel_ext_np(ci, eta):
    """numpy transcription of fresnelDielectricExt (signed cos_i)."""
    scale = 1.0 / eta if ci > 0 else eta
    cos_t2 = 1.0 - (1.0 - ci * ci) * scale * scale
    if cos_t2 <= 0:
        return 1.0, 0.0
    a = abs(ci)
    ct = np.sqrt(cos_t2)
    rs = (a - eta * ct) / (a + eta * ct)
    rp = (eta * a - ct) / (eta * a + ct)
    return 0.5 * (rs * rs + rp * rp), (-ct if ci > 0 else ct)


def _box_exit(o, d):
    """Exit distance + OUTWARD face normal of a ray inside [-1,1]^3."""
    best_t, best_n = np.inf, None
    for ax in range(3):
        if abs(d[ax]) < 1e-12:
            continue
        t = ((1.0 if d[ax] > 0 else -1.0) - o[ax]) / d[ax]
        if 0 < t < best_t:
            n = np.zeros(3)
            n[ax] = 1.0 if d[ax] > 0 else -1.0
            best_t, best_n = t, n
    return best_t, best_n


def _hg_np(c, g):
    temp = 1.0 + g * g + 2.0 * g * c
    return (1.0 / (4 * np.pi)) * (1 - g * g) / (temp * np.sqrt(
        np.maximum(temp, 1e-12)))


def _oracle_cube(sigma_s, sigma_a, g, eta, fss, depth, L_pos, I, eps,
                 n_quad=8192):
    """Quadrature of the per-segment expectation of singlescatter.cpp's
    fast path (:1416-1488) for an entry at (0,0,1) straight down, summed
    over the deterministic internal-reflection chain (:1376-1403)."""
    sigma_s = np.asarray(sigma_s, np.float64)
    sigma_t = sigma_s + np.asarray(sigma_a, np.float64)
    g = np.asarray(g, np.float64)
    r = float(np.min(1.0 / sigma_t))
    F_in, _ = _fresnel_ext_np(1.0, eta)

    p_cur = np.array([0.0, 0.0, 1.0 - eps])
    d_cur = np.array([0.0, 0.0, -1.0])
    w_seg = np.full(3, 1.0 - F_in)
    total = np.zeros(3)
    u = (np.arange(n_quad) + 0.5) / n_quad
    for dep in range(depth):
        thick, n_exit_out = _box_exit(p_cur, d_cur)
        dist_em = np.linalg.norm(L_pos - p_cur)
        value = (np.asarray(I, np.float64) / dist_em ** 2) * eta * eta
        s_max = 1.0 - np.exp(-thick / r)
        w0 = (s_max / fss) * r * dist_em ** 2 * sigma_s
        seg = np.zeros(3)
        for ui in u:
            dist = -np.log(max(1.0 - ui * s_max, 1e-30)) * r
            if dist > thick:
                continue
            V = p_cur + dist * d_cur
            VL = L_pos - V
            dVL = np.linalg.norm(VL)
            vl = VL / dVL
            t_b, n_b = _box_exit(V, vl)
            if t_b > dVL * (1 - 1e-4):
                continue
            P = V + t_b * vl
            omega_l = L_pos - P
            d_l = np.linalg.norm(omega_l)
            omega_l /= d_l
            omega_v = V - P
            d_v = np.linalg.norm(omega_v)
            omega_v /= d_v
            cos_l = float(np.dot(omega_l, n_b))
            cos_v = float(np.dot(omega_v, n_b))
            if abs(cos_l) <= 1e-7 or abs(cos_v) <= 1e-7:
                continue
            F_b, _ = _fresnel_ext_np(cos_l, eta)
            phase = _hg_np(np.dot(omega_v, d_cur), g) * np.exp(
                -sigma_t * (dist + d_v))
            D = (d_v + eta * d_l) * (abs(cos_l / cos_v) * d_v
                                     + abs(cos_v / cos_l) * eta * d_l)
            seg += ((1 - F_b) / D) * phase * value * w0 * np.exp(dist / r)
        total += w_seg * (fss * seg / n_quad)
        # internal mirror bounce: n_x faces inward, cos_x = dot(n_x,-d)
        n_x = -n_exit_out
        cos_x = float(np.dot(n_x, -d_cur))
        F_x, _ = _fresnel_ext_np(-cos_x, eta)
        p_x = p_cur + thick * d_cur
        d_cur = d_cur + 2.0 * cos_x * n_x
        d_cur /= np.linalg.norm(d_cur)
        p_cur = p_x + n_x * eps
        w_seg = w_seg * F_x * np.exp(-sigma_t * thick)
    return total


def test_single_scatter_matches_quadrature_oracle():
    import jax
    import jax.numpy as jnp

    from ppg_tpu.integrators.driver import ensure_subsurface, make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.singlescatter import single_scatter

    sc = _load(CUBE_SS_XML)
    dev = ensure_subsurface(sc, DeviceScene.from_scene(sc))
    cfg = make_config(sc, guiding=False)
    assert dev.sss.num == 1 and dev.sss.fss == 2 and dev.sss.depth == 3

    L = 4096
    p = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (L, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (L, 1))
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (L, 1))
    ss_id = jnp.zeros(L, jnp.int32)
    L_ss, cont = single_scatter(dev, cfg, ss_id, p, d, n, n,
                                jax.random.key(7))
    got = np.asarray(L_ss, np.float64)
    mean = got.mean(0)

    row = sc.subsurfaces[0]
    want = _oracle_cube(row["sigma_s"], row["sigma_a"], row["g3"],
                        row["eta"], fss=2, depth=3,
                        L_pos=np.array([0.0, 3.0, 0.0]),
                        I=[10.0, 10.0, 10.0], eps=float(dev.eps))
    assert want.min() > 0
    se = got.std(0) / np.sqrt(L)
    np.testing.assert_allclose(mean, want, rtol=0.05,
                               err_msg=f"se={se}, want={want}")

    # continuation semantics at normal incidence: reflection lanes carry
    # weight 1 and mirror straight back; transmission lanes exit the far
    # face straight through with (1-F_exit) * exp(-sigma_t * 2)
    co = np.asarray(cont["o"])
    cd = np.asarray(cont["d"])
    cw = np.asarray(cont["w"], np.float64)
    refl = cd[:, 2] > 0
    F_in, _ = _fresnel_ext_np(1.0, row["eta"])
    assert abs(refl.mean() - F_in) < 0.02
    np.testing.assert_allclose(
        cd[refl], np.broadcast_to([0, 0, 1.0], cd[refl].shape), atol=1e-5)
    np.testing.assert_allclose(cw[refl], 1.0, atol=1e-5)
    np.testing.assert_allclose(
        cd[~refl], np.broadcast_to([0, 0, -1.0], cd[~refl].shape),
        atol=1e-5)
    assert np.all(co[~refl, 2] < -1.0)  # exits BELOW the bottom face
    sigma_t = np.asarray(row["sigma_s"]) + np.asarray(row["sigma_a"])
    want_w = (1 - F_in) * np.exp(-sigma_t * 2.0)
    np.testing.assert_allclose(cw[~refl].mean(0), want_w, rtol=0.02)


@pytest.mark.slow
def test_singlescatter_end_to_end_render():
    from ppg_tpu.integrators.driver import make_config, render

    sc = _load(CUBE_SS_XML.replace('value="10"', 'value="30"'))
    cfg = make_config(sc, guiding=False)
    img = render(sc, spp=8, chunk=256, cfg=cfg)
    assert np.isfinite(img).all()
    # the cube face glows with interior single scattering
    assert img[4:12, 4:12].mean() > 1e-3, img[4:12, 4:12].mean()
