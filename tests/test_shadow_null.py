"""NEE shadow rays through null/mask BSDFs.

The reference's Scene::evalTransmittance (scene.cpp:619-679, reached via
sampleAttenuatedEmitterDirect) passes shadow segments through surfaces
whose BSDF carries an ENull component: `null` multiplies 1, `mask`
multiplies (1 - opacity) — it does NOT treat them as opaque occluders.
Since both the nee=always and nee=never estimators are unbiased for the
same scene, their equal-scene means must agree; a shadow test that
blocks at the panel instead fails these by darkening nee renders.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ppg_tpu.integrators.driver import make_config, render, render_regen
from ppg_tpu.scene.testscenes import mini_cbox, mini_cbox_panel


def _mean(img):
    return float(np.asarray(img).mean())


def test_nee_through_mask_matches_no_nee():
    # same masked scene: nee=always must agree with nee=never in the mean
    sc_n = mini_cbox_panel(res=32, nee="never", panel="mask", opacity=0.6)
    sc_a = mini_cbox_panel(res=32, nee="always", panel="mask", opacity=0.6)
    img_n = render(sc_n, spp=384, seed=1)
    img_a = render(sc_a, spp=96, seed=2)
    m_n, m_a = _mean(img_n), _mean(img_a)
    assert abs(m_n - m_a) / m_n < 0.06, (m_n, m_a)


def test_nee_through_null_is_fully_transparent():
    # a null panel must not change the nee=always estimate at all.
    # max_depth is deep because a null crossing consumes a depth level
    # exactly like the reference (guided_path.cpp ENull branch does
    # `rRec.depth++`), so shallow budgets legitimately lose deep energy
    sc_p = mini_cbox_panel(res=32, nee="always", panel="null",
                           max_depth=24)
    sc_0 = mini_cbox(res=32, nee="always", max_depth=24)
    img_p = render(sc_p, spp=64, seed=3)
    img_0 = render(sc_0, spp=64, seed=3)
    m_p, m_0 = _mean(img_p), _mean(img_0)
    assert abs(m_p - m_0) / m_0 < 0.05, (m_p, m_0)


def test_mask_shadow_attenuation_scales_with_opacity():
    # direct light through the panel scales like (1 - opacity): compare
    # a nearly-opaque mask against a nearly-transparent one on the
    # ceiling patch right above the panel
    lo = mini_cbox_panel(res=32, nee="always", panel="mask", opacity=0.95)
    hi = mini_cbox_panel(res=32, nee="always", panel="mask", opacity=0.05)
    img_lo = render(lo, spp=64, seed=4)
    img_hi = render(hi, spp=64, seed=4)
    # the masked panel also scatters (nested diffuse), but transmitted
    # direct light dominates: expect a large brightness gap
    assert _mean(img_hi) > 2.0 * _mean(img_lo), (_mean(img_hi),
                                                 _mean(img_lo))


def test_regen_nee_through_mask_agrees_with_classic():
    sc = mini_cbox_panel(res=32, nee="always", panel="mask", opacity=0.6)
    cfg = make_config(sc, guiding=False, record_vertices=False)
    img_c = render(sc, spp=96, seed=5, cfg=cfg)
    img_r = render_regen(sc, spp=96, seed=6, cfg=cfg)
    m_c, m_r = _mean(img_c), _mean(img_r)
    assert abs(m_c - m_r) / m_c < 0.06, (m_c, m_r)
