"""Participating-media tests: Beer-Lambert attenuation through an
absorbing slab, HG phase sample/pdf consistency, energy behavior of a
scattering medium (reference src/medium/homogeneous.cpp +
src/phase/hg.cpp; the integration point is guided_path.cpp:1803-1893)."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppg_tpu import media as MED
from ppg_tpu.integrators.driver import make_config, render
from ppg_tpu.scene.scene import load_scene


class TestPhase:
    def test_hg_pdf_normalized(self):
        rng = np.random.default_rng(0)
        for g in (0.0, 0.4, -0.6, 0.9):
            v = rng.normal(size=(200_000, 3))
            v /= np.linalg.norm(v, axis=-1, keepdims=True)
            ct = v[:, 2].astype(np.float32)
            pdf = np.asarray(MED.hg_eval_pdf(jnp.float32(g), jnp.asarray(ct)))
            integral = pdf.mean() * 4 * np.pi
            assert abs(integral - 1.0) < 0.02, (g, integral)

    def test_hg_sample_matches_pdf(self):
        rng = np.random.default_rng(1)
        for g in (0.0, 0.5, -0.3):
            d_in = jnp.asarray(np.tile([0.0, 0, 1], (100_000, 1)), jnp.float32)
            u = jnp.asarray(rng.random((100_000, 2)), jnp.float32)
            d_out, pdf = MED.hg_sample(jnp.float32(g), d_in, u)
            ct = np.asarray(d_out[:, 2])
            pdf2 = np.asarray(MED.hg_eval_pdf(jnp.float32(g), jnp.asarray(ct)))
            rel = np.abs(np.asarray(pdf) - pdf2) / np.maximum(pdf2, 1e-6)
            assert np.quantile(rel, 0.95) < 1e-3, g
            # forward bias for g > 0
            if g > 0:
                assert ct.mean() > 0.3

    def test_distance_sampling_unbiased(self):
        """E[weight; surface] = T(t_surf) and the medium-event weights
        integrate to sigma_s/sigma_t x (1 - T) per channel."""
        rng = np.random.default_rng(2)
        n = 400_000
        sigma_t = jnp.asarray(np.tile([0.5, 1.0, 2.0], (n, 1)), jnp.float32)
        albedo = jnp.asarray(np.tile([0.8, 0.8, 0.8], (n, 1)), jnp.float32)
        t_surf = jnp.full(n, 1.7, jnp.float32)
        u1 = jnp.asarray(rng.random(n), jnp.float32)
        u2 = jnp.asarray(rng.random(n), jnp.float32)
        is_med, t, w = MED.sample_distance(sigma_t, albedo, t_surf, u1, u2)
        is_med = np.asarray(is_med)
        w = np.asarray(w)
        # surface estimator: mean of surface weights (zeros elsewhere)
        est_surface = np.where(~is_med[:, None], w, 0).mean(axis=0)
        expect_surface = np.exp(-np.array([0.5, 1.0, 2.0]) * 1.7)
        assert np.allclose(est_surface, expect_surface, rtol=0.02), (
            est_surface, expect_surface)
        # medium estimator integrates sigma_s T over [0, t_surf]
        est_medium = np.where(is_med[:, None], w, 0).mean(axis=0)
        expect_medium = 0.8 * (1 - expect_surface)
        assert np.allclose(est_medium, expect_medium, rtol=0.02), (
            est_medium, expect_medium)


_SLAB = """<scene version="0.5.0">
<integrator type="path"><integer name="maxDepth" value="{md}"/></integrator>
<sensor type="perspective"><float name="fov" value="40"/>
 <transform name="toWorld">
  <lookat origin="0, 0, 4" target="0, 0, 0" up="0, 1, 0"/></transform>
 <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
 <film type="hdrfilm"><integer name="width" value="24"/>
  <integer name="height" value="24"/><rfilter type="box"/></film></sensor>
<shape type="cube">
 <bsdf type="null"/>
 <medium name="interior" type="homogeneous">
  <rgb name="sigmaA" value="{sa}, {sa}, {sa}"/>
  <rgb name="sigmaS" value="{ss}, {ss}, {ss}"/>
 </medium>
</shape>
<shape type="rectangle"><transform name="toWorld">
  <translate z="-2"/></transform>
 <emitter type="area"><rgb name="radiance" value="5, 5, 5"/></emitter>
 <bsdf type="diffuse"/></shape>
</scene>"""


def _render_slab(sa, ss, md=6, spp=64):
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(_SLAB.format(sa=sa, ss=ss, md=md))
        path = f.name
    try:
        sc = load_scene(path)
        cfg = make_config(sc, guiding=False)
        return render(sc, spp=spp, chunk=576, cfg=cfg)
    finally:
        os.unlink(path)


class TestMediumRender:
    def test_beer_lambert_absorption(self):
        """Pure absorber (albedo 0) in a unit cube: the emitter seen
        through it must attenuate by exp(-sigma_a * path length). The
        distance-sampling estimator realizes T as a survival fraction, so
        average a pixel block at decent spp."""
        clear = _render_slab(sa=0.0, ss=0.0, spp=128)
        foggy = _render_slab(sa=0.7, ss=0.0, spp=128)
        c = clear[10:14, 10:14, 0].mean()
        f = foggy[10:14, 10:14, 0].mean()
        # center rays pass through the cube (side 2 -> path length ~2)
        expect = np.exp(-0.7 * 2.0)
        assert abs(c - 5.0) / 5.0 < 0.05, c  # sanity: emitter radiance
        assert abs(f / c - expect) / expect < 0.12, (f / c, expect)

    def test_scattering_dims_not_brightens(self):
        """With scattering (no absorption) the directly-seen emitter dims
        and light scatters around it; total energy must not increase."""
        clear = _render_slab(sa=0.0, ss=0.0)
        scat = _render_slab(sa=0.0, ss=0.8, md=8)
        assert scat[12, 12, 0] < clear[12, 12, 0]
        assert scat.mean() <= clear.mean() * 1.05


class TestRayleighPhase:
    def test_pdf_normalized(self):
        rng = np.random.default_rng(2)
        v = rng.normal(size=(200_000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        pdf = np.asarray(MED.rayleigh_eval_pdf(
            jnp.asarray(v[:, 2].astype(np.float32))))
        integral = pdf.mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.02

    def test_sample_matches_pdf_histogram(self):
        # cardano inversion: sampled cos_theta must follow the marginal
        # (3/8)(1 + c^2); chi-square-style binned comparison
        rng = np.random.default_rng(3)
        N = 400_000
        u = jnp.asarray(rng.random((N, 2)), jnp.float32)
        d_in = jnp.asarray(np.tile([0.0, 0, 1], (N, 1)), jnp.float32)
        g = jnp.full((N,), MED.RAYLEIGH_G)
        d_out, pdf = MED.phase_sample(g, d_in, u)
        ct = np.asarray(d_out[:, 2])
        # reported pdf equals the analytic value at the sampled direction
        pdf2 = np.asarray(MED.rayleigh_eval_pdf(jnp.asarray(ct)))
        rel = np.abs(np.asarray(pdf) - pdf2) / np.maximum(pdf2, 1e-6)
        assert np.quantile(rel, 0.95) < 1e-3
        hist, edges = np.histogram(ct, bins=32, range=(-1, 1), density=True)
        mid = 0.5 * (edges[:-1] + edges[1:])
        expect = (3.0 / 8.0) * (1.0 + mid * mid)
        assert np.abs(hist - expect).max() < 0.02

    def test_phase_dispatch_mixes_lanes(self):
        # lanes with |g|<=1 use HG, sentinel lanes use Rayleigh
        u = jnp.asarray(np.random.default_rng(4).random((1000, 2)),
                        jnp.float32)
        d_in = jnp.asarray(np.tile([0.0, 0, 1], (1000, 1)), jnp.float32)
        g = jnp.where(jnp.arange(1000) % 2 == 0, MED.RAYLEIGH_G, 0.9)
        d_out, pdf = MED.phase_sample(g, d_in, u)
        ct = np.asarray(d_out[:, 2])
        # hg g=0.9 lanes are strongly forward; rayleigh lanes are symmetric
        assert ct[1::2].mean() > 0.7
        assert abs(ct[0::2].mean()) < 0.05


class TestKajiyaKayPhase:
    def _pp(self, axis, ks=1.0, kd=0.0, exponent=4.0):
        row = np.zeros((1, MED.ROW_W), np.float32)
        row[0, 6] = MED.KKAY_G
        row[0, 28:31] = axis
        row[0, 31] = ks
        row[0, 32] = kd
        row[0, 33] = exponent
        row[0, 34] = MED.kkay_normalization(exponent)
        return MED.PhaseParams(jnp.full(1, MED.KKAY_G), jnp.asarray(row))

    def test_perpendicular_normalization(self):
        # ks=1, kd=0, light perpendicular to the fiber: phase integrates
        # to 1 over the sphere (the reference's normalization criterion)
        pp = self._pp([0, 0, 1.0])
        rng = np.random.default_rng(5)
        N = 200_000
        v = rng.normal(size=(N, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        d_in = jnp.asarray(np.tile([1.0, 0, 0], (N, 1)), jnp.float32)
        row = jnp.tile(pp.row, (N, 1))
        ppN = MED.PhaseParams(jnp.full(N, MED.KKAY_G), row)
        vals = np.asarray(MED.phase_eval(ppN, d_in, jnp.asarray(
            v, jnp.float32)))
        integral = vals.mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.03, integral

    def test_sample_weight_equals_eval_over_pdf(self):
        pp = self._pp([0, 1.0, 0], ks=0.5, kd=0.3)
        N = 4096
        rng = np.random.default_rng(6)
        row = jnp.tile(pp.row, (N, 1))
        ppN = MED.PhaseParams(jnp.full(N, MED.KKAY_G), row)
        d_in = jnp.asarray(np.tile([0.0, 0, 1.0], (N, 1)), jnp.float32)
        u = jnp.asarray(rng.random((N, 2)), jnp.float32)
        d_out, pdf, w = MED.phase_sample_full(ppN, d_in, u)
        ev = np.asarray(MED.phase_eval(ppN, d_in, d_out))
        np.testing.assert_allclose(np.asarray(pdf), 1 / (4 * np.pi),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(w), ev * 4 * np.pi,
                                   rtol=1e-4, atol=1e-6)

    def test_zero_orientation_falls_back_to_diffuse(self):
        pp = self._pp([0.0, 0, 0], ks=0.7, kd=0.2)
        d = jnp.asarray([[0.0, 0, 1.0]], jnp.float32)
        v = np.asarray(MED.phase_eval(pp, d, d))
        np.testing.assert_allclose(v, 0.2 / (4 * np.pi), rtol=1e-5)


class TestPhaseChi2:
    """Pooled-significance chi^2 GOF for the phase family (the
    reference runs its ChiSquare harness over phase plugins in
    test_chisquare.cpp; chisquare.h:81-143 pooling + significance)."""

    def _run(self, gval, seed):
        from chi2util import run_sphere_chi2

        n = 200_000
        rng = np.random.default_rng(seed)
        g = jnp.full(n, gval, jnp.float32)
        d_in = jnp.broadcast_to(
            jnp.asarray([0.36, -0.48, 0.8], jnp.float32), (n, 3))
        u = jnp.asarray(rng.random((n, 2)), jnp.float32)
        d_out, _pdf = MED.phase_sample(g, d_in, u)
        din1 = np.asarray([0.36, -0.48, 0.8])

        def pdf_fn(dirs):
            ct = dirs @ din1
            return np.asarray(MED.phase_eval_pdf(
                jnp.full(len(dirs), gval, jnp.float32),
                jnp.asarray(ct, jnp.float32)))

        ok, stats = run_sphere_chi2(np.asarray(d_out), pdf_fn, rng,
                                    significance=0.01, n_tests=4)
        assert ok, (gval, stats)

    def test_hg_forward(self):
        self._run(0.7, 21)

    def test_hg_backward(self):
        self._run(-0.4, 22)

    def test_isotropic(self):
        self._run(0.0, 23)

    def test_rayleigh(self):
        self._run(2.0, 24)  # g>1.5 tags the rayleigh lanes
