"""Environment emitter + texture atlas tests.

Mirrors the reference's chi^2 sample-vs-pdf strategy
(mitsuba/src/tests/test_chisquare.cpp) in Monte-Carlo form: the envmap's
direct-sampling routine must be consistent with its pdf and its eval,
and pdf must integrate to 1 over the sphere.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppg_tpu.emitters import envmap as EV
from ppg_tpu.emitters import sunsky as SS


def _test_env(img, rot=np.eye(3)):
    return EV.EnvmapArrays.from_image(
        img, rot, np.zeros(3), np.ones(3))


def _sphere_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


class TestEnvmap:
    def test_pdf_integrates_to_one(self):
        rng = np.random.default_rng(1)
        img = rng.random((16, 32, 3)).astype(np.float32) + 0.05
        env = _test_env(img)
        d = _sphere_dirs(200_000)
        pdf = np.asarray(EV.pdf_direct(env, jnp.asarray(d)))
        integral = pdf.mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.02, integral

    def test_sample_pdf_consistency(self):
        """pdf_direct(sampled direction) must equal the sampling pdf."""
        rng = np.random.default_rng(2)
        img = (rng.random((16, 32, 3)) ** 2).astype(np.float32) + 0.01
        env = _test_env(img)
        u = jnp.asarray(rng.random((50_000, 2)), jnp.float32)
        ref = jnp.zeros((50_000, 3), jnp.float32) + 0.5
        ds = EV.sample_direct(env, ref, u)
        pdf2 = EV.pdf_direct(env, ds["d"])
        p1 = np.asarray(ds["pdf"])
        p2 = np.asarray(pdf2)
        ok = p1 > 0
        rel = np.abs(p1[ok] - p2[ok]) / np.maximum(p1[ok], 1e-6)
        # tent-jitter interpolation means the two agree exactly
        assert np.quantile(rel, 0.95) < 1e-3, np.quantile(rel, 0.95)

    def test_mc_estimate_matches_integral(self):
        """E[value] from sample_direct = integral of eval over sphere."""
        rng = np.random.default_rng(3)
        img = (rng.random((8, 16, 3)) * 2).astype(np.float32) + 0.1
        env = _test_env(img)
        u = jnp.asarray(rng.random((400_000, 2)), jnp.float32)
        ref = jnp.zeros((400_000, 3), jnp.float32) + 0.5
        ds = EV.sample_direct(env, ref, u)
        est = np.asarray(ds["value"]).mean(axis=0)
        d = _sphere_dirs(400_000, seed=4)
        ev = np.asarray(EV.eval_env(env, jnp.asarray(d)))
        ref_int = ev.mean(axis=0) * 4 * np.pi
        assert np.allclose(est, ref_int, rtol=0.03), (est, ref_int)

    def test_rotation(self):
        """toWorld rotation: eval in world space follows the rotated map."""
        img = np.zeros((8, 16, 3), np.float32)
        img[0, :, :] = 10.0  # bright pole at local +Y
        img += 0.01
        rot = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)  # +Y->+Z
        env = _test_env(img, rot)
        up = np.asarray(EV.eval_env(env, jnp.asarray([[0.0, 0, 1]])))[0]
        side = np.asarray(EV.eval_env(env, jnp.asarray([[0.0, 1, 0]])))[0]
        assert up[0] > 5.0 and side[0] < 0.1


class TestSunsky:
    def test_sun_position_kitchen(self):
        """Tokyo 2010-07-10 09:00 JST: sun well above horizon, east-ish."""
        elev, azim = SS.compute_sun_coordinates(dict(hour=9.0))
        assert 0 < elev < np.pi / 2
        assert abs(np.rad2deg(elev) - 38.66) < 0.5

    def test_sky_map_sane(self):
        img = SS.rasterize_sun_sky(dict(hour=9.0, turbidity=5.0), "sky")
        assert img.shape == (256, 512, 3)
        assert img.min() >= 0
        # upper hemisphere lit, lower black (no extend)
        assert img[:128].mean() > 0.01
        assert img[129:].max() == 0.0

    def test_sun_power_independent_of_radius_scale(self):
        """sunsky.cpp:182-215: the splat conserves sun power for any
        sunRadiusScale (radiance spreads over a larger disk)."""
        base = dict(hour=9.0, turbidity=5.0)
        p1 = SS.rasterize_sun_sky(dict(base, sunRadiusScale=1.0), "sun")
        p4 = SS.rasterize_sun_sky(dict(base, sunRadiusScale=4.0), "sun")
        H, W = p1.shape[:2]
        w = np.sin((np.arange(H) + 0.5) * np.pi / H)[:, None, None]
        pow1 = (p1 * w).sum() * (2 * np.pi / W) * (np.pi / H)
        pow4 = (p4 * w).sum() * (2 * np.pi / W) * (np.pi / H)
        assert abs(pow1 / pow4 - 1) < 0.02, (pow1, pow4)


class TestTextureAtlas:
    def test_bilinear_wrap(self):
        from ppg_tpu.scene.textures import TextureAtlas, sample_atlas

        atlas = TextureAtlas.empty()
        v = np.asarray(sample_atlas(
            atlas, jnp.zeros(4, jnp.int32), jnp.asarray(np.random.rand(4, 2))))
        assert np.allclose(v, 1.0)  # dummy slot -> white

    def test_srgb_roundtrip(self):
        from ppg_tpu.scene.textures import _srgb_to_linear

        assert abs(_srgb_to_linear(np.array(1.0)) - 1.0) < 1e-6
        assert abs(_srgb_to_linear(np.array(0.5)) - 0.2140) < 1e-3


def test_envmap_sample_chi2():
    """Pooled-significance chi^2: sample_direct directions vs pdf_direct
    (the reference's ChiSquare harness over luminaires,
    test_chisquare.cpp + chisquare.h:81-143)."""
    from chi2util import run_sphere_chi2

    rng = np.random.default_rng(31)
    img = (rng.random((16, 32, 3)) ** 2).astype(np.float32) + 0.01
    env = _test_env(img)
    n = 200_000
    u = jnp.asarray(rng.random((n, 2)), jnp.float32)
    ref = jnp.zeros((n, 3), jnp.float32) + 0.5
    ds = EV.sample_direct(env, ref, u)
    dirs = np.asarray(ds["d"])

    def pdf_fn(d):
        return np.asarray(EV.pdf_direct(env, jnp.asarray(d, jnp.float32)))

    ok, stats = run_sphere_chi2(dirs, pdf_fn, rng, nb_ct=10, nb_ph=10,
                                significance=0.01, n_tests=1)
    assert ok, stats
