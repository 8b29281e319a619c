"""Sampler family tests, mirroring the reference's test_samplers.cpp:
uniformity of marginals, low-discrepancy variance reduction vs the
independent sampler, per-pixel decorrelation, and determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppg_tpu.render import samplers as S

QMC = [k for k in S.KINDS if k != "independent"]


def _draw_grid(kind, n_samples, dim, pixel=7):
    pid = jnp.full(n_samples, pixel, jnp.int32)
    sidx = jnp.arange(n_samples, dtype=jnp.int32)
    u = S.draw(kind, pid, sidx, dim, jax.random.key(0), (n_samples, 2))
    return np.asarray(u)


@pytest.mark.parametrize("kind", list(S.KINDS))
def test_range_and_uniformity(kind):
    u = _draw_grid(kind, 4096, dim=0)
    assert u.min() >= 0.0 and u.max() < 1.0
    # marginal means ~ 0.5, variance ~ 1/12
    assert np.allclose(u.mean(axis=0), 0.5, atol=0.02), u.mean(axis=0)
    assert np.allclose(u.var(axis=0), 1 / 12, atol=0.01)


@pytest.mark.parametrize("kind", ["sobol", "halton", "ldsampler",
                                  "hammersley"])
def test_low_discrepancy_beats_random(kind):
    """Stratification: MC error of a smooth 2D integral should shrink
    much faster than independent sampling (test_samplers.cpp checks
    stratification properties similarly)."""
    n = 1024
    f = lambda u: np.sin(np.pi * u[:, 0]) * u[:, 1] ** 2  # integral 2/(3pi)
    ref = 2 / (3 * np.pi)
    errs_q, errs_r = [], []
    for pix in range(8):
        uq = _draw_grid(kind, n, dim=0, pixel=pix)
        errs_q.append(abs(f(uq).mean() - ref))
        ur = np.asarray(jax.random.uniform(jax.random.key(pix), (n, 2)))
        errs_r.append(abs(f(ur).mean() - ref))
    assert np.mean(errs_q) < 0.5 * np.mean(errs_r), (
        kind, np.mean(errs_q), np.mean(errs_r))


@pytest.mark.parametrize("kind", QMC)
def test_pixel_decorrelation(kind):
    """Different pixels must not share the same sample values."""
    a = _draw_grid(kind, 256, dim=0, pixel=1)
    b = _draw_grid(kind, 256, dim=0, pixel=2)
    assert not np.allclose(a, b)
    # but each is individually well distributed
    assert abs(a.mean() - 0.5) < 0.05 and abs(b.mean() - 0.5) < 0.05


@pytest.mark.parametrize("kind", QMC)
def test_deterministic(kind):
    a = _draw_grid(kind, 64, dim=5)
    b = _draw_grid(kind, 64, dim=5)
    assert np.array_equal(a, b)


def test_traced_dim():
    """dim may be a traced scalar (used inside the bounce scan)."""
    pid = jnp.arange(128, dtype=jnp.int32)

    @jax.jit
    def f(dim):
        return S.draw("sobol", pid, jnp.int32(3), dim, jax.random.key(0),
                      (128, 2))

    u5 = np.asarray(f(jnp.int32(5)))
    u9 = np.asarray(f(jnp.int32(9)))
    assert u5.shape == (128, 2) and not np.allclose(u5, u9)
    assert u5.min() >= 0 and u5.max() < 1
