"""Shared chi-square goodness-of-fit harness for sampling tests.

Mirrors ChiSquare::runTest (reference include/mitsuba/core/chisquare.h:
81-143): cells whose expected count falls below a threshold are pooled
into one cell, the statistic is compared against the chi^2 distribution
at a Sidak-corrected significance level, and (an extension the MC
integration here needs) each cell's variance may carry the Monte-Carlo
error of its *expected* mass in addition to the multinomial term.

The harness's discriminating power is itself under test:
test_bsdf_gof.py::test_chi2_power_rejects_wrong_pdf mutates a pdf by 5%
and asserts rejection.
"""

import numpy as np
from scipy.stats import chi2 as _chi2_dist


def chi2_test(counts, expected, expected_var=None, significance=0.01,
              n_tests=1, min_expected=5.0):
    """Pooled chi^2 significance test.

    counts:        observed bin counts (any shape, flattened)
    expected:      expected counts under H0 (same shape)
    expected_var:  optional per-bin variance of `expected` itself (from
                   MC integration of the target pdf); added to the
                   multinomial variance term
    significance:  base significance level alpha (reference default 0.01)
    n_tests:       Sidak correction: alpha' = 1-(1-alpha)^(1/n_tests)
                   (chisquare.h:104-108)
    Returns (accepted: bool, stats: dict).
    """
    counts = np.asarray(counts, np.float64).ravel()
    expected = np.asarray(expected, np.float64).ravel()
    var = expected.copy()
    if expected_var is not None:
        var = var + np.asarray(expected_var, np.float64).ravel()

    # pool low-expectation cells (chisquare.h: pooling cells < threshold)
    small = expected < min_expected
    c = np.append(counts[~small], counts[small].sum())
    e = np.append(expected[~small], expected[small].sum())
    v = np.append(var[~small], var[small].sum())
    keep = e > 1e-12
    c, e, v = c[keep], e[keep], v[keep]
    dof = len(c) - 1
    if dof <= 0:
        return True, dict(chi2=0.0, dof=0, pvalue=1.0, pooled=int(small.sum()))
    stat = float(np.sum((c - e) ** 2 / np.maximum(v, 1e-12)))
    pvalue = float(_chi2_dist.sf(stat, dof))
    alpha = 1.0 - (1.0 - significance) ** (1.0 / max(n_tests, 1))
    return pvalue > alpha, dict(chi2=stat, dof=dof, pvalue=pvalue,
                                pooled=int(small.sum()), alpha=alpha)


def sphere_bins(dirs, nb_ct=12, nb_ph=12):
    """Bin unit directions over (cos_theta, phi). Returns flat indices."""
    dirs = np.asarray(dirs)
    ct = np.clip(dirs[:, 2], -1, 1)
    ph = np.arctan2(dirs[:, 1], dirs[:, 0])
    bi = np.clip(((ct + 1) / 2 * nb_ct).astype(int), 0, nb_ct - 1)
    bj = np.clip(((ph + np.pi) / (2 * np.pi) * nb_ph).astype(int),
                 0, nb_ph - 1)
    return bi * nb_ph + bj


def expected_masses_mc(pdf_fn, rng, m=400_000, nb_ct=12, nb_ph=12):
    """MC-integrate a spherical pdf into (cos_theta, phi) bin masses.

    pdf_fn(dirs [m,3]) -> pdf values wrt solid angle. Returns
    (mass, mass_var) arrays of length nb_ct*nb_ph.
    """
    u = rng.random((m, 2))
    ect = 2 * u[:, 0] - 1
    eph = 2 * np.pi * u[:, 1] - np.pi
    st = np.sqrt(np.maximum(1 - ect**2, 0.0))
    dirs = np.stack([st * np.cos(eph), st * np.sin(eph), ect], -1)
    pd = np.asarray(pdf_fn(dirs), np.float64)
    eb = sphere_bins(dirs, nb_ct, nb_ph)
    scale = 4 * np.pi / m
    nb = nb_ct * nb_ph
    mass = np.bincount(eb, weights=pd, minlength=nb) * scale
    mass_var = np.bincount(eb, weights=pd**2, minlength=nb) * scale**2
    return mass, mass_var


def run_sphere_chi2(sample_dirs, pdf_fn, rng, nb_ct=12, nb_ph=12,
                    m=400_000, significance=0.01, n_tests=1):
    """End-to-end: bin `sample_dirs`, MC-integrate `pdf_fn` for the
    expected masses, run the pooled significance test. Returns
    (accepted, stats)."""
    n_s = len(sample_dirs)
    counts = np.bincount(sphere_bins(sample_dirs, nb_ct, nb_ph),
                         minlength=nb_ct * nb_ph).astype(np.float64)
    mass, mass_var = expected_masses_mc(pdf_fn, rng, m, nb_ct, nb_ph)
    total = mass.sum()
    expected = mass * n_s / max(total, 1e-12)
    evar = mass_var * (n_s / max(total, 1e-12)) ** 2
    ok, stats = chi2_test(counts, expected, evar, significance, n_tests)
    stats["total_mass"] = float(total)
    return ok, stats
