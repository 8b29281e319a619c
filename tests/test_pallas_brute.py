"""The Pallas small-scene sweep (accel/pallas_brute.py) must agree
exactly with the XLA referee (accel/traverse.brute_force_closest) — the
reference's kd-tree-vs-brute-force pattern (mitsuba/src/tests/
test_kd.cpp) applied to the TPU kernel. Runs in Pallas interpret mode on
the CPU test mesh; the TPU compile path is exercised by bench.py."""

import numpy as np
import pytest


def _random_soup(key, T):
    import jax

    v = jax.random.uniform(key, (T, 3, 3), minval=-1.0, maxval=1.0)
    tri = np.zeros((T, 12), np.float32)
    v = np.asarray(v)
    tri[:, 0:3] = v[:, 0]
    tri[:, 3:6] = v[:, 1] - v[:, 0]
    tri[:, 6:9] = v[:, 2] - v[:, 0]
    return tri


@pytest.mark.parametrize("T,L", [(7, 512), (36, 2048), (130, 4096)])
def test_pallas_brute_matches_xla_referee(T, L):
    import jax
    import jax.numpy as jnp

    from ppg_tpu.accel.pallas_brute import brute_pallas
    from ppg_tpu.accel.traverse import GeometryArrays, brute_force_closest

    key = jax.random.key(T)
    tri = _random_soup(key, T)
    geom = GeometryArrays(jnp.asarray(tri), jnp.zeros((1, 64)),
                          jnp.arange(T, dtype=jnp.int32), stack_depth=8)

    ko, kd = jax.random.split(jax.random.fold_in(key, 1))
    o = jax.random.uniform(ko, (L, 3), minval=-2.0, maxval=2.0)
    d = jax.random.normal(kd, (L, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_min = jnp.zeros(L)
    # park a few lanes (t_max < t_min) like the regen tracer does
    t_max = jnp.where(jnp.arange(L) % 17 == 0, -1.0, 3.4e38)

    ri, rt, ru, rv = brute_force_closest(geom, o, d, t_min, t_max)
    pi, pt, pu, pv = brute_pallas(geom.tri, o, d, t_min, t_max,
                                  interpret=True)

    np.testing.assert_array_equal(np.asarray(ri), np.asarray(pi))
    hit = np.asarray(ri) >= 0
    np.testing.assert_allclose(np.asarray(rt)[hit], np.asarray(pt)[hit],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ru)[hit], np.asarray(pu)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rv)[hit], np.asarray(pv)[hit],
                               rtol=1e-4, atol=1e-5)
