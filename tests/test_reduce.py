"""Accuracy + correctness of the sort-based bincount primitives
(ops/reduce.py) — the scatter-free analog of the reference's atomic
float adds (guided_path.cpp:59-62).

The adversarial case is the production splat shape: millions of
records, most of the energy early in sorted order, near-zero bins
late. A plain f32 cumsum makes late-bin totals differences of huge
prefixes (error O(eps * prefix) ~ 0.1 absolute, observed as NEGATIVE
d-tree sums in cbox-improved training); the compensated cumsum must
hold every bin to f64-reference accuracy.
"""

import numpy as np


def test_bincount_add_exact_small():
    import jax.numpy as jnp

    from ppg_tpu.ops.reduce import bincount_add, bincount_add2

    rng = np.random.default_rng(0)
    m, n = 17, 1000
    idx = rng.integers(0, m, n).astype(np.int32)
    val = rng.uniform(-1, 1, n).astype(np.float32)
    ref = np.zeros(m)
    np.add.at(ref, idx, val.astype(np.float64))
    got = np.asarray(bincount_add(jnp.zeros(m), jnp.asarray(idx),
                                  jnp.asarray(val)))
    np.testing.assert_allclose(got, ref, atol=1e-4)

    a, b = bincount_add2((jnp.ones(m), jnp.zeros(m)), jnp.asarray(idx),
                         jnp.asarray(val), jnp.asarray(np.abs(val)))
    ref_b = np.zeros(m)
    np.add.at(ref_b, idx, np.abs(val).astype(np.float64))
    np.testing.assert_allclose(np.asarray(a), ref + 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), ref_b, atol=1e-4)


def test_bincount_add_compensated_accuracy():
    """4M records, heavy bins first in sorted order, tiny bins last:
    every bin must match the f64 reference to 1e-3 relative (the plain
    f32 prefix-difference fails this by orders of magnitude on the tail
    bins, including producing negatives)."""
    import jax.numpy as jnp

    from ppg_tpu.ops.reduce import bincount_add

    rng = np.random.default_rng(1)
    n, m = 1 << 22, 512
    idx = rng.integers(0, m, n).astype(np.int32)
    # heavy energy in low bins, near-zero energy in high bins
    val = np.where(idx < 8, rng.uniform(0.5, 2.0, n),
                   rng.uniform(0.0, 1e-6, n)).astype(np.float32)
    ref = np.zeros(m)
    np.add.at(ref, idx, val.astype(np.float64))
    got = np.asarray(bincount_add(jnp.zeros(m), jnp.asarray(idx),
                                  jnp.asarray(val)))
    assert (got >= 0).all(), got.min()
    np.testing.assert_allclose(got, ref, rtol=1e-3)
