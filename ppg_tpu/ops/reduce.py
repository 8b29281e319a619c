"""TPU-fast indexed accumulation primitives.

XLA lowers scatter-add with duplicate indices to a serialized update loop
on TPU — catastrophic for the splatting workloads here (hundreds of
thousands of records per launch, the analog of the reference's atomic
float CAS adds, guided_path.cpp:59-62). `bincount_add` reformulates the
scatter as sort + cumsum + two vectorized binary searches (gather-only,
no scatter at all): for every output bin the segment total is
cumsum[right_edge-1] - cumsum[left_edge-1].
"""

from __future__ import annotations

import jax.numpy as jnp


def bincount_add(target_flat, idx, val):
    """target_flat[m] += sum(val[idx == m]) for all m, without scatter.

    target_flat: [M] f32; idx: [N] int32 in [0, M); val: [N] f32.
    Invalid records should carry val == 0 (any in-range idx).
    """
    order = jnp.argsort(idx)
    si = jnp.take(idx, order)
    sv = jnp.take(val, order)
    c = jnp.cumsum(sv)
    m = target_flat.shape[0]
    bins = jnp.arange(m, dtype=si.dtype)
    r = jnp.searchsorted(si, bins, side="right")
    # consecutive integer bins: left edge of bin m == right edge of m-1
    l = jnp.concatenate([jnp.zeros(1, r.dtype), r[:-1]])
    upper = jnp.where(r > 0, c[jnp.maximum(r - 1, 0)], 0.0)
    lower = jnp.where(l > 0, c[jnp.maximum(l - 1, 0)], 0.0)
    return target_flat + jnp.where(r > l, upper - lower, 0.0)


def bincount_add2(target_flat, idx, val_a, val_b):
    """Two accumulations sharing one sort (e.g. sum and statweight)."""
    order = jnp.argsort(idx)
    si = jnp.take(idx, order)
    ca = jnp.cumsum(jnp.take(val_a, order))
    cb = jnp.cumsum(jnp.take(val_b, order))
    m = target_flat[0].shape[0]
    bins = jnp.arange(m, dtype=si.dtype)
    r = jnp.searchsorted(si, bins, side="right")
    l = jnp.concatenate([jnp.zeros(1, r.dtype), r[:-1]])

    def tot(c):
        upper = jnp.where(r > 0, c[jnp.maximum(r - 1, 0)], 0.0)
        lower = jnp.where(l > 0, c[jnp.maximum(l - 1, 0)], 0.0)
        return jnp.where(r > l, upper - lower, 0.0)

    return target_flat[0] + tot(ca), target_flat[1] + tot(cb)
