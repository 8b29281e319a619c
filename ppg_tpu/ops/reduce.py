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

import jax
import jax.numpy as jnp


def _cumsum_ds(x):
    """Compensated (double-single) inclusive cumsum: returns (hi, lo)
    f32 pairs with hi + lo accurate to ~2^-48 relative.

    A plain f32 cumsum makes the bincount segment totals DIFFERENCES of
    huge prefixes: for a near-zero bin sitting after a 1e5-1e6 prefix
    the cancellation error is O(eps * prefix) ~ 0.1 absolute — observed
    as small NEGATIVE d-tree sums after big splat batches, and noise of
    that size injected into exactly the low-energy directional cells
    the guiding distribution tails are made of. Knuth two-sum inside an
    associative scan keeps the rounding residual in `lo`, so a segment
    total (hi_r - hi_l) + (lo_r - lo_l) is accurate to O(eps * segment)
    instead."""

    def two_sum(a, b):
        ah, al = a
        bh, bl = b
        s = ah + bh
        v = s - ah
        e = (ah - (s - v)) + (bh - v)
        return s, e + al + bl

    return jax.lax.associative_scan(two_sum, (x, jnp.zeros_like(x)))


def _segment_totals(si, cs, m):
    """Per-bin totals for sorted ids `si` from compensated prefix
    (hi, lo) `cs`, for consecutive integer bins [0, m)."""
    ch, cl = cs
    bins = jnp.arange(m, dtype=si.dtype)
    r = jnp.searchsorted(si, bins, side="right")
    # consecutive integer bins: left edge of bin m == right edge of m-1
    l = jnp.concatenate([jnp.zeros(1, r.dtype), r[:-1]])
    uh = jnp.where(r > 0, ch[jnp.maximum(r - 1, 0)], 0.0)
    ul = jnp.where(r > 0, cl[jnp.maximum(r - 1, 0)], 0.0)
    lh = jnp.where(l > 0, ch[jnp.maximum(l - 1, 0)], 0.0)
    ll = jnp.where(l > 0, cl[jnp.maximum(l - 1, 0)], 0.0)
    return jnp.where(r > l, (uh - lh) + (ul - ll), 0.0)


def bincount_add(target_flat, idx, val):
    """target_flat[m] += sum(val[idx == m]) for all m, without scatter.

    target_flat: [M] f32; idx: [N] int32 in [0, M); val: [N] f32.
    Invalid records should carry val == 0 (any in-range idx).
    """
    si, sv = jax.lax.sort([idx, val], num_keys=1)
    m = target_flat.shape[0]
    return target_flat + _segment_totals(si, _cumsum_ds(sv), m)


def bincount_add2(target_flat, idx, val_a, val_b):
    """Two accumulations sharing one sort (e.g. sum and statweight)."""
    si, sa, sb = jax.lax.sort([idx, val_a, val_b], num_keys=1)
    m = target_flat[0].shape[0]
    return (target_flat[0] + _segment_totals(si, _cumsum_ds(sa), m),
            target_flat[1] + _segment_totals(si, _cumsum_ds(sb), m))
