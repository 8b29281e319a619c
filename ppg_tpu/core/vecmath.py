"""Vectorized 3D math over jnp arrays shaped [..., 3].

These are the device-side equivalents of the reference's Point/Vector/Frame
types (mitsuba/include/mitsuba/core/{vector.h,frame.h}); everything is
batched SoA-style so XLA maps it onto the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-4


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a):
    return a * (1.0 / jnp.maximum(length(a), 1e-20))[..., None]


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def reflect_local(wi):
    """Mirror reflection in the local frame (z = normal)."""
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def build_frame(n):
    """Orthonormal basis around normal n [..., 3] -> (s, t).

    Branchless Duff et al. / Frisvad construction; differs from the
    reference's coordinateSystem only by handedness details that cancel for
    isotropic BSDFs.
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    t = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return s, t


def to_local(s, t, n, v):
    return jnp.stack([dot(v, s), dot(v, t), dot(v, n)], axis=-1)


def to_world(s, t, n, v):
    return (
        v[..., 0:1] * s + v[..., 1:2] * t + v[..., 2:3] * n
    )


def luminance(rgb):
    return (
        0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]
    )


# TPU row gathers cost ~100 us per op at 64k lanes regardless of row
# width; a fused chain of per-row selects is pure VPU work that costs
# T*W compares+selects per lane, so it wins whenever the table is small
# (the threshold is the measured breakeven on v5e). Bit-exact for packed
# rows that embed bitcast int fields (select copies bits; arithmetic
# gathers like one-hot matmuls would flush denormal bit patterns).
SELECT_GATHER_MAX_ELEMS = 4096


def small_table_gather(table, idx):
    """table [T, W], idx [L] int -> [L, W]; select-chain for small
    tables, regular gather otherwise. idx must be in-range (callers
    clip)."""
    T, W = int(table.shape[0]), int(table.shape[1])
    if T * W > SELECT_GATHER_MAX_ELEMS or T <= 1:
        return table[idx]
    out = jnp.broadcast_to(table[0], idx.shape + (W,))
    for k in range(1, T):
        out = jnp.where((idx == k)[..., None], table[k], out)
    return out
