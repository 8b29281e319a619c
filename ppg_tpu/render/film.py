"""Film accumulation with reconstruction filters (device scatter-add).

Mirrors ImageBlock::put + Film::develop semantics (reference
librender/imageblock.{h,cpp}, src/films/hdrfilm.cpp:477-536): each sample
splats (value * filterWeight, filterWeight) into every pixel whose center
lies within the filter radius; develop() divides by the accumulated
weight. Mitsuba's atomic tile funnel becomes a deterministic scatter-add.

Filters implemented analytically rather than via the reference's
discretized lookup tables: box, tent, gaussian, mitchell, catmullrom,
lanczos (reference src/rfilters/*.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FILTER_RADIUS = {
    "box": 0.5,
    "tent": 1.0,
    "gaussian": 2.0,
    "mitchell": 2.0,
    "catmullrom": 2.0,
    "lanczos": 3.0,
}


def _mitchell_1d(x, B, C):
    x = jnp.abs(2.0 * x)
    x2, x3 = x * x, x * x * x
    return jnp.where(
        x > 1,
        ((-B - 6 * C) * x3 + (6 * B + 30 * C) * x2 + (-12 * B - 48 * C) * x
         + (8 * B + 24 * C)) * (1.0 / 6.0),
        ((12 - 9 * B - 6 * C) * x3 + (-18 + 12 * B + 6 * C) * x2
         + (6 - 2 * B)) * (1.0 / 6.0),
    )


def filter_eval(name, x):
    """1D filter weight at offset x (pixels); filters are separable."""
    ax = jnp.abs(x)
    if name == "box":
        return jnp.where(ax <= 0.5, 1.0, 0.0)
    if name == "tent":
        return jnp.maximum(0.0, 1.0 - ax)
    if name == "gaussian":
        # sigma=0.5, radius 2, offset to zero at the boundary (gaussian.cpp)
        alpha = -1.0 / (2.0 * 0.5**2)
        return jnp.maximum(
            0.0, jnp.exp(alpha * ax * ax) - np.exp(alpha * 4.0)
        )
    if name in ("mitchell", "catmullrom"):
        B, C = (1 / 3, 1 / 3) if name == "mitchell" else (0.0, 0.5)
        return jnp.where(ax <= 2.0, _mitchell_1d(ax / 2.0 * 1.0, B, C), 0.0)
    if name == "lanczos":
        t = 3.0
        s = jnp.where(ax < 1e-6, 1.0, jnp.sinc(ax) * jnp.sinc(ax / t))
        return jnp.where(ax <= t, s, 0.0)
    raise ValueError(f"unknown rfilter {name!r}")


class Film:
    """Accumulation buffers: rgb-sum and weight-sum per pixel."""

    def __init__(self, W, H, rfilter="box"):
        self.W, self.H, self.rfilter = W, H, rfilter
        self.radius = FILTER_RADIUS[rfilter]

    def zeros(self):
        return (
            jnp.zeros((self.H, self.W, 3), jnp.float32),
            jnp.zeros((self.H, self.W), jnp.float32),
        )

    def splat(self, buffers, sample_pos, values):
        """Scatter samples into (rgb, weight) buffers; returns new buffers.

        sample_pos: [L,2] film coords (x, y); values: [L,3].
        """
        rgb, wsum = buffers
        x, y = sample_pos[:, 0], sample_pos[:, 1]
        if self.rfilter == "box":
            px = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, self.W - 1)
            py = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, self.H - 1)
            rgb = rgb.at[py, px].add(values)
            wsum = wsum.at[py, px].add(1.0)
            return rgb, wsum

        r = self.radius
        n = int(np.ceil(2 * r))  # pixels touched per axis
        bx = jnp.ceil(x - 0.5 - r).astype(jnp.int32)
        by = jnp.ceil(y - 0.5 - r).astype(jnp.int32)
        for oy in range(n):
            for ox in range(n):
                pxi = bx + ox
                pyi = by + oy
                wx = filter_eval(self.rfilter, pxi + 0.5 - x)
                wy = filter_eval(self.rfilter, pyi + 0.5 - y)
                w = wx * wy
                inside = (pxi >= 0) & (pxi < self.W) & (pyi >= 0) & (pyi < self.H)
                w = jnp.where(inside, w, 0.0)
                cx = jnp.clip(pxi, 0, self.W - 1)
                cy = jnp.clip(pyi, 0, self.H - 1)
                rgb = rgb.at[cy, cx].add(values * w[:, None])
                wsum = wsum.at[cy, cx].add(w)
        return rgb, wsum

    def zeros_flat(self, chunk):
        """Flat film buffers padded to a whole number of chunks, for the
        scatter-free contiguous splat path."""
        import numpy as np

        P = ((self.W * self.H + chunk - 1) // chunk) * chunk
        return (
            jnp.zeros((P, 3), jnp.float32),
            jnp.zeros((P,), jnp.float32),
        )

    @staticmethod
    def splat_box_linear(buffers, start, values, valid):
        """Scatter-free box-filter splat for a CONTIGUOUS pixel chunk:
        with the box filter (radius 0.5) a sample jittered within its pixel
        always lands in that pixel, so the chunk update is a dynamic-slice
        add — no scatter (TPU scatter serializes on duplicates).

        buffers: from zeros_flat; start: int32 linear pixel offset (chunk
        aligned); values [C,3]; valid [C]."""
        import jax

        rgb_flat, w_flat = buffers
        C = values.shape[0]
        vals = jnp.where(valid[:, None], values, 0.0)
        w = jnp.where(valid, 1.0, 0.0)
        cur = jax.lax.dynamic_slice(rgb_flat, (start, 0), (C, 3))
        rgb_flat = jax.lax.dynamic_update_slice(rgb_flat, cur + vals, (start, 0))
        curw = jax.lax.dynamic_slice(w_flat, (start,), (C,))
        w_flat = jax.lax.dynamic_update_slice(w_flat, curw + w, (start,))
        return rgb_flat, w_flat

    def unflatten(self, buffers):
        rgb_flat, w_flat = buffers
        n = self.W * self.H
        return (
            rgb_flat[:n].reshape(self.H, self.W, 3),
            w_flat[:n].reshape(self.H, self.W),
        )

    @staticmethod
    def develop(buffers):
        rgb, wsum = buffers
        return rgb / jnp.maximum(wsum, 1e-20)[..., None]
