"""Perspective sensor: batched ray generation.

Matches the reference perspective camera exactly (mitsuba/src/sensors/
perspective.cpp:126-292): film sample (u,v) in [0,1]^2 maps through the
inverse of   scale(1/rel) . translate(-relOff) . scale(-0.5, -0.5*aspect, 1)
           . translate(-1, -1/aspect, 0) . perspective(xfov, near, far)
to a camera-space near-plane point; camera axes follow Mitsuba's lookAt
(x='left', y=up, z=view). Importance weight is 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class PerspectiveSensor:
    def __init__(self, sensor_cfg, film_cfg, crop=None):
        self.W = film_cfg["width"]
        self.H = film_cfg["height"]
        self.aspect = self.W / self.H
        self.xfov = float(sensor_cfg["xfov"])
        self.near = float(sensor_cfg.get("near_clip", 1e-2))
        self.far = float(sensor_cfg.get("far_clip", 1e4))
        m = np.asarray(sensor_cfg["to_world"], np.float64)
        self.origin = jnp.asarray(m[:3, 3], jnp.float32)
        self.axes = jnp.asarray(m[:3, :3], jnp.float32)  # columns: left/up/dir
        self.tan_half = np.tan(np.deg2rad(self.xfov) / 2.0)

    def sample_rays(self, sample_pos):
        """sample_pos: [L,2] continuous film coords in [0,W]x[0,H].

        Returns (o [L,3], d [L,3], t_min [L], t_max [L])."""
        u = sample_pos[:, 0] / self.W
        v = sample_pos[:, 1] / self.H
        # invert camera->sample (perspective.cpp:150-155); x/z = (1-2u)tan,
        # y/z = (1-2v)tan/aspect in camera space
        dx = (1.0 - 2.0 * u) * self.tan_half
        dy = (1.0 - 2.0 * v) * self.tan_half / self.aspect
        d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
        d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
        d = d_cam @ self.axes.T
        inv_z = 1.0 / d_cam[:, 2]
        o = jnp.broadcast_to(self.origin, d.shape)
        return o, d, self.near * inv_z, self.far * inv_z
