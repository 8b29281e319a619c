"""Sensor plugins: batched ray generation.

Matches the reference cameras (mitsuba/src/sensors/): `perspective`
(perspective.cpp:126-292 — film sample (u,v) in [0,1]^2 maps through the
inverse of   scale(1/rel) . translate(-relOff) . scale(-0.5, -0.5*aspect, 1)
           . translate(-1, -1/aspect, 0) . perspective(xfov, near, far)
to a camera-space near-plane point; camera axes follow Mitsuba's lookAt:
x='left', y=up, z=view), `thinlens` (thinlens.cpp sampleRay: concentric-
disk aperture point + focal-plane target), `orthographic`
(orthographic.cpp:95-118), and `spherical` (spherical.cpp:67-83
latitude-longitude). Importance weight is 1 for all of them.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import warp


class _SensorHash:
    """Value-based hashing so jit caches keyed on a static sensor arg hit
    across calls that rebuild an identical sensor (the traced constants —
    origin/axes — are baked from the same values)."""

    def _sig(self):
        import numpy as np

        cached = self.__dict__.get("_sig_cache")
        if cached is not None:
            return cached
        vals = []
        for k in sorted(self.__dict__):
            v = self.__dict__[k]
            if hasattr(v, "tobytes"):
                vals.append((k, np.asarray(v).tobytes()))
            else:
                vals.append((k, v))
        sig = (type(self).__name__, tuple(vals))
        self.__dict__["_sig_cache"] = sig
        return sig

    def __hash__(self):
        return hash(self._sig())

    def __eq__(self, other):
        return (type(other) is type(self)
                and self._sig() == other._sig())


class PerspectiveSensor(_SensorHash):
    needs_lens_sample = False

    def footprint(self, t):
        """World-space pixel footprint at hit distance t (isotropic
        approximation of the camera ray differentials that drive the
        reference's EWA lookups, perspective.cpp sampleRayDifferential)."""
        return t * (2.0 * self.tan_half / self.W)

    def dir_differentials(self, d):
        """Per-pixel ray-direction differentials (ddir/dpx, ddir/dpy),
        reconstructed from the unit direction itself — the perspective
        mapping dir = normalize([(1-2u)tan, (1-2v)tan/aspect, 1]) gives
        d(dir)/dpx = s * dz * (e_x - dir * dir_x) with s = -2 tan / W
        (identical scale for y since aspect = W/H). The analog of
        perspective.cpp sampleRayDifferential's neighbor-pixel rays,
        without carrying pixel positions through the wavefront."""
        d_cam = d @ self.axes  # world -> camera (axes orthonormal)
        s = -2.0 * self.tan_half / self.W
        z = d_cam[:, 2:3]
        ex = jnp.asarray([1.0, 0.0, 0.0])
        ey = jnp.asarray([0.0, 1.0, 0.0])
        ddx = s * z * (ex - d_cam * d_cam[:, 0:1])
        ddy = s * z * (ey - d_cam * d_cam[:, 1:2])
        return ddx @ self.axes.T, ddy @ self.axes.T

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

    def _near_plane(self, sample_pos):
        u = sample_pos[:, 0] / self.W
        v = sample_pos[:, 1] / self.H
        # invert camera->sample (perspective.cpp:150-155); x/z = (1-2u)tan,
        # y/z = (1-2v)tan/aspect in camera space
        dx = (1.0 - 2.0 * u) * self.tan_half
        dy = (1.0 - 2.0 * v) * self.tan_half / self.aspect
        return dx, dy

    def sample_rays(self, sample_pos, u_lens=None):
        """sample_pos: [L,2] continuous film coords in [0,W]x[0,H].

        Returns (o [L,3], d [L,3], t_min [L], t_max [L])."""
        dx, dy = self._near_plane(sample_pos)
        d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
        d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
        d = d_cam @ self.axes.T
        inv_z = 1.0 / d_cam[:, 2]
        o = jnp.broadcast_to(self.origin, d.shape)
        return o, d, self.near * inv_z, self.far * inv_z


class ThinLensSensor(PerspectiveSensor):
    """Depth-of-field camera (thinlens.cpp): rays start on a disk of
    apertureRadius and converge on the focusDistance plane."""

    needs_lens_sample = True

    def __init__(self, sensor_cfg, film_cfg, crop=None):
        super().__init__(sensor_cfg, film_cfg, crop)
        self.aperture = float(sensor_cfg.get("apertureRadius", 0.1))
        self.focus = float(sensor_cfg.get("focusDistance", 1.0))

    def sample_rays(self, sample_pos, u_lens=None):
        L = sample_pos.shape[0]
        dx, dy = self._near_plane(sample_pos)
        near_p = jnp.stack([dx, dy, jnp.ones_like(dx)], -1) * self.near
        if u_lens is None:
            u_lens = jnp.full((L, 2), 0.5)
        ap = warp.square_to_uniform_disk_concentric(u_lens) * self.aperture
        aperture_p = jnp.concatenate([ap, jnp.zeros((L, 1))], -1)
        focus_p = near_p * (self.focus / near_p[:, 2:3])
        d_cam = focus_p - aperture_p
        d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
        d = d_cam @ self.axes.T
        o = self.origin + aperture_p @ self.axes.T
        inv_z = 1.0 / d_cam[:, 2]
        return o, d, self.near * inv_z, self.far * inv_z


class OrthographicSensor(_SensorHash):
    """Parallel projection (orthographic.cpp); view extents come from the
    toWorld scale, applied through the full affine transform."""

    def footprint(self, t):
        # parallel rays: constant world-space pixel size
        return jnp.full_like(t, self.px_world)

    needs_lens_sample = False

    def __init__(self, sensor_cfg, film_cfg, crop=None):
        self.W = film_cfg["width"]
        self.H = film_cfg["height"]
        self.aspect = self.W / self.H
        self.near = float(sensor_cfg.get("near_clip", 1e-2))
        self.far = float(sensor_cfg.get("far_clip", 1e4))
        m = np.asarray(sensor_cfg["to_world"], np.float64)
        self.origin = jnp.asarray(m[:3, 3], jnp.float32)
        self.axes = jnp.asarray(m[:3, :3], jnp.float32)
        self.px_world = float(2.0 * np.linalg.norm(m[:3, 0]) / self.W)

    def sample_rays(self, sample_pos, u_lens=None):
        u = sample_pos[:, 0] / self.W
        v = sample_pos[:, 1] / self.H
        x = 1.0 - 2.0 * u
        y = (1.0 - 2.0 * v) / self.aspect
        p_cam = jnp.stack([x, y, jnp.zeros_like(x)], -1)
        o = self.origin + p_cam @ self.axes.T
        d_cam = jnp.array([0.0, 0.0, 1.0])
        d = jnp.broadcast_to(self.axes @ d_cam, o.shape)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        L = o.shape[0]
        return o, d, jnp.full(L, self.near), jnp.full(L, self.far)


class SphericalSensor(_SensorHash):
    """Latitude-longitude environment camera (spherical.cpp:67-83):
    d = (sin(phi) sin(theta), cos(theta), -cos(phi) sin(theta)) with
    phi = 2 pi u, theta = pi v."""

    def footprint(self, t):
        return t * (2.0 * np.pi / self.W)

    needs_lens_sample = False

    def __init__(self, sensor_cfg, film_cfg, crop=None):
        self.W = film_cfg["width"]
        self.H = film_cfg["height"]
        m = np.asarray(sensor_cfg["to_world"], np.float64)
        self.origin = jnp.asarray(m[:3, 3], jnp.float32)
        self.axes = jnp.asarray(m[:3, :3], jnp.float32)

    def sample_rays(self, sample_pos, u_lens=None):
        phi = sample_pos[:, 0] / self.W * (2 * jnp.pi)
        theta = sample_pos[:, 1] / self.H * jnp.pi
        st, ct = jnp.sin(theta), jnp.cos(theta)
        d_cam = jnp.stack([jnp.sin(phi) * st, ct, -jnp.cos(phi) * st], -1)
        d = d_cam @ self.axes.T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(self.origin, d.shape)
        L = o.shape[0]
        return o, d, jnp.full(L, 1e-4), jnp.full(L, 1e30)


class RadianceMeterSensor(_SensorHash):
    """Single-direction radiance probe (radiancemeter.cpp): every sample
    shoots the to_world -Z... +Z axis ray from the origin; the film is
    typically 1x1 and accumulates the mean incident radiance."""

    needs_lens_sample = False

    def footprint(self, t):
        # single-direction probe: no meaningful pixel footprint
        return jnp.zeros_like(t)

    def __init__(self, sensor_cfg, film_cfg, crop=None):
        self.W = film_cfg["width"]
        self.H = film_cfg["height"]
        m = np.asarray(sensor_cfg["to_world"], np.float64)
        self.origin = jnp.asarray(m[:3, 3], jnp.float32)
        d = m[:3, 2] / np.linalg.norm(m[:3, 2])
        self.dir = jnp.asarray(d, jnp.float32)

    def sample_rays(self, sample_pos, u_lens=None):
        L = sample_pos.shape[0]
        o = jnp.broadcast_to(self.origin, (L, 3))
        d = jnp.broadcast_to(self.dir, (L, 3))
        return o, d, jnp.full(L, 1e-4), jnp.full(L, 1e30)


_SENSORS = {
    "perspective": PerspectiveSensor,
    "thinlens": ThinLensSensor,
    "orthographic": OrthographicSensor,
    "spherical": SphericalSensor,
    "radiancemeter": RadianceMeterSensor,
}


def make_sensor(sensor_cfg, film_cfg, crop=None):
    t = str(sensor_cfg.get("type", "perspective"))
    if t not in _SENSORS:
        raise NotImplementedError(f"sensor type {t!r}")
    return _SENSORS[t](sensor_cfg, film_cfg, crop)
