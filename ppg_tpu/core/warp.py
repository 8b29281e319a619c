"""Square -> distribution warps (batched jnp), semantics matching the
reference's warp library (mitsuba/src/libcore/warp.cpp:25-110) so that
sampling pdfs agree for MSE parity.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vecmath import safe_sqrt

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_disk_concentric(u):
    """Concentric disk map, low-branch Cline variant (warp.cpp:81-103)."""
    r1 = 2.0 * u[..., 0] - 1.0
    r2 = 2.0 * u[..., 1] - 1.0
    use1 = r1 * r1 > r2 * r2
    r = jnp.where(use1, r1, r2)
    phi = jnp.where(
        use1,
        (jnp.pi / 4.0) * (r2 / jnp.where(r1 == 0.0, 1.0, r1)),
        (jnp.pi / 2.0) - (r1 / jnp.where(r2 == 0.0, 1.0, r2)) * (jnp.pi / 4.0),
    )
    zero = (r1 == 0.0) & (r2 == 0.0)
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_cosine_hemisphere(u):
    p = square_to_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    z = jnp.maximum(z, 1e-10)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(w):
    return INV_PI * w[..., 2]


def square_to_uniform_triangle(u):
    a = safe_sqrt(1.0 - u[..., 0])
    return jnp.stack([1.0 - a, a * u[..., 1]], axis=-1)


def square_to_uniform_cone(cos_cutoff, u):
    cos_t = (1.0 - u[..., 0]) + u[..., 0] * cos_cutoff
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack(
        [jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1
    )


def square_to_uniform_cone_pdf(cos_cutoff):
    return INV_TWOPI / (1.0 - cos_cutoff)


# Cylindrical equal-area map between unit square and sphere, used by the
# directional quadtrees (reference guided_path.cpp:586-608).
def canonical_to_dir(p):
    cos_theta = 2.0 * p[..., 0] - 1.0
    phi = 2.0 * jnp.pi * p[..., 1]
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def dir_to_canonical(d):
    cos_theta = jnp.clip(d[..., 2], -1.0, 1.0)
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    x = (cos_theta + 1.0) / 2.0
    y = phi * INV_TWOPI
    finite = jnp.all(jnp.isfinite(d), axis=-1)
    return jnp.where(
        finite[..., None], jnp.stack([x, y], axis=-1), jnp.zeros_like(d[..., :2])
    )
