"""Pallas TPU kernel for the small-scene brute-force intersection sweep.

The XLA version of the sweep (traverse.brute_force_closest) materializes
most of its per-triangle intermediates to HBM — ~1400 [L] array
round-trips per bounce — which makes a 32-triangle scene HBM-bound at
~320 Mrays/s. This kernel keeps the whole sweep in registers/VMEM:
triangle records are scalars in SMEM broadcast to all lanes, the
best-hit state is a fori_loop carry, and HBM traffic collapses to the
ray inputs + 4 outputs (~12 B/lane each way).

Layout: rays arrive as one [8, L/128, 128] f32 tensor (first axis is
the component ox oy oz dx dy dz tmin tmax; the rest is the lane grid in
native (sublane, lane) tiling); each grid program sweeps all T
triangles for a (ROWS, 128)-lane tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.4e38  # plain python float: jnp constants would be captured consts
ROWS = 16  # sublane rows per grid program -> 2048 lanes each


def _kernel(tri_ref, rays_ref, besti_ref, t_ref, u_ref, v_ref, *, T):
    ox = rays_ref[0]
    oy = rays_ref[1]
    oz = rays_ref[2]
    dx = rays_ref[3]
    dy = rays_ref[4]
    dz = rays_ref[5]
    t_min = rays_ref[6]
    t_max = rays_ref[7]

    def step(k, state):
        best_t, best_i, best_u, best_v = state
        p0x = tri_ref[k, 0]
        p0y = tri_ref[k, 1]
        p0z = tri_ref[k, 2]
        e1x = tri_ref[k, 3]
        e1y = tri_ref[k, 4]
        e1z = tri_ref[k, 5]
        e2x = tri_ref[k, 6]
        e2y = tri_ref[k, 7]
        e2z = tri_ref[k, 8]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        bad = jnp.abs(det) < 1e-12
        inv = jnp.where(bad, 0.0, pl.reciprocal(
            jnp.where(bad, 1.0, det), approx=False))
        tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        hit = ((inv != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > t_min) & (t < jnp.minimum(best_t, t_max)))
        return (jnp.where(hit, t, best_t),
                jnp.where(hit, k, best_i),
                jnp.where(hit, u, best_u),
                jnp.where(hit, v, best_v))

    init = (jnp.full((ROWS, 128), INF),
            jnp.full((ROWS, 128), -1, jnp.int32),
            jnp.zeros((ROWS, 128), jnp.float32),
            jnp.zeros((ROWS, 128), jnp.float32))
    if T <= 64:
        # full unroll: the fori_loop serializes on the loop carry, an
        # unrolled chain lets the compiler software-pipeline the sweeps
        state = init
        for k in range(T):
            state = step(k, state)
        best_t, best_i, best_u, best_v = state
    else:
        best_t, best_i, best_u, best_v = jax.lax.fori_loop(0, T, step, init)
    besti_ref[:] = best_i
    t_ref[:] = jnp.where(best_i < 0, INF, best_t)
    u_ref[:] = best_u
    v_ref[:] = best_v


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _call(tri, rays, T, interpret=False):
    R = rays.shape[1]  # total sublane rows (L/128)
    grid = R // ROWS
    kernel = functools.partial(_kernel, T=T)
    out_shape = [
        jax.ShapeDtypeStruct((R, 128), jnp.int32),
        jax.ShapeDtypeStruct((R, 128), jnp.float32),
        jax.ShapeDtypeStruct((R, 128), jnp.float32),
        jax.ShapeDtypeStruct((R, 128), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tri scalars
            pl.BlockSpec((8, ROWS, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(tri, rays)


def brute_pallas(tri, o, d, t_min, t_max, interpret=False):
    """Drop-in replacement for traverse.brute_force_closest on TPU.

    tri: [T, 12] f32 (p0, e1, e2, pad). Returns (best_i, t, u, v) with
    t = INF on miss, like the XLA path. Lane counts not divisible by
    the 2048-lane block are padded with parked rays.
    """
    L = o.shape[0]
    BLK = ROWS * 128
    Lp = ((L + BLK - 1) // BLK) * BLK
    rays = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                      d[:, 0], d[:, 1], d[:, 2],
                      t_min, t_max])
    if Lp != L:
        pad = jnp.zeros((8, Lp - L), rays.dtype)
        pad = pad.at[7].set(-1.0)  # t_max < t_min: parked
        rays = jnp.concatenate([rays, pad], axis=1)
    rays = rays.reshape(8, Lp // 128, 128)
    T = int(tri.shape[0])
    best_i, t, u, v = _call(tri, rays, T, interpret)
    return (best_i.reshape(-1)[:L], t.reshape(-1)[:L],
            u.reshape(-1)[:L], v.reshape(-1)[:L])
