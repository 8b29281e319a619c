"""Dissect the bvh step body: which part costs 828us/step?"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from ppg_tpu.accel.traverse import _i32, _safe_inv, _components
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene
from ppg_tpu.render.sensor import make_sensor

sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
geom = dev.geom
sensor = make_sensor(sc.sensor, sc.film)
Wd, Hd = sc.film["width"], sc.film["height"]
L = 1 << 16
pix = jnp.arange(L) % (Wd * Hd)
px = (pix % Wd).astype(jnp.float32) + 0.5
py = (pix // Wd).astype(jnp.float32) + 0.5
o, d, _, _ = sensor.sample_rays(jnp.stack([px, py], -1))
t_min = jnp.full(L, 1e-4)

def timeit(f, *args, reps=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

STEPS = 32
W = geom.wide
iotaw = jnp.arange(W, dtype=jnp.int32)[None, :]

def mk(variant):
    ox, oy, oz = (a[:, None] for a in _components(o))
    dx, dy, dz = (a[:, None] for a in _components(d))
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    t_min1 = t_min[:, None]

    def body(i, st):
        cur, acc = st
        row = geom.rows[jnp.maximum(cur, 0)]          # [L,146] gather
        if variant == "gather":
            s = jnp.maximum(row - acc[:, None], 0).sum(axis=1)
        elif variant == "slab":
            nrow = row
            t0x = (nrow[:, 0*W:1*W] - ox) * ix
            t1x = (nrow[:, 3*W:4*W] - ox) * ix
            t0y = (nrow[:, 1*W:2*W] - oy) * iy
            t1y = (nrow[:, 4*W:5*W] - oy) * iy
            t0z = (nrow[:, 2*W:3*W] - oz) * iz
            t1z = (nrow[:, 5*W:6*W] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x,t1x), jnp.minimum(t0y,t1y)), jnp.minimum(t0z,t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x,t1x), jnp.maximum(t0y,t1y)), jnp.maximum(t0z,t1z))
            info16 = _i32(nrow[:, 6*W:7*W])
            hitw = (tn <= tf) & (tf >= t_min1) & (info16 != 0)
            tnm = jnp.where(hitw, tn, 3.4e38)
            kn = jnp.argmin(tnm, axis=1)
            seln = iotaw == kn[:, None]
            chosen = jnp.sum(jnp.where(seln, info16, 0), axis=1)
            s = jnp.min(tnm, axis=1) + chosen.astype(jnp.float32) * 1e-9
        elif variant == "slab_where":
            nd = (cur >= 0)
            nrow = jnp.where(nd[:, None], row, 0.0)   # the NaN-guard where
            t0x = (nrow[:, 0*W:1*W] - ox) * ix
            t1x = (nrow[:, 3*W:4*W] - ox) * ix
            t0y = (nrow[:, 1*W:2*W] - oy) * iy
            t1y = (nrow[:, 4*W:5*W] - oy) * iy
            t0z = (nrow[:, 2*W:3*W] - oz) * iz
            t1z = (nrow[:, 5*W:6*W] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x,t1x), jnp.minimum(t0y,t1y)), jnp.minimum(t0z,t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x,t1x), jnp.maximum(t0y,t1y)), jnp.maximum(t0z,t1z))
            info16 = _i32(nrow[:, 6*W:7*W])
            hitw = (tn <= tf) & (tf >= t_min1) & (info16 != 0)
            tnm = jnp.where(hitw, tn, 3.4e38)
            kn = jnp.argmin(tnm, axis=1)
            seln = iotaw == kn[:, None]
            chosen = jnp.sum(jnp.where(seln, info16, 0), axis=1)
            s = jnp.min(tnm, axis=1) + chosen.astype(jnp.float32) * 1e-9
        acc2 = acc * 0.5 + s * 1e-7
        nxt = (jax.lax.bitcast_convert_type(s, jnp.int32) ^ (cur * 7 + i))
        return (jnp.abs(nxt) % geom.rows.shape[0], acc2)
    return body

for variant in ("gather", "slab", "slab_where"):
    @jax.jit
    def run(idx0, acc0, v=variant):
        return jax.lax.fori_loop(0, STEPS, mk(v), (idx0, acc0))[1].sum()
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, geom.rows.shape[0], L), jnp.int32)
    acc0 = jnp.asarray(rng.random(L), jnp.float32)
    t = timeit(run, idx0, acc0)
    print(f"{variant:12s}: {t/STEPS*1e6:7.1f} us/step ({t/STEPS/L*1e9:5.2f} ns/lane)")
