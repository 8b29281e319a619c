"""Decisive A/B: same dependent-gather chain over (a) random table as arg,
(b) geom.rows as arg, (c) random captured, (d) geom.rows captured.
Also prints geom.rows shape/dtype and content stats."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene

sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
geom = dev.geom
rows = geom.rows
print("geom.rows:", rows.shape, rows.dtype)
rnp = np.asarray(rows)
print("finite frac:", np.isfinite(rnp).mean(), "abs>1e30 frac:", (np.abs(rnp) > 1e30).mean(),
      "nan frac:", np.isnan(rnp).mean())

rng = np.random.default_rng(0)
STEPS = 32
L = 1 << 16

def timeit(f, *args, reps=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

def chain_arg(table, idx0, lane_v):
    N = table.shape[0]
    def body(i, st):
        idx, acc = st
        row = jnp.take(table, idx, axis=0)
        s = jnp.maximum(row - acc[:, None], 0.0).sum(axis=1)
        acc = acc * 0.5 + s * 1e-6
        idx = (jax.lax.bitcast_convert_type(s, jnp.int32) ^ (idx * 7 + i))
        return (jnp.abs(idx) % N, acc)
    idx, acc = jax.lax.fori_loop(0, STEPS, body, (idx0, lane_v))
    return acc.sum()

N, Wc = rows.shape
rand_table = jnp.asarray(rng.random((N, Wc)), jnp.float32)
idx0 = jnp.asarray(rng.integers(0, N, L), jnp.int32)
lane_v = jnp.asarray(rng.random(L), jnp.float32)

caj = jax.jit(chain_arg)
t = timeit(caj, rand_table, idx0, lane_v)
print(f"rand  as ARG     : {t/STEPS*1e6:8.1f} us/step")
t = timeit(caj, rows, idx0, lane_v)
print(f"geom  as ARG     : {t/STEPS*1e6:8.1f} us/step")

for name, tab in (("rand", rand_table), ("geom", rows)):
    @jax.jit
    def cap(idx0, lane_v, tab=tab):
        return chain_arg(tab, idx0, lane_v)
    t = timeit(cap, idx0, lane_v)
    print(f"{name}  CAPTURED   : {t/STEPS*1e6:8.1f} us/step")
