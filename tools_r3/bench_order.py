"""Does prior HBM allocation (scene load) change gather-chain speed?"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
STEPS = 32
L = 1 << 16

def timeit(f, *args, reps=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

@jax.jit
def chain(table, idx0, lane_v):
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

N, Wc = 111046, 146
table = jnp.asarray(rng.random((N, Wc)), jnp.float32)
idx0 = jnp.asarray(rng.integers(0, N, L), jnp.int32)
lane_v = jnp.asarray(rng.random(L), jnp.float32)

t = timeit(chain, table, idx0, lane_v)
print(f"fresh process     : {t/STEPS*1e6:8.1f} us/step")

from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene
sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
t = timeit(chain, table, idx0, lane_v)
print(f"after scene load  : {t/STEPS*1e6:8.1f} us/step")

t = timeit(chain, dev.geom.rows, idx0, lane_v)
print(f"geom.rows         : {t/STEPS*1e6:8.1f} us/step")
