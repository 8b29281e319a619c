"""Bisect which part of scene setup kills gather speed."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
STEPS = 32
L = 1 << 16

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
lane_v = jnp.asarray(rng.random(L), jnp.float32)
idx0 = jnp.asarray(rng.integers(0, N, L), jnp.int32)

def t():
    jax.block_until_ready(chain(table, idx0, lane_v))
    t0 = time.time()
    for _ in range(10): out = chain(table, idx0, lane_v)
    jax.block_until_ready(out)
    return (time.time() - t0) / 10 / STEPS * 1e6

print(f"fresh                 : {t():8.1f} us/step")
big = jnp.ones((512, 1024, 1024), jnp.float32)  # 2 GB
jax.block_until_ready(big)
print(f"after 2GB alloc       : {t():8.1f} us/step")
del big
import gc; gc.collect()
print(f"after 2GB free        : {t():8.1f} us/step")

from ppg_tpu.scene.scene import load_scene
sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
print(f"after load_scene(host): {t():8.1f} us/step")

from ppg_tpu.integrators.wavefront import DeviceScene
dev = DeviceScene.from_scene(sc)
print(f"after DeviceScene     : {t():8.1f} us/step")
del dev; gc.collect()
print(f"after del DeviceScene : {t():8.1f} us/step")
