"""Micro-bisect DeltaEmitterArrays.from_table."""
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

table = jnp.asarray(rng.random((111046, 146)), jnp.float32)
lane_v = jnp.asarray(rng.random(L), jnp.float32)
idx0 = jnp.asarray(rng.integers(0, 111046, L), jnp.int32)

def t(tag):
    jax.block_until_ready(chain(table, idx0, lane_v))
    t0 = time.time()
    for _ in range(10): out = chain(table, idx0, lane_v)
    jax.block_until_ready(out)
    print(f"{tag:28s}: {(time.time()-t0)/10/STEPS*1e6:8.1f} us/step")

t("fresh")
rows = jnp.asarray(np.zeros((1, 12), np.float32))
t("after [1,12] upload")
s = jnp.float32(1.5)
t("after rank-0 float32")
x = float(np.asarray(rows).sum())
t("after host transfer")
i = jnp.int32(3)
t("after rank-0 int32")
b = jnp.asarray(np.float32(2.5))
t("after np scalar upload")
