"""Honest timing: distinct args per rep (defeats any execution result
caching in the axon tunnel), fresh process, no scene load."""
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
R = 10
idxs = [jnp.asarray(rng.integers(0, N, L), jnp.int32) for _ in range(R)]

# warmup
jax.block_until_ready(chain(table, idxs[0], lane_v))

# same-args timing (old style)
t0 = time.time()
for _ in range(R): out = chain(table, idxs[0], lane_v)
jax.block_until_ready(out)
t_same = (time.time() - t0) / R
print(f"same args  : {t_same/STEPS*1e6:8.1f} us/step")

# distinct-args timing
t0 = time.time()
outs = [chain(table, idxs[i], lane_v) for i in range(R)]
jax.block_until_ready(outs)
t_dist = (time.time() - t0) / R
print(f"distinct   : {t_dist/STEPS*1e6:8.1f} us/step")
