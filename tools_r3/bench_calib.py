"""Calibrate axon timing semantics: matmul of known FLOPs before/after
first D2H; gather chain STEPS scaling after D2H."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)

@jax.jit
def mm(a, b):
    return (a @ b).sum(axis=1)

A = jnp.asarray(rng.random((8192, 8192)), jnp.bfloat16)
B = jnp.asarray(rng.random((8192, 8192)), jnp.bfloat16)

def tm(tag, f, *args, reps=5):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    fl = 2 * 8192**3 / dt / 1e12
    print(f"{tag:24s}: {dt*1e3:8.2f} ms  ({fl:6.1f} TFLOP/s)")

tm("matmul fresh (lazy?)", mm, A, B)
_ = float(jnp.zeros(()))  # first D2H: mode switch
tm("matmul after D2H", mm, A, B)

L = 1 << 16
table = jnp.asarray(rng.random((111046, 146)), jnp.float32)
lane_v = jnp.asarray(rng.random(L), jnp.float32)
idx0 = jnp.asarray(rng.integers(0, 111046, L), jnp.int32)

from functools import partial
@partial(jax.jit, static_argnums=3)
def chain(table, idx0, lane_v, steps):
    N = table.shape[0]
    def body(i, st):
        idx, acc = st
        row = jnp.take(table, idx, axis=0)
        s = jnp.maximum(row - acc[:, None], 0.0).sum(axis=1)
        acc = acc * 0.5 + s * 1e-6
        idx = (jax.lax.bitcast_convert_type(s, jnp.int32) ^ (idx * 7 + i))
        return (jnp.abs(idx) % N, acc)
    idx, acc = jax.lax.fori_loop(0, steps, body, (idx0, lane_v))
    return acc.sum()

for steps in (1, 8, 32, 128):
    out = chain(table, idx0, lane_v, steps); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5): out = chain(table, idx0, lane_v, steps)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(f"chain steps={steps:4d}: {dt*1e3:8.2f} ms total, {dt/steps*1e6:7.1f} us/step")
