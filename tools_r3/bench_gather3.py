"""Dependent-gather chain, consuming ALL row columns (no narrowing)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
STEPS = 32

def timeit(f, *args, reps=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

def chain(table, idx0):
    N = table.shape[0]
    def body(i, st):
        idx, acc = st
        row = jnp.take(table, idx, axis=0)  # [L, W]
        s = row.sum(axis=1)                  # consume every column
        acc = acc + s
        idx = (jax.lax.bitcast_convert_type(s, jnp.int32) ^ (idx * 7 + i))
        return (jnp.abs(idx) % N, acc)
    idx, acc = jax.lax.fori_loop(0, STEPS, body,
                                 (idx0, jnp.zeros(idx0.shape, jnp.float32)))
    return acc.sum()

chain_j = jax.jit(chain)
L = 1 << 16
for N, Wc in ((111_000, 146), (111_000, 112), (20_000, 112), (512, 112), (111_000, 290)):
    table = jnp.asarray(rng.random((N, Wc)), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, N, L), jnp.int32)
    t = timeit(chain_j, table, idx0)
    per = t / STEPS
    print(f"N={N:7d} W={Wc:3d}: {per*1e6:7.1f} us/step, {per/L*1e9:5.2f} ns/lane, "
          f"{L*Wc*4/per/1e9:6.1f} GB/s effective")
