"""Dependent-gather chain benchmark — traversal's true access pattern.

Each step's indices come from the previous step's gathered values, so
no algebraic rewrite can remove the gathers. Reports per-step cost.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
STEPS = 32


def timeit(f, *args, reps=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def chain(table, idx0):
    N = table.shape[0]

    def body(i, st):
        idx, acc = st
        row = jnp.take(table, idx, axis=0)  # [L, W]
        acc = acc + row[:, 1]
        # next index depends on gathered data (defeats any rewrite)
        idx = (jax.lax.bitcast_convert_type(row[:, 0], jnp.int32)
               ^ idx * 7 + i) % N
        return (jnp.abs(idx), acc)

    idx, acc = jax.lax.fori_loop(0, STEPS, body, (idx0, jnp.zeros_like(
        table[:, 0], shape=idx0.shape)))
    return acc.sum()


chain_j = jax.jit(chain)

for N, Wc in ((111_000, 146), (111_000, 112), (20_000, 112), (512, 112),
              (111_000, 290)):
    table = jnp.asarray(rng.random((N, Wc)), jnp.float32)
    for L in (1 << 16,):
        idx0 = jnp.asarray(rng.integers(0, N, L), jnp.int32)
        t = timeit(chain_j, table, idx0)
        per_step = t / STEPS
        print(f"N={N:7d} W={Wc:3d} L={L}: {t*1e3:7.2f} ms total, "
              f"{per_step*1e6:7.1f} us/step, {per_step/L*1e9:5.2f} ns/lane, "
              f"{L*Wc*4/per_step/1e9:6.1f} GB/s effective")

# bf16 variant at production shape
table = jnp.asarray(rng.random((111_000, 146)), jnp.float32).astype(jnp.bfloat16)


def chain16(table, idx0):
    N = table.shape[0]

    def body(i, st):
        idx, acc = st
        row = jnp.take(table, idx, axis=0)
        acc = acc + row[:, 1].astype(jnp.float32)
        idx = (jax.lax.bitcast_convert_type(
            row[:, 0].astype(jnp.float32), jnp.int32) ^ idx * 7 + i) % N
        return (jnp.abs(idx), acc)

    idx, acc = jax.lax.fori_loop(0, STEPS, body,
                                 (idx0, jnp.zeros(idx0.shape, jnp.float32)))
    return acc.sum()


idx0 = jnp.asarray(rng.integers(0, 111_000, 1 << 16), jnp.int32)
t = timeit(jax.jit(chain16), table, idx0)
print(f"bf16 N=111000 W=146 L=65536: {t/STEPS*1e6:7.1f} us/step, "
      f"{t/STEPS/(1<<16)*1e9:5.2f} ns/lane")
