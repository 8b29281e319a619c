"""Round-3 gather microbenchmarks: what drives the 10.6 ns/lane fixed cost?

Sweeps table size, row width, dtype, index distribution (random/sorted/
constant), and the indices_are_sorted hint, at 64k lanes on the TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

L = 1 << 16
rng = np.random.default_rng(0)


def timeit(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


@jax.jit
def take_rows(table, idx):
    return jnp.take(table, idx, axis=0).sum()


@jax.jit
def take_rows_sorted(table, idx):
    g = jax.lax.gather(
        table,
        idx[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        (1, table.shape[1]),
        indices_are_sorted=True,
    )
    return g.sum()


for N in (512, 20_000, 111_000):
    for Wc in (112, 146, 290):
        table = jnp.asarray(rng.random((N, Wc)), jnp.float32)
        idx_r = jnp.asarray(rng.integers(0, N, L), jnp.int32)
        idx_s = jnp.sort(idx_r)
        idx_0 = jnp.zeros(L, jnp.int32)
        t_rand = timeit(take_rows, table, idx_r)
        t_sort = timeit(take_rows, table, idx_s)
        t_hint = timeit(take_rows_sorted, table, idx_s)
        t_zero = timeit(take_rows, table, idx_0)
        print(f"N={N:7d} W={Wc:3d} f32 | rand {t_rand*1e6:7.0f}us "
              f"sorted {t_sort*1e6:7.0f}us hint {t_hint*1e6:7.0f}us "
              f"const0 {t_zero*1e6:7.0f}us  ({t_rand/L*1e9:.1f} ns/lane)")

# dtype sweep at production shape
for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16"),
                 (jnp.int8, "i8")):
    table = jnp.asarray(rng.random((111_000, 146)), jnp.float32).astype(dt)
    idx_r = jnp.asarray(rng.integers(0, 111_000, L), jnp.int32)
    t = timeit(take_rows, table, idx_r)
    print(f"N=111000 W=146 {name:4s} | rand {t*1e6:7.0f}us "
          f"({t/L*1e9:.1f} ns/lane)")

# lane-count sweep (is the fixed cost per lane or per op?)
table = jnp.asarray(rng.random((111_000, 146)), jnp.float32)
for lanes in (1 << 12, 1 << 14, 1 << 16, 1 << 18):
    idx_r = jnp.asarray(rng.integers(0, 111_000, lanes), jnp.int32)
    t = timeit(take_rows, table, idx_r)
    print(f"L={lanes:7d} N=111k W=146 | rand {t*1e6:7.0f}us "
          f"({t/lanes*1e9:.1f} ns/lane)")
