"""Honest gather cost model: marginal us/step from steps=16 vs 96,
after forcing sync mode, table as argument."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
_ = float(jnp.zeros(()))  # force sync mode

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

def run(table, idx0, lane_v, steps, reps=5):
    out = chain(table, idx0, lane_v, steps); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = chain(table, idx0, lane_v, steps)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

N = 111046
for L in (1 << 14, 1 << 16, 1 << 18):
    lane_v = jnp.asarray(rng.random(L), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, N, L), jnp.int32)
    for Wc in (32, 73, 146, 292):
        table = jnp.asarray(rng.random((N, Wc)), jnp.float32)
        t16 = run(table, idx0, lane_v, 16)
        t96 = run(table, idx0, lane_v, 96)
        marg = (t96 - t16) / 80
        bw = L * Wc * 4 / marg / 1e9
        print(f"L={L:6d} W={Wc:3d}: marginal {marg*1e6:7.1f} us/step, "
              f"{marg/L*1e9:6.2f} ns/lane, {bw:6.1f} GB/s")
