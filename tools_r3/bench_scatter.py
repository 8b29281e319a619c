"""Decide the pixel-queue film-commit design: cost of (a) scatter-add of
L unique rows into [Npix,8], (b) cumsum over L, (c) one-hot slot write
[L,S,8] — all at 64k lanes on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

_ = float(jnp.zeros(()))
rng = np.random.default_rng(0)
L = 1 << 16
NP_ = 280_000
S = 8

idx = jnp.asarray(rng.permutation(NP_)[:L], jnp.int32)
vals = jnp.asarray(rng.random((L, 8), np.float32))
film = jnp.zeros((NP_, 8), jnp.float32)
mask = jnp.asarray(rng.random(L) < 0.3)

def tm(tag, f, *args, reps=20):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    print(f"{tag:34s}: {(time.time()-t0)/reps*1e6:9.1f} us")

@jax.jit
def f_scatter(film, idx, vals, mask):
    i = jnp.where(mask, idx, NP_)  # drop non-flushers
    return film.at[i].add(vals, mode="drop", unique_indices=True)
tm("scatter-add unique [64k->280k,8]", f_scatter, film, idx, vals, mask)

@jax.jit
def f_scatter_nu(film, idx, vals, mask):
    i = jnp.where(mask, idx, NP_)
    return film.at[i].add(vals, mode="drop")
tm("scatter-add generic", f_scatter_nu, film, idx, vals, mask)

@jax.jit
def f_cumsum(mask):
    r = jnp.cumsum(mask.astype(jnp.int32))
    return r[-1], r
tm("cumsum int32 [64k]", f_cumsum, mask)

slot = jnp.zeros((L, S, 8), jnp.float32)
si = jnp.asarray(rng.integers(0, S, L), jnp.int32)
@jax.jit
def f_slot(slot, si, vals, mask):
    oh = mask[:, None] & (jnp.arange(S)[None] == si[:, None])
    return jnp.where(oh[..., None], vals[:, None, :], slot)
tm(f"one-hot slot write [64k,{S},8]", f_slot, slot, si, vals, mask)

# combined: full body analog — scatter inside a fori loop of 16
@jax.jit
def f_loop(film, idx, vals, mask):
    def b(i, f):
        ii = jnp.where(mask, (idx + i) % NP_, NP_)
        return f.at[ii].add(vals, mode="drop", unique_indices=True)
    return jax.lax.fori_loop(0, 16, b, film)
def tl(tag, f, *args, reps=5):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    print(f"{tag:34s}: {(time.time()-t0)/reps/16*1e6:9.1f} us/iter")
tl("scatter in fori x16 (amortized)", f_loop, film, idx, vals, mask)
