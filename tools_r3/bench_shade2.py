"""Null-overhead baseline + fetch vs decode split + atlas internals."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene, fetch_row, decode_row

sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
_ = float(jnp.zeros(()))

L = 1 << 16
rng = np.random.default_rng(0)
T = dev.shade.shape[0]
tri = jnp.asarray(rng.integers(0, T, L), jnp.int32)
bu = jnp.asarray(rng.random(L), jnp.float32) * 0.5
bv = jnp.asarray(rng.random(L), jnp.float32) * 0.5

def tm(tag, f, *args, reps=8):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{tag:28s}: {dt*1e3:8.2f} ms")
    return dt

@jax.jit
def f_null(scene, tri):
    return tri.sum()
base = tm("null (dev as arg)", f_null, dev, tri)

@jax.jit
def f_take(scene, tri):
    return jnp.take(scene.shade, tri, axis=0).sum()
tm("raw take [1M,30]", f_take, dev, tri)

@jax.jit
def f_fetch(scene, tri):
    return fetch_row(scene, tri).sum()
tm("fetch_row", f_fetch, dev, tri)

@jax.jit
def f_decode(scene, tri, bu, bv):
    row = fetch_row(scene, tri)
    outs = decode_row(row, bu, bv)
    return sum(o.sum() for o in outs if hasattr(o, 'sum'))
tm("fetch+decode full", f_decode, dev, tri, bu, bv)

# repeat the same op 8x inside one dispatch to get marginal cost
@jax.jit
def f_take8(scene, tri):
    acc = jnp.float32(0)
    idx = tri
    for k in range(8):
        r = jnp.take(scene.shade, idx, axis=0)
        s = r.sum(axis=1)
        acc = acc + s.sum()
        idx = (idx + jax.lax.bitcast_convert_type(s, jnp.int32)) % T
        idx = jnp.abs(idx)
    return acc
t8 = tm("8x chained take [1M,30]", f_take8, dev, tri)

@jax.jit
def f_decode8(scene, tri, bu, bv):
    acc = jnp.float32(0)
    idx = tri
    for k in range(8):
        row = fetch_row(scene, idx)
        outs = decode_row(row, bu, bv)
        s = outs[0].sum(axis=-1)
        acc = acc + s.sum()
        idx = jnp.abs((idx + jax.lax.bitcast_convert_type(s.sum(), jnp.int32)) % T)
    return acc
tm("8x fetch+decode", f_decode8, dev, tri, bu, bv)
