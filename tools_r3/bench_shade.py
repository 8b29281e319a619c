"""Decompose kitchen shade cost: fetch_row/decode, gather_params,
texture atlas sampling, sample_bsdf, emitter/env eval — 64k lanes."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene, fetch_row, decode_row
import ppg_tpu.bsdf.bsdf as B
import ppg_tpu.emitters.envmap as EV
from ppg_tpu.scene.textures import sample_atlas

sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
_ = float(jnp.zeros(()))

L = 1 << 16
rng = np.random.default_rng(0)
T = dev.shade.shape[0]
tri = jnp.asarray(rng.integers(0, T, L), jnp.int32)
bu = jnp.asarray(rng.random(L), jnp.float32) * 0.5
bv = jnp.asarray(rng.random(L), jnp.float32) * 0.5
d = jnp.asarray(rng.normal(size=(L, 3)), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
u3 = jnp.asarray(rng.random((L, 3)), jnp.float32)

def tm(tag, f, *args, reps=5):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{tag:24s}: {dt*1e3:8.2f} ms ({dt/L*1e9:6.1f} ns/lane)")
    return dt

print("shade table:", dev.shade.shape, " mats packed:", dev.mats.packed.shape,
      " atlas:", None if dev.tex is None else jax.tree.map(jnp.shape, dev.tex.__dict__ if hasattr(dev.tex,'__dict__') else {}))

@jax.jit
def f_fetch(scene, tri, bu, bv):
    row = fetch_row(scene, tri)
    return decode_row(row, bu, bv)[0].sum()
tm("fetch+decode_row", f_fetch, dev, tri, bu, bv)

@jax.jit
def f_params(scene, tri, bu, bv):
    row = fetch_row(scene, tri)
    mid = jax.lax.bitcast_convert_type(row[:, 12], jnp.int32)
    p = B.gather_params(scene.mats, mid)
    return sum(v.sum() for v in p.values() if hasattr(v, 'sum'))
tm("  + gather_params", f_params, dev, tri, bu, bv)

present = frozenset(int(x) for x in np.unique(
    np.asarray(jax.lax.bitcast_convert_type(dev.mats.packed[:, 0], jnp.int32))))
print("present families:", sorted(present))

@jax.jit
def f_sample(scene, tri, bu, bv, d, u3):
    row = fetch_row(scene, tri)
    mid = jax.lax.bitcast_convert_type(row[:, 12], jnp.int32)
    p = B.gather_params(scene.mats, mid)
    wo, w, pdf, delta, eta = B.sample_bsdf(p, -d, u3, present=present)
    return wo.sum() + w.sum() + pdf.sum()
tm("  + sample_bsdf", f_sample, dev, tri, bu, bv, d, u3)

uv = jnp.stack([bu, bv], -1)
@jax.jit
def f_tex(scene, uv):
    val = sample_atlas(scene.tex, jnp.ones((L,), jnp.int32), uv, None)
    return val.sum()
tm("atlas sample (1 tex)", f_tex, dev, uv)

@jax.jit
def f_env(scene, d):
    return EV.eval_env(scene.env, d).sum()
tm("eval_env", f_env, dev, d)
