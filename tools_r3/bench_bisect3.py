"""Bisect the tail of from_scene."""
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
idx0 = jnp.asarray(rng.integers(0, N, L), jnp.int32)

def t(tag):
    jax.block_until_ready(chain(table, idx0, lane_v))
    t0 = time.time()
    for _ in range(10): out = chain(table, idx0, lane_v)
    jax.block_until_ready(out)
    print(f"{tag:28s}: {(time.time()-t0)/10/STEPS*1e6:8.1f} us/step")

t("fresh")
from ppg_tpu.scene.scene import load_scene
sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")

import ppg_tpu.bsdf.bsdf as B
import ppg_tpu.emitters.area as E
import ppg_tpu.emitters.delta as DE
from ppg_tpu.media import MediaArrays
from ppg_tpu.subsurface import SubsurfArrays

mats = B.MaterialArrays.from_table(sc.materials)
t("after MaterialArrays")
em = E.EmitterArrays.from_scene(sc)
t("after EmitterArrays")
if getattr(sc, "delta_emitters", None):
    delta = DE.DeltaEmitterArrays.from_table(sc.delta_emitters, sc.aabb_min, sc.aabb_max)
else:
    delta = DE.DeltaEmitterArrays.empty()
t("after DeltaEmitterArrays")
media = MediaArrays.from_table(sc.media) if getattr(sc, "media", None) else MediaArrays.empty()
t("after MediaArrays")
ss = SubsurfArrays.empty()
t("after SubsurfArrays")
