"""Bisect inside DeviceScene.from_scene: which sub-step degrades gathers."""
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
t("after load_scene")

from ppg_tpu.accel.traverse import build_geometry
geom = build_geometry(sc.positions, sc.faces)
t("after build_geometry")

from ppg_tpu.emitters.envmap import build_env_from_spec
scene_dir = sc.textures.scene_xml.dir if sc.textures else "."
env = build_env_from_spec(sc.env_emitter, scene_dir, sc.aabb_min, sc.aabb_max)
t("after env build")

from ppg_tpu.scene.textures import TextureAtlas
tex = TextureAtlas.build(
    [dict(s.props, _otype=s.otype, _children=s.children)
     for s in sc.textures.specs],
    sc.textures.scene_xml.dir)
t("after texture atlas")

from ppg_tpu.integrators.wavefront import DeviceScene
dev = DeviceScene.from_scene(sc)
t("after full from_scene")
