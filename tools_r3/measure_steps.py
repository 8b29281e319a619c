"""Round-3 traversal measurement: step composition on kitchen.

For 64k camera rays and 64k incoherent rays, count per-step how many
lanes are (a) active at an internal node, (b) active at a leaf, and the
total iteration count. This tells us where the per-step row gathers go
and bounds the win of a VMEM-resident internal-level fast path.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from ppg_tpu.accel.traverse import (
    GeometryArrays, bvh_state_init, bvh_step_factory, MAX_STEPS)
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene
from ppg_tpu.render.sensor import make_sensor

sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
geom = dev.geom
print("tris:", geom.num_tris, "rows:", geom.rows.shape,
      "stack:", geom.stack_depth, "wide:", geom.wide)
rows_np = np.asarray(geom.rows)
infos = rows_np[:, 6 * geom.wide:7 * geom.wide].view(np.int32)
# internal rows = rows reachable as internal; count rows that look internal
# (leaf rows store count at 9W; internal rows have info entries)
from ppg_tpu.accel.traverse import LEAF_BIT, IDX_MASK
internal_ids = set()
frontier = [0]
level_counts = []
while frontier:
    level_counts.append(len(frontier))
    internal_ids.update(frontier)
    nxt = []
    ch = infos[np.array(frontier)].reshape(-1)
    ch = ch[(ch != 0) & ((ch & int(LEAF_BIT)) == 0)]
    nxt = list((ch & int(IDX_MASK)).astype(np.int64))
    frontier = nxt
print("internal rows:", len(internal_ids), "levels:", level_counts)
print("total rows:", rows_np.shape[0],
      "internal table MB:", len(internal_ids) * rows_np.shape[1] * 4 / 1e6)

sensor = make_sensor(sc.sensor, sc.film)
W, H = sc.film["width"], sc.film["height"]
L = 1 << 16
key = jax.random.key(0)
pix = jnp.arange(L) % (W * H)
px = (pix % W).astype(jnp.float32) + 0.5
py = (pix // W).astype(jnp.float32) + 0.5
o, d, _, _ = sensor.sample_rays(jnp.stack([px, py], -1))
t_min = jnp.full(L, 1e-4)
t_max = jnp.full(L, 3.4e38)


@jax.jit
def walk_counts(geom, o, d, t_min, t_max):
    body = bvh_step_factory(geom, o, d, t_min, t_max)
    state = bvh_state_init(o.shape[0], geom.stack_depth, t_max > t_min)
    state["n_int"] = jnp.int64(0)
    state["n_leaf"] = jnp.int64(0)

    def body2(st):
        act = st["cur"] >= 0
        n_int = st["n_int"] + jnp.sum(act & ~st["leaf"], dtype=jnp.int64)
        n_leaf = st["n_leaf"] + jnp.sum(act & st["leaf"], dtype=jnp.int64)
        core = {k: v for k, v in st.items() if k not in ("n_int", "n_leaf")}
        out = body(core)
        out["n_int"], out["n_leaf"] = n_int, n_leaf
        return out

    def cond(st):
        return jnp.any(st["cur"] >= 0) & (st["it"] < MAX_STEPS)

    out = jax.lax.while_loop(cond, body2, state)
    return (out["n_int"], out["n_leaf"], out["it"], out["best_i"],
            out["best_t"])


n_int, n_leaf, it, bi, bt = walk_counts(geom, o, d, t_min, t_max)
print(f"CAMERA: iters={int(it)} internal-visits/ray={float(n_int)/L:.2f} "
      f"leaf-visits/ray={float(n_leaf)/L:.2f} hitrate={float(jnp.mean(bi>=0)):.3f}")

# incoherent bounce-like rays: origins at hit points, directions random
hitp = o + d * jnp.where(bt > 1e30, 1.0, bt)[:, None] * 0.999
key1, key2 = jax.random.split(key)
dirs = jax.random.normal(key1, (L, 3))
dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
n_int2, n_leaf2, it2, bi2, _ = walk_counts(geom, hitp, dirs, t_min, t_max)
print(f"BOUNCE: iters={int(it2)} internal-visits/ray={float(n_int2)/L:.2f} "
      f"leaf-visits/ray={float(n_leaf2)/L:.2f} hitrate={float(jnp.mean(bi2>=0)):.3f}")

# wall time of the plain walk for reference
from ppg_tpu.accel.traverse import bvh_closest
r = jax.jit(lambda g, o, d, a, b: bvh_closest(g, o, d, a, b))
for name, oo, dd in (("camera", o, d), ("bounce", hitp, dirs)):
    out = r(geom, oo, dd, t_min, t_max)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = r(geom, oo, dd, t_min, t_max)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(f"{name}: {dt*1e3:.1f} ms for 64k rays = {L/dt/1e6:.2f} Mrays/s")
