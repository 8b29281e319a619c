"""Round-3: where does kitchen production regen time go?

Times a full production unguided regen dispatch on kitchen at 64k lanes
and back-computes per-ray costs against the raw traversal step cost.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene
from ppg_tpu.integrators.driver import make_config, _regen_dispatch
from ppg_tpu.integrators import regen as RG
from ppg_tpu.render.sensor import make_sensor

sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
sensor = make_sensor(sc.sensor, sc.film)
cfg = make_config(sc, guiding=False, record_vertices=False)
print("cfg: nee", cfg.do_nee, "max_depth", cfg.max_depth,
      "has_mask", cfg.has_mask, "has_null", cfg.has_null,
      "rr_depth", getattr(cfg, "rr_depth", None))

L = 1 << 16
SPP = 4
KMAX = SPP * 24 + 64
key = jax.random.key(0)

t0 = time.time()
out, carry = _regen_dispatch(
    dev, cfg, key, np.int32(1234), sensor=sensor,
    pix_start=np.int32(0), L=L, spp=np.int32(SPP), K=np.int32(KMAX),
    carry=None, it_base=np.int32(0))
jax.block_until_ready(out["rgb"])
print(f"compile+first run: {time.time()-t0:.1f}s")

reps = 3
t0 = time.time()
for r in range(reps):
    out, carry = _regen_dispatch(
        dev, cfg, key, np.int32(999 + r), sensor=sensor,
        pix_start=np.int32(0), L=L, spp=np.int32(SPP), K=np.int32(KMAX),
        carry=None, it_base=np.int32(0))
jax.block_until_ready(out["rgb"])
dt = (time.time() - t0) / reps
n_rays = int(np.asarray(out["n_rays"]))
n_done = int(np.asarray(out["done"]).sum())
n_started = int(np.asarray(out["started"]).sum())
vsum = int(np.asarray(out["n_vertices"]))
print(f"dispatch: {dt*1e3:.0f} ms, rays={n_rays}, done={n_done}, "
      f"started={n_started}, mean_path_len={vsum/max(n_done,1):.2f}")
print(f"-> {n_rays/dt/1e6:.3f} Mrays/s, {n_rays/L:.1f} rays/lane, "
      f"{dt*1e9/n_rays:.0f} ns/ray")
step_ns = 17.6  # measured per-lane per-step gather-bound cost
print(f"traversal-only ideal at ~6 visits/walk: {6*step_ns:.0f} ns/ray")

if "mi" in out:
    mi = int(np.asarray(out["mi"]))
    mia = int(np.asarray(out["mi_alive"]))
    miw = int(np.asarray(out["mi_walks"]))
    print(f"machine iters={mi}, avg alive frac={mia/max(mi,1)/L:.3f}, "
          f"walks done={miw}, walks/iter={miw/max(mi,1):.0f}, "
          f"ms/iter={dt*1e3/max(mi,1):.2f}")
