"""In-situ cost attribution on kitchen queue regen: run one variant per
process (jit caches key on cfg statics; SEG_B needs a fresh process).

usage: python profile_ab.py [base|notex|noenv|segb32|segb8|L32k]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

variant = sys.argv[1] if len(sys.argv) > 1 else "base"

import ppg_tpu.integrators.regen as RG

if variant == "segb32":
    RG.SEG_B = 32
elif variant == "segb8":
    RG.SEG_B = 8

from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene
from ppg_tpu.integrators.driver import make_config, _regen_dispatch
from ppg_tpu.render.sensor import make_sensor

sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
sensor = make_sensor(sc.sensor, sc.film)
over = {}
if variant == "notex":
    over["has_tex"] = False
if variant == "noenv":
    over["has_env"] = False
cfg = make_config(sc, guiding=False, record_vertices=False, **over)
n_pix = sc.film["width"] * sc.film["height"]

L = 1 << 15 if variant == "L32k" else 1 << 16
SPP = 8
NB = 1
key = jax.random.key(0)

def full_render(salt0):
    carry = None
    t0 = time.time()
    for i in range(40):
        out, carry = _regen_dispatch(
            dev, cfg, key, np.int32(salt0 + i), sensor=sensor,
            pix_start=np.int32(0), L=L, spp=np.int32(SPP), K=np.int32(2000),
            carry=carry, it_base=np.int32(i * 2000),
            qstart=np.int32(0), qend=np.int32(n_pix * NB), n_film=n_pix + 1,
            n_blocks=NB, n_slots=int(np.ceil(n_pix * NB / L)) + 4)
        if bool(out["all_done"]):
            break
    jax.block_until_ready(carry["film"])
    return time.time() - t0, out

full_render(0)
dt, out = full_render(100)
n_rays = int(np.asarray(out["n_rays"]))
mi = int(np.asarray(out["mi"]))
mia = int(np.asarray(out["mi_alive"]))
print(f"{variant}: {dt*1e3:.0f} ms, rays={n_rays}, "
      f"{n_rays/dt/1e6:.3f} Mrays/s, iters={mi}, "
      f"alive={mia/max(mi,1)/L:.3f}, ms/iter={dt*1e3/max(mi,1):.2f}")
