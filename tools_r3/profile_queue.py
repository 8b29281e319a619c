"""Round-3: kitchen production regen with the pixel queue — occupancy
and Mrays/s vs the fixed-binding baseline (0.613 Mrays/s, 28% alive)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene
from ppg_tpu.integrators.driver import make_config, _regen_dispatch
from ppg_tpu.render.sensor import make_sensor

sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
sensor = make_sensor(sc.sensor, sc.film)
cfg = make_config(sc, guiding=False, record_vertices=False)
n_pix = sc.film["width"] * sc.film["height"]
print("n_pix", n_pix)

L = 1 << 16
SPP = 32
NB = max(1, (SPP + 7) // 8)
key = jax.random.key(0)

def full_render(salt0, K):
    carry = None
    outs = None
    t0 = time.time()
    for i in range(40):
        outs, carry = _regen_dispatch(
            dev, cfg, key, np.int32(salt0 + i), sensor=sensor,
            pix_start=np.int32(0), L=L, spp=np.int32(SPP), K=np.int32(K),
            carry=carry, it_base=np.int32(i * K),
            qstart=np.int32(0), qend=np.int32(n_pix * NB), n_film=n_pix + 1,
            n_blocks=NB,
            n_slots=int(np.ceil(n_pix * NB / L)) + 4)
        if bool(outs["all_done"]):
            break
    jax.block_until_ready(carry["film"])
    return time.time() - t0, outs, carry, i + 1

t_c, *_ = full_render(0, 600)
print(f"compile+first full render: {t_c:.1f}s")

dt, out, carry, nd = full_render(100, 600)
n_rays = int(np.asarray(out["n_rays"]))
mi = int(np.asarray(out["mi"]))
mia = int(np.asarray(out["mi_alive"]))
miw = int(np.asarray(out["mi_walks"]))
film = np.asarray(carry["film"])[:n_pix]
w = film[:, 6]
print(f"full {SPP} spp render: {dt*1e3:.0f} ms over {nd} dispatches, "
      f"rays={n_rays} -> {n_rays/dt/1e6:.3f} Mrays/s")
print(f"machine iters={mi}, avg alive frac={mia/max(mi,1)/L:.3f}, "
      f"walks/iter={miw/max(mi,1):.0f}, ms/iter={dt*1e3/max(mi,1):.2f}")
print(f"w==spp: {(w==SPP).mean()*100:.2f}%  mean rgb "
      f"{(film[:, :3].sum(0)/np.maximum(w.sum(),1)).round(4)}")
