import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/ppg_tpu_xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import time, numpy as np
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.driver import make_config, render_regen
from ppg_tpu.io.exr import read
sc = load_scene("/root/reference/scenes/spaceship/spaceship.xml")
cfg = make_config(sc, guiding=False, record_vertices=False)
t0=time.time()
img = render_regen(sc, spp=16, seed=1, cfg=cfg)
print(f"spaceship 16spp: {time.time()-t0:.1f}s", flush=True)
ref = read("/root/reference/scenes/spaceship/spaceship.exr")[0]
m = img.reshape(-1,3).mean(0); r = ref.reshape(-1,3).mean(0)
print("ours", m, "ref", r, "ratio", m/r, flush=True)
