import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/ppg_tpu_xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import numpy as np
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.guided import GuidedPathTracer

mode = sys.argv[1]
sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
tr = GuidedPathTracer(sc)
if mode == "classic":
    tr._regen_train_ok = lambda cfg: False
    tr._regen_ok = lambda cfg: False
t0=time.time()
img = tr.render(seed=0, spp_budget=32)
print(f"kitchen guided 32spp [{mode}]: {time.time()-t0:.1f}s mean {float(img.mean()):.4f}", flush=True)
