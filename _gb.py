import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/ppg_tpu_xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import time, numpy as np
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.guided import GuidedPathTracer
from ppg_tpu.io.exr import read
sc = load_scene("/root/reference/scenes/cbox/cbox.xml")
t0=time.time()
tracer = GuidedPathTracer(sc)
img = tracer.render(seed=0)
dt=time.time()-t0
ref = read("/root/reference/scenes/cbox/cbox.exr")[0]
mse = float(np.mean((img-ref)**2))
print(f"guided cbox 127spp: {dt:.1f}s MSE {mse:.5f} ratio {float(img.mean()/ref.mean()):.4f}", flush=True)
