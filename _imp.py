import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/ppg_tpu_xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import time, numpy as np
logf = open("/tmp/imp_results.txt", "a")
def P(*a):
    print(*a, flush=True); print(*a, file=logf, flush=True)
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.guided import GuidedPathTracer
from ppg_tpu.io.exr import read
sc = load_scene("/root/reference/scenes/cbox/cbox-improved.xml")
P("integrator:", {k: v for k, v in sc.integrator.items() if k != "toWorld"})
t0=time.time()
img = GuidedPathTracer(sc).render(seed=0)
P(f"improved render: {time.time()-t0:.1f}s")
ref = read("/root/reference/scenes/cbox/cbox-improved.exr")[0]
P("ratio", img.reshape(-1,3).mean(0)/ref.reshape(-1,3).mean(0))
P("MSE vs bundled improved exr:", float(np.mean((img-ref)**2)))
