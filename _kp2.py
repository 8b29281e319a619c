import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/ppg_tpu_xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import numpy as np, jax.numpy as jnp
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene
from ppg_tpu.render.sensor import make_sensor
from ppg_tpu.integrators.driver import _regen_dispatch, make_config
sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
sensor = make_sensor(sc.sensor, sc.film)
cfg = make_config(sc, guiding=False, record_vertices=False)
L=1<<16; SPP=8; K=SPP*24+64
key=jax.random.key(0)
out,_ = _regen_dispatch(dev, cfg, key, np.int32(0), sensor=sensor, pix_start=np.int32(0), L=L, spp=np.int32(SPP), K=np.int32(K), carry=None, it_base=np.int32(0))
jax.block_until_ready(out["rgb"])
with jax.profiler.trace("/tmp/ktrace2"):
    out,_ = _regen_dispatch(dev, cfg, key, np.int32(1), sensor=sensor, pix_start=np.int32(L), L=L, spp=np.int32(SPP), K=np.int32(K), carry=None, it_base=np.int32(0))
    jax.block_until_ready(out["rgb"])
print("done", flush=True)
