"""Real bvh step body: fori_loop (fixed 32 steps) vs while_loop timing.
Separates the cost of the step body from the while_loop/cond machinery."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from ppg_tpu.accel.traverse import (bvh_state_init, bvh_step_factory, MAX_STEPS)
from ppg_tpu.scene.scene import load_scene
from ppg_tpu.integrators.wavefront import DeviceScene
from ppg_tpu.render.sensor import make_sensor

sc = load_scene("/root/reference/scenes/kitchen/kitchen.xml")
dev = DeviceScene.from_scene(sc)
geom = dev.geom
sensor = make_sensor(sc.sensor, sc.film)
W, H = sc.film["width"], sc.film["height"]
L = 1 << 16
pix = jnp.arange(L) % (W * H)
px = (pix % W).astype(jnp.float32) + 0.5
py = (pix // W).astype(jnp.float32) + 0.5
o, d, _, _ = sensor.sample_rays(jnp.stack([px, py], -1))
t_min = jnp.full(L, 1e-4); t_max = jnp.full(L, 3.4e38)

def timeit(f, *args, reps=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

STEPS = 32
@jax.jit
def fixed_steps(geom, o, d, t_min, t_max):
    body = bvh_step_factory(geom, o, d, t_min, t_max)
    st = bvh_state_init(L, geom.stack_depth, t_max > t_min)
    st = jax.lax.fori_loop(0, STEPS, lambda i, s: body(s), st)
    return st["best_t"].sum() + st["best_i"].sum()

@jax.jit
def while_steps(geom, o, d, t_min, t_max):
    body = bvh_step_factory(geom, o, d, t_min, t_max)
    def cond(s): return jnp.any(s["cur"] >= 0) & (s["it"] < MAX_STEPS)
    st = bvh_state_init(L, geom.stack_depth, t_max > t_min)
    st = jax.lax.while_loop(cond, body, st)
    return st["best_t"].sum() + st["best_i"].sum(), st["it"]

t = timeit(fixed_steps, geom, o, d, t_min, t_max)
print(f"fori 32 steps: {t*1e3:.2f} ms -> {t/STEPS*1e6:.1f} us/step "
      f"({t/STEPS/L*1e9:.2f} ns/lane)")
out = while_steps(geom, o, d, t_min, t_max)
print("while iters:", int(out[1]))
t = timeit(while_steps, geom, o, d, t_min, t_max)
it = int(out[1])
print(f"while {it} iters: {t*1e3:.2f} ms -> {t/it*1e6:.1f} us/step "
      f"({t/it/L*1e9:.2f} ns/lane)")
