"""Benchmark: sustained ray throughput of the wavefront tracer on one chip.

Renders the reference CBOX scene (512x512, maxDepth 10, unguided — the
BASELINE.json config-1 analog) and reports Mrays/sec, counting every
closest-hit query actually issued (camera + bounce segments), matching how
the reference's kdbench-style throughput would be measured.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 100 Mrays/s north-star target.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from ppg_tpu.integrators.driver import make_config
    from ppg_tpu.integrators.wavefront import DeviceScene, trace_paths
    from ppg_tpu.render.sensor import PerspectiveSensor

    ref_scene = "/root/reference/scenes/cbox/cbox.xml"
    if os.path.exists(ref_scene):
        from ppg_tpu.scene.scene import load_scene

        sc = load_scene(ref_scene)
    else:
        from ppg_tpu.scene.testscenes import mini_cbox

        sc = mini_cbox(res=512, max_depth=10)

    dev = DeviceScene.from_scene(sc)
    sensor = PerspectiveSensor(sc.sensor, sc.film)
    cfg = make_config(sc, guiding=False, record_vertices=False)
    W, H = sc.film["width"], sc.film["height"]
    CHUNK = 1 << 16  # sweet spot: larger wavefronts spill state arrays to HBM

    @jax.jit
    def pass_fn(key, start):
        ids = start + jnp.arange(CHUNK)
        pos = jnp.stack(
            [(ids % W).astype(jnp.float32), (ids // W).astype(jnp.float32)], -1
        ) + jax.random.uniform(key, (CHUNK, 2))
        o, d, tmin, tmax = sensor.sample_rays(pos)
        out = trace_paths(dev, cfg, key, o, d, tmin, tmax)
        return jnp.sum(out["li"]), out["n_rays"]

    key = jax.random.key(0)
    # compile + THOROUGH warmup: the first post-compile executions on the
    # TPU tunnel run ~4x slower until the program is resident
    n_chunks = (W * H + CHUNK - 1) // CHUNK
    for w in range(2 * n_chunks):
        s, n = pass_fn(jax.random.fold_in(key, 7777 + w), jnp.int32(0))
    jax.block_until_ready(s)

    reps = 6
    t0 = time.time()
    outs = []
    for r in range(reps):
        for c in range(n_chunks):
            s, n = pass_fn(jax.random.fold_in(key, r * 131 + c), jnp.int32(c * CHUNK))
            outs.append((s, n))  # no host sync inside the timing loop
    jax.block_until_ready(outs[-1][0])
    dt = time.time() - t0
    total_rays = sum(int(n) for _, n in outs)
    mrays = total_rays / dt / 1e6

    print(json.dumps({
        "metric": "cbox_512_unguided_maxdepth10_raythroughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
