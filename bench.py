"""Benchmark: sustained ray throughput of the regenerative wavefront
tracer on one chip.

Renders the reference CBOX scene (512x512, maxDepth 10, unguided — the
BASELINE.json config-1 analog) at 32 spp with the persistent-wavefront
regeneration tracer (integrators/regen.py) and reports Mrays/sec from
the tracer's own exact closest-hit counts — matching how the reference's
kdbench-style throughput would be measured.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 100 Mrays/s north-star target.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from ppg_tpu import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from ppg_tpu.integrators.driver import _regen_dispatch, make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.render.sensor import make_sensor

    ref_scene = "/root/reference/scenes/cbox/cbox.xml"
    if os.path.exists(ref_scene):
        from ppg_tpu.scene.scene import load_scene

        sc = load_scene(ref_scene)
    else:
        from ppg_tpu.scene.testscenes import mini_cbox

        sc = mini_cbox(res=512, max_depth=10)

    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    cfg = make_config(sc, guiding=False, record_vertices=False)
    W, H = sc.film["width"], sc.film["height"]
    CHUNK = 1 << 16
    SPP = 32
    KMAX = SPP * 24 + 64
    n_chunks = (W * H + CHUNK - 1) // CHUNK

    spp_t, K_t = np.int32(SPP), np.int32(KMAX)

    def frame(salt0):
        # NO eager jax ops and NO device scalars in this loop: every
        # eager op / host sync on the TPU tunnel costs a round-trip and
        # serializes the dispatch pipeline (the key fold happens inside
        # _regen_dispatch's jit)
        outs = []
        for c in range(n_chunks):
            out, _ = _regen_dispatch(
                dev, cfg, key, np.int32(salt0 + c), sensor=sensor,
                pix_start=np.int32(c * CHUNK), L=CHUNK,
                spp=spp_t, K=K_t, carry=None, it_base=np.int32(0))
            outs.append(out)
        return outs

    key = jax.random.key(0)
    # compile + warmup (first post-compile executions on the TPU tunnel
    # run slower until the program is resident)
    for w in range(3):
        outs = frame(7777 + w * n_chunks)
    jax.block_until_ready(outs[-1]["rgb"])

    reps = 4
    t0 = time.time()
    all_outs = []
    for r in range(reps):
        all_outs.extend(frame(r * n_chunks))
    jax.block_until_ready(all_outs[-1]["rgb"])
    dt = time.time() - t0
    total_rays = sum(int(np.asarray(o["n_rays"])) for o in all_outs)
    mrays = total_rays / dt / 1e6

    print(json.dumps({
        "metric": "cbox_512_unguided_maxdepth10_raythroughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
