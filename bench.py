"""Benchmark matrix: sustained ray throughput on one chip across the
configs that matter (VERDICT r2 item 3) — cbox (32 tris, Pallas brute
sweep) and kitchen (1M tris, BVH16 segment machine), unguided
production renders AND guided TRAINING passes (the record path that
feeds the SD-tree, guided_path.cpp:1210-1286's concurrent passes).

Ray counts are the tracers' own exact closest-hit counters — matching
how the reference's kdbench-style throughput would be measured
(mitsuba/src/utils/kdbench.cpp role).

Prints ONE JSON line. The headline metric is KITCHEN unguided (the
big-scene bottleneck the north star cares about); the full matrix
rides in the "matrix" key.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _unguided(path, spp=32):
    import jax
    import numpy as np

    from ppg_tpu.integrators.driver import _regen_dispatch, make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.render.sensor import make_sensor
    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(path)
    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    cfg = make_config(sc, guiding=False, record_vertices=False)
    n_pix = sc.film["width"] * sc.film["height"]
    L = 1 << 16
    n_blocks = max(1, spp // 8)
    n_slots = int(np.ceil(n_pix * n_blocks / L)) + 4
    key = jax.random.key(0)

    def render(salt0):
        carry, out, prev_done = None, None, None
        for i in range(40):
            out, carry = _regen_dispatch(
                dev, cfg, key, np.int32(salt0 + i), sensor=sensor,
                pix_start=np.int32(0), L=L, spp=np.int32(spp),
                K=np.int32(4000), carry=carry, it_base=np.int32(i * 4000),
                qstart=np.int32(0), qend=np.int32(n_pix * n_blocks),
                n_film=n_pix + 1, n_blocks=n_blocks, n_slots=n_slots)
            # lag the termination sync one dispatch so the ~30 ms tunnel
            # round-trip overlaps the next dispatch's execution (see
            # driver.render_regen; this was the r3 cbox bench regression)
            if prev_done is not None and bool(prev_done):
                break
            prev_done = out["all_done"]
        jax.block_until_ready(carry["film"])
        return out

    render(7777)  # compile + warm
    t0 = time.time()
    out = render(0)
    dt = time.time() - t0
    return int(np.asarray(out["n_rays"])) / dt / 1e6


def _guided_training(path, budget):
    """Mrays/s of the guided TRAINING iterations (record_vertices
    passes) at the scene's own guided_path parameters, spp budget
    reduced to keep bench wall-clock bounded."""
    import numpy as np

    from ppg_tpu.integrators.guided import GuidedPathTracer
    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(path)
    sc.integrator["budgetType"] = "spp"
    sc.integrator["budget"] = budget
    # warm run compiles every pass-batch program (tree-depth buckets
    # recompile as the SD-tree deepens); the measured run re-renders the
    # same schedule with the in-process compile cache hot, so its stats
    # rows are pure execution time
    GuidedPathTracer(sc).render(seed=0)
    tracer = GuidedPathTracer(sc)
    tracer.render(seed=0)
    rows = [r for r in tracer.stats if r.get("training")]
    rays = sum(r["n_rays"] for r in rows)
    secs = sum(r["seconds"] for r in rows)
    return rays / max(secs, 1e-9) / 1e6


def main():
    from ppg_tpu import enable_compilation_cache

    enable_compilation_cache()

    cbox = "/root/reference/scenes/cbox/cbox.xml"
    kitchen = "/root/reference/scenes/kitchen/kitchen.xml"
    if not os.path.exists(cbox):
        # fallback: no reference mount — bench the built-in test scene
        from ppg_tpu.scene.testscenes import mini_cbox  # noqa: F401

        print(json.dumps({"metric": "no_reference_scenes", "value": 0,
                          "unit": "Mrays/s", "vs_baseline": 0}))
        return

    matrix = []
    m_cbox = _unguided(cbox, spp=32)
    matrix.append({"metric": "cbox_512_unguided_maxdepth10",
                   "value": round(m_cbox, 3), "unit": "Mrays/s"})
    m_kit = _unguided(kitchen, spp=32)
    matrix.append({"metric": "kitchen_1Mtris_unguided",
                   "value": round(m_kit, 3), "unit": "Mrays/s"})
    m_cbox_t = _guided_training(cbox, budget=32)
    matrix.append({"metric": "cbox_guided_training",
                   "value": round(m_cbox_t, 3), "unit": "Mrays/s"})
    m_kit_t = _guided_training(kitchen, budget=12)
    matrix.append({"metric": "kitchen_guided_training",
                   "value": round(m_kit_t, 3), "unit": "Mrays/s"})

    print(json.dumps({
        "metric": "kitchen_1Mtris_unguided_raythroughput",
        "value": round(m_kit, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(m_kit / 100.0, 4),
        "matrix": matrix,
    }))


if __name__ == "__main__":
    main()
