"""Benchmark matrix: sustained ray throughput on one chip across the
configs that matter (VERDICT r2 item 3) — cbox (32 tris, Pallas brute
sweep) and kitchen (1M tris, BVH16 segment machine), unguided
production renders AND guided TRAINING passes (the record path that
feeds the SD-tree, guided_path.cpp:1210-1286's concurrent passes).

Ray counts are the tracers' own exact closest-hit counters — matching
how the reference's kdbench-style throughput would be measured
(mitsuba/src/utils/kdbench.cpp role).

Prints ONE JSON line — ALWAYS (VERDICT r4 weak #1: a benchmark that
times out reports nothing and fails its one job). Every stage runs in
a SUBPROCESS with a hard kill timeout: the TPU tunnel can wedge a
process inside an uninterruptible tcp_recv (remote_compile hangs,
STATUS.md round 5), which no in-process alarm can break. Stages run
headline-first within a wall-clock budget (PPG_BENCH_BUDGET seconds,
default 900); whatever completes lands in the matrix, the rest appear
with value null and a reason. Guided-training stages retry once with
PPG_TRAIN_MODE=classic — the small-program fallback for days when the
tunnel's compile helper cannot build the fused machine-mode programs
(the measurement is then flagged with mode "classic").

The headline metric is KITCHEN unguided (the big-scene bottleneck the
north star cares about); the full matrix rides in the "matrix" key.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BUDGET = float(os.environ.get("PPG_BENCH_BUDGET", 900))
T0 = time.time()


def _remaining():
    return BUDGET - (time.time() - T0)


# ---------------------------------------------------------------------------
# stage implementations (run inside the --stage subprocess)

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
    reduced to keep bench wall-clock bounded. The first render warms
    every pass-batch program (the persistent disk cache makes this
    mostly deserialize time); the measured run re-renders the same
    schedule so its stats rows are pure execution time."""
    from ppg_tpu.integrators.guided import GuidedPathTracer
    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(path)
    sc.integrator["budgetType"] = "spp"
    sc.integrator["budget"] = budget
    GuidedPathTracer(sc).render(seed=0)
    tracer = GuidedPathTracer(sc)
    tracer.render(seed=0)
    rows = [r for r in tracer.stats if r.get("training")]
    rays = sum(r["n_rays"] for r in rows)
    secs = sum(r["seconds"] for r in rows)
    return rays / max(secs, 1e-9) / 1e6


CBOX = "/root/reference/scenes/cbox/cbox.xml"
KITCHEN = "/root/reference/scenes/kitchen/kitchen.xml"

STAGES = {
    "kitchen_unguided": lambda: _unguided(KITCHEN, spp=32),
    "cbox_unguided": lambda: _unguided(CBOX, spp=32),
    "cbox_training": lambda: _guided_training(CBOX, budget=32),
    "kitchen_training": lambda: _guided_training(KITCHEN, budget=8),
}


def _stage_main(name):
    from ppg_tpu import enable_compilation_cache

    enable_compilation_cache()
    print("STAGE_RESULT " + json.dumps({"value": STAGES[name]()}),
          flush=True)


# ---------------------------------------------------------------------------
# orchestrator

def _run_stage(name, est, env_extra=None):
    """Run one stage in a kill-safe subprocess. Returns (value, err)."""
    rem = _remaining()
    if rem < est:
        return None, f"skipped (needs ~{est:.0f}s, {rem:.0f}s left)"
    env = dict(os.environ)
    env.update(env_extra or {})
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", name],
            timeout=min(rem, est * 3), env=env, capture_output=True,
            text=True)
    except subprocess.TimeoutExpired:
        return None, "killed (stage subprocess exceeded its timeout)"
    for ln in (r.stdout or "").splitlines():
        if ln.startswith("STAGE_RESULT "):
            return json.loads(ln[len("STAGE_RESULT "):])["value"], None
    tail = ((r.stderr or "") + (r.stdout or ""))[-300:].replace("\n", " ")
    return None, f"stage failed rc={r.returncode}: {tail}"


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        _stage_main(sys.argv[2])
        return

    if not os.path.exists(CBOX):
        print(json.dumps({"metric": "no_reference_scenes", "value": 0,
                          "unit": "Mrays/s", "vs_baseline": 0}))
        return

    matrix = []

    def add(metric, name, est, train=False):
        value, err = _run_stage(name, est)
        row = {"metric": metric, "unit": "Mrays/s"}
        if value is None and train and _remaining() > est:
            # machine-mode training programs may be uncompilable on a
            # bad tunnel day; the classic per-bounce programs are the
            # smallest family and usually still build
            value, err2 = _run_stage(name, est,
                                     {"PPG_TRAIN_MODE": "classic"})
            if value is not None:
                row["mode"] = "classic"
                err = None
            else:
                err = f"{err}; classic retry: {err2}"
        row["value"] = round(value, 3) if value is not None else None
        if err:
            row["note"] = err
        matrix.append(row)
        return row["value"]

    m_kit = add("kitchen_1Mtris_unguided", "kitchen_unguided", 240)
    add("cbox_512_unguided_maxdepth10", "cbox_unguided", 90)
    add("cbox_guided_training", "cbox_training", 180, train=True)
    add("kitchen_guided_training", "kitchen_training", 240, train=True)

    print(json.dumps({
        "metric": "kitchen_1Mtris_unguided_raythroughput",
        "value": m_kit,
        "unit": "Mrays/s",
        "vs_baseline": round(m_kit / 100.0, 4) if m_kit is not None else None,
        "budget_s": BUDGET,
        "elapsed_s": round(time.time() - T0, 1),
        "matrix": matrix,
    }), flush=True)


if __name__ == "__main__":
    main()
