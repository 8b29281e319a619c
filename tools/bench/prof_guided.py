"""Component-level cost profile of GUIDED sampling on TPU (round 4).

The bench matrix shows guided record-free final passes on cbox at
~2.9 Mrays/s vs 114 unguided — a ~40x tax where the op-count estimate
(lookup + sample_dir + pdf_dir ~= 30 small gathers ~= 3 ms/iter at 64k
lanes) predicts ~6x. This measures each component in isolation over a
REAL trained tree so the gap can be attributed and attacked.

Usage: python tools/bench/prof_guided.py [scene.xml]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def timed(fn, *args, reps=20, warm=2):
    f = jax.jit(fn)
    for _ in range(warm):
        out = f(*args)
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    return (time.time() - t0) / reps * 1e3  # ms


def main():
    from ppg_tpu import enable_compilation_cache

    enable_compilation_cache()
    from ppg_tpu.guiding import sdtree as G
    from ppg_tpu.guiding.host import HostSDTree
    from ppg_tpu.integrators.driver import make_config
    from ppg_tpu.integrators.regen import iterations_for, trace_regen
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.render.sensor import make_sensor
    from ppg_tpu.scene.scene import load_scene

    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/scenes/cbox/cbox.xml"
    sc = load_scene(path)
    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    host = HostSDTree(sc.aabb_min, sc.aabb_max)
    L = 1 << 16
    n_pix = sc.film["width"] * sc.film["height"]

    # train one iteration to get a realistic refined tree
    cfg_t = make_config(sc, guiding=True, record_vertices=True,
                        is_built=False)
    K = iterations_for(8, cfg_t.max_depth, cfg_t.rr_depth)

    @jax.jit
    def train(key, sdt):
        out, _ = trace_regen(dev, cfg_t, key, sensor, 0, L,
                             np.int32(8), int(K), sdtree=sdt)
        from ppg_tpu.guiding import records as R

        recs = R.vertex_records(out["vertices"]["bsdf"], 1.0)
        return G.splat_records(sdt, recs)

    sdt = train(jax.random.key(0), host.push())
    host.pull(sdt)
    host.refine(0)
    host.rebuild()
    sdt = host.push()
    print(f"tree: s_depth={sdt.s_depth} q_depth={sdt.q_depth} "
          f"trees={sdt.opt_var.shape[0]}")

    key = jax.random.key(1)
    p = jax.random.uniform(key, (L, 3)) * (
        jnp.asarray(sc.aabb_max) - jnp.asarray(sc.aabb_min)
    ) + jnp.asarray(sc.aabb_min)
    d = jax.random.normal(key, (L, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    u = jax.random.uniform(key, (L, G.MAX_Q_DEPTH + 2))

    t_lookup = timed(lambda s, pp: G.lookup(s, pp)[0], sdt, p)
    ids, _ = jax.jit(G.lookup)(sdt, p)
    t_frac = timed(G.sampling_fraction, sdt, ids)
    t_sample = timed(G.sample_dir, sdt, ids, u)
    t_pdf = timed(G.pdf_dir, sdt, ids, d)
    print(f"lookup   {t_lookup:7.3f} ms")
    print(f"fraction {t_frac:7.3f} ms")
    print(f"sample   {t_sample:7.3f} ms")
    print(f"pdf      {t_pdf:7.3f} ms")

    # full record-free bodies: guided vs unguided, one 64-iteration block
    for name, guiding, built in (("unguided", False, False),
                                 ("guided", True, True)):
        cfg = make_config(sc, guiding=guiding, record_vertices=False,
                          is_built=built)
        n_blocks = 4
        n_slots = int(np.ceil(n_pix * n_blocks / L)) + 4

        def run(key, s):
            out, carry = trace_regen(
                dev, cfg, key, sensor, 0, L, np.int32(32),
                np.int32(4000), sdtree=s if guiding else None,
                it_base=np.int32(0), qstart=np.int32(0),
                qend=np.int32(n_pix * n_blocks), n_film=n_pix + 1,
                n_blocks=n_blocks, n_slots=n_slots)
            return out["n_rays"], carry["film"]

        f = jax.jit(run)
        nr, film = f(jax.random.key(2), sdt)
        jax.block_until_ready(film)
        t0 = time.time()
        nr, film = f(jax.random.key(3), sdt)
        jax.block_until_ready(film)
        dt = time.time() - t0
        print(f"{name:9s} full 32spp dispatch: {dt:6.2f} s "
              f"{int(nr)/dt/1e6:8.2f} Mrays/s")


if __name__ == "__main__":
    main()
