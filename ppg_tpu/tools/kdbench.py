"""Ray-accel benchmark + exhaustive verification utility.

The reference ships `kdbench` (mitsuba/src/utils/kdbench.cpp), a
mtsutil plugin that builds the kd-tree for a scene, fires camera +
incoherent ray batches to report Mrays/s, and optionally verifies the
accelerator against exhaustive (brute-force) intersection. This is the
BVH16 equivalent: it loads any scene XML, reports build statistics,
benches coherent (camera) and incoherent (sphere-sampled) wavefronts
through `bvh_closest`, and cross-checks a sample of rays against the
brute-force referee (`brute_force_closest`) — 0 mismatches expected.

Usage:
    python -m ppg_tpu.tools.kdbench scene.xml [--lanes 65536]
        [--verify 4096] [--reps 3]

Emits one JSON line with build/traversal/verification results.
"""

from __future__ import annotations

import argparse
import json
import time


def bench(scene_path, lanes=1 << 16, verify=4096, reps=3, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..accel.traverse import brute_force_closest, bvh_closest
    from ..integrators.wavefront import DeviceScene
    from ..render.sensor import make_sensor
    from ..scene.scene import load_scene

    t0 = time.time()
    sc = load_scene(scene_path)
    t_load = time.time() - t0
    t0 = time.time()
    dev = DeviceScene.from_scene(sc)
    t_build = time.time() - t0
    geom = dev.geom
    out = dict(
        scene=scene_path,
        tris=int(geom.num_tris),
        rows=int(geom.rows.shape[0]),
        row_floats=int(geom.rows.shape[1]),
        wide=geom.wide,
        stack_depth=geom.stack_depth,
        load_s=round(t_load, 2),
        build_s=round(t_build, 2),
        lanes=lanes,
    )

    key = jax.random.key(seed)
    sensor = make_sensor(sc.sensor, sc.film)
    W, H = sc.film["width"], sc.film["height"]
    pos = jax.random.uniform(key, (lanes, 2)) * jnp.asarray(
        [W, H], jnp.float32)
    o_c, d_c, tmin_c, tmax_c = sensor.sample_rays(pos)

    # incoherent batch: origins jittered inside the scene AABB, uniform
    # sphere directions (kdbench's random-ray mode)
    lo = jnp.asarray(sc.aabb_min, jnp.float32)
    hi = jnp.asarray(sc.aabb_max, jnp.float32)
    k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
    o_i = lo + jax.random.uniform(k1, (lanes, 3)) * (hi - lo)
    g = jax.random.normal(k2, (lanes, 3))
    d_i = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    tmin_i = jnp.full(lanes, 1e-4)
    tmax_i = jnp.full(lanes, 3.4e38)

    shoot = jax.jit(lambda gm, o, d, a, b: bvh_closest(gm, o, d, a, b))
    for tag, (o, d, a, b) in (("camera", (o_c, d_c, tmin_c, tmax_c)),
                              ("incoherent", (o_i, d_i, tmin_i, tmax_i))):
        r = shoot(geom, o, d, a, b)
        jax.block_until_ready(r[1])  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            r = shoot(geom, o, d, a, b)
        jax.block_until_ready(r[1])
        dt = (time.time() - t0) / reps
        out[f"{tag}_ms"] = round(dt * 1e3, 2)
        out[f"{tag}_mrays_s"] = round(lanes / dt / 1e6, 3)
        out[f"{tag}_hit_rate"] = round(
            float(jnp.mean((r[0] >= 0).astype(jnp.float32))), 4)

    if verify:
        n = min(verify, lanes)
        sl = lambda x: x[:n]
        bi, bt, _, _ = shoot(geom, sl(o_i), sl(d_i), sl(tmin_i),
                             sl(tmax_i))
        ri, rt, _, _ = brute_force_closest(
            geom, sl(o_i), sl(d_i), sl(tmin_i), sl(tmax_i))
        bi, bt = np.asarray(bi), np.asarray(bt)
        ri, rt = np.asarray(ri), np.asarray(rt)
        # equal-t duplicates can legitimately pick different triangles;
        # compare hit distance (the kdbench criterion)
        mismatch = int(np.sum(~np.isclose(
            np.where(bi >= 0, bt, -1.0), np.where(ri >= 0, rt, -1.0),
            rtol=1e-4, atol=1e-5)))
        out["verified_rays"] = n
        out["mismatches"] = mismatch
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("scene")
    ap.add_argument("--lanes", type=int, default=1 << 16)
    ap.add_argument("--verify", type=int, default=4096,
                    help="brute-force cross-check this many incoherent "
                         "rays (0 = skip)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)
    out = bench(args.scene, args.lanes, args.verify, args.reps)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
