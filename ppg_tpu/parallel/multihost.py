"""Multi-HOST execution: the honest analog of the reference's remote
scheduler (sched_remote.h:50-238) and render server (mtssrv.cpp:289-408).

The reference ships work units over TCP/SSH streams to mtssrv processes
and merges results on the coordinator. The TPU-native replacement keeps
the same topology — independent seed-parallel slices per host, one
iteration-boundary merge across hosts — but rides jax.distributed +
XLA collectives instead of a hand-rolled RPC layer:

  * every host initializes jax.distributed against a shared coordinator
    (init_distributed), contributing its local devices to one global
    runtime;
  * each host renders its OWN slice with the single-process pipeline
    (parallel.mesh.seed_parallel_pass over its LOCAL devices — in-slice
    traffic never leaves the host, the ICI axis);
  * the slice films and SD-tree deltas are summed across hosts with ONE
    jit-ed reduction over a global process-axis mesh (global_merge) —
    the only traffic that crosses the host boundary (the DCN axis),
    exactly where the reference pays its TCP round trip.

`python -m ppg_tpu.parallel.multihost --process-id I --num-processes N`
runs one worker (used by tests/test_multihost.py, which spawns two
processes on a virtual 4-device CPU runtime each and asserts the merged
film/tree equals the single-process 8-device result).
"""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator, num_processes, process_id):
    """Join the global runtime. Idempotent per process."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_mesh2(tiles_per_slice, axes=("slice", "tiles")):
    """A 1 x tiles mesh over THIS process's devices: the in-host slice
    (parallel.mesh.make_mesh2 uses jax.devices(), which is global under
    jax.distributed)."""
    import jax
    from jax.sharding import Mesh

    devs = jax.local_devices()
    if len(devs) < tiles_per_slice:
        raise RuntimeError(
            f"need {tiles_per_slice} local devices, have {len(devs)}")
    return Mesh(np.array(devs[:tiles_per_slice]).reshape(1, -1), axes)


def global_merge(*arrays):
    """Sum each (process-local, identical-shape) array across all
    processes: builds one global array sharded over a process axis and
    reduces it with a jit-ed sum — XLA lowers the reduction to the
    cross-host collective (gloo on CPU, DCN on real TPU slices).

    Returns numpy arrays (fully replicated result)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_proc = jax.process_count()
    devs = np.array(jax.devices())
    n_local = len(jax.local_devices())
    mesh = Mesh(devs.reshape(n_proc, n_local), ("proc", "local"))
    outs = []
    for a in arrays:
        a = np.asarray(a)
        sh = NamedSharding(mesh, P("proc"))
        gshape = (n_proc,) + a.shape
        # every addressable device holds this process's row
        locals_ = [jax.device_put(a[None], d) for d in jax.local_devices()]
        garr = jax.make_array_from_single_device_arrays(
            gshape, sh, locals_)
        red = jax.jit(lambda x: jnp.sum(x, axis=0),
                      out_shardings=NamedSharding(mesh, P()))(garr)
        outs.append(np.asarray(red))
    return outs


def render_scene_distributed(scene_path, num_processes, process_id,
                             seed=0, spp=None, overrides=None):
    """PRODUCTION multi-host rendering of a real scene XML: every
    process runs the full GuidedPathTracer iteration schedule on its
    own devices, rendering its seed-disjoint slice of each pass batch;
    film sums + SD-tree deltas are merged across processes with one
    global_merge per batch (GuidedPathTracer._render_sliced), so each
    process holds the identical merged film/tree and builds the same
    SD-tree — the sched_remote.h work-unit round trip collapsed onto
    jax.distributed. Call AFTER init_distributed. Returns the final
    image (identical on every process)."""
    from ..integrators.guided import GuidedPathTracer
    from ..scene.scene import load_scene

    sc = load_scene(scene_path)
    ov = dict(overrides or {})
    # a one-sided device-fault retry would desynchronize the per-batch
    # collective — fail fast instead (see GuidedPathTracer.__init__)
    ov.setdefault("faultRetries", 0)
    tracer = GuidedPathTracer(
        sc, overrides=ov, slices=num_processes, slice_id=process_id,
        reduce_sum=lambda arrs: global_merge(*arrs))
    return tracer.render(seed=seed, spp_budget=spp)


def _worker(args):
    """One host's slice of a seed-parallel training pass + global merge.

    Mirrors tests/test_mesh_parallel.py's single-process setup so the
    two-process merged result is directly comparable."""
    import jax

    init_distributed(args.coordinator, args.num_processes,
                     args.process_id)

    if args.scene:
        img = render_scene_distributed(
            args.scene, args.num_processes, args.process_id,
            seed=args.seed, spp=args.spp or None)
        if args.process_id == 0 and args.out:
            from ..io import exr

            exr.write(args.out, np.asarray(img, np.float32))
        jax.distributed.shutdown()
        return

    from ..guiding.host import HostSDTree
    from ..integrators.driver import make_config
    from ..integrators.wavefront import DeviceScene
    from ..render.film import Film
    from ..render.sensor import make_sensor
    from ..scene.testscenes import mini_cbox
    from .mesh import seed_parallel_pass

    sc = mini_cbox(res=32, max_depth=4)
    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    film = Film(32, 32, "box")
    cfg = make_config(sc, guiding=True, record_vertices=True,
                      is_built=False)
    tree = HostSDTree(sc.aabb_min, sc.aabb_max).push()

    key = jax.random.key(5)
    chunk = (32 * 32 + 3) // 4
    mesh = local_mesh2(4)
    # slice index = process id: the per-slice RNG stream matches a
    # single-process multi-slice mesh bit for bit
    rgb, wsum, d_qb, d_sw = seed_parallel_pass(
        mesh, dev, cfg, sensor, film, tree, key, chunk,
        slice_offset=args.process_id)

    rgb, wsum, d_qb, d_sw = global_merge(
        np.asarray(rgb)[0], np.asarray(wsum)[0],
        np.asarray(d_qb)[0], np.asarray(d_sw)[0])
    if args.process_id == 0 and args.out:
        np.savez(args.out, rgb=rgb, wsum=wsum, d_qb=d_qb, d_sw=d_sw)
    jax.distributed.shutdown()


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--coordinator", default="localhost:12421")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--scene", default="",
                    help="scene XML: render it across all processes "
                         "(production mode); empty = mini_cbox demo pass")
    ap.add_argument("--spp", type=int, default=0,
                    help="spp budget override for --scene")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (tests pass 'cpu'; needed "
                         "because a sitecustomize may pre-import jax "
                         "before JAX_PLATFORMS applies)")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    _worker(args)


if __name__ == "__main__":
    main()
