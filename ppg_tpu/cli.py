"""Command-line renderer, the equivalent of the reference `mitsuba` CLI
(src/mitsuba/mitsuba.cpp:60-251): scene XML in, EXR out, with -D parameter
substitution, -o output override, -L log level, -x skip-existing, and
multiple scenes rendered in sequence. Scheduler flags (-p/-c/-s) map to
the TPU device mesh instead of worker threads/cluster nodes.

Usage:
  python -m ppg_tpu.cli scene.xml [scene2.xml ...] [-D key=value]
      [-o out.exr] [-L level] [-x] [--spp N] [--seed N] [--chunk N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="ppg", description="TPU-native practical path guiding renderer"
    )
    ap.add_argument("scenes", nargs="+", help="Mitsuba scene XML file(s)")
    ap.add_argument("-D", dest="defines", action="append", default=[],
                    metavar="key=value", help="scene parameter ($key)")
    ap.add_argument("-o", dest="output", default=None,
                    help="output EXR (default: scene name .exr)")
    ap.add_argument("-L", dest="log_level", default="info",
                    help="log level (trace/debug/info/warn/error)")
    ap.add_argument("-x", dest="skip_existing", action="store_true",
                    help="skip scenes whose output already exists")
    ap.add_argument("--spp", type=int, default=None,
                    help="override the sample budget (budgetType=spp)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=1 << 16,
                    help="wavefront lanes per launch")
    ap.add_argument("--integrator", default=None,
                    help="override integrator type (path / guided_path)")
    ap.add_argument("--dump-sdtree", action="store_true",
                    help="dump per-iteration .sdt snapshots")
    ap.add_argument("-p", dest="devices", type=int, default=1,
                    help="device-mesh size: the reference's worker-count "
                         "flag maps to data-parallel chips (shard_map + "
                         "psum over ICI). 1 = single chip")
    ap.add_argument("-j", dest="parallel_scenes", type=int, default=1,
                    help="render N scenes in parallel job threads "
                         "(mitsuba.cpp -j; scene parse/build overlaps, "
                         "device phases serialize on the single chip)")
    ap.add_argument("-r", dest="flush_timer", type=float, default=0.0,
                    help="write the partial image to the output file "
                         "every N seconds; SIGHUP forces a flush "
                         "(mitsuba.cpp:92-127)")
    ap.add_argument("--coordinator", default="localhost:12421",
                    help="jax.distributed coordinator address for "
                         "multi-process rendering (mitsuba.cpp -c remote "
                         "hosts / mtssrv analog)")
    ap.add_argument("--num-processes", type=int, default=1,
                    help="total processes in the multi-host job; every "
                         "process runs this CLI with its own --process-id "
                         "and renders a seed-disjoint slice of each pass "
                         "batch, merged with one cross-process collective "
                         "per batch (guided_path only)")
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args(argv)
    from . import enable_compilation_cache

    enable_compilation_cache()

    from .utils.logging import log, set_level

    set_level(args.log_level)

    defaults = {}
    for d in args.defines:
        if "=" not in d:
            ap.error(f"-D expects key=value, got {d!r}")
        k, v = d.split("=", 1)
        defaults[k] = v

    from .io import exr
    from .scene.scene import load_scene

    if args.parallel_scenes > 1 and len(args.scenes) > 1:
        # -j: one RenderJob thread per scene through a shared queue
        # (mitsuba.cpp -j / RenderQueue); scene parse + BVH build overlap
        # across threads, device phases serialize on the chip lock
        from .render.queue import RenderJob, RenderQueue

        queue = RenderQueue()
        pending = list(args.scenes)
        running = []
        while pending or running:
            while pending and len(running) < args.parallel_scenes:
                sp = pending.pop(0)
                dest = (args.output if len(args.scenes) == 1 else
                        os.path.splitext(sp)[0] + ".exr")
                if args.skip_existing and os.path.exists(dest):
                    log(f"skipping {sp} (output exists)")
                    continue
                job = RenderJob(sp, queue, seed=args.seed, spp=args.spp,
                                integrator=args.integrator, dest=dest,
                                defaults=defaults, chunk=args.chunk)
                job.start()
                running.append(job)
            if running:
                queue.wait_left(len(running) - 1)
                running = [j for j in running if j.is_alive()]
        queue.join()
        return

    for scene_path in args.scenes:
        out = args.output
        if args.skip_existing and out and os.path.exists(out):
            log(f"skipping {scene_path} (output exists)")
            continue
        log(f"loading {scene_path}")
        sc = load_scene(scene_path, defaults)
        ftype = str(sc.film.get("type", "hdrfilm"))
        default_ext = {"ldrfilm": ".png", "mfilm": ".m"}.get(ftype, ".exr")
        out = out or os.path.splitext(scene_path)[0] + default_ext
        if args.skip_existing and os.path.exists(out):
            log(f"skipping {scene_path} (output exists)")
            continue
        itype = args.integrator or sc.integrator.get("type", "path")
        log(f"rendering with integrator={itype} "
            f"{sc.film['width']}x{sc.film['height']}")

        if itype in ("guided_path",):
            from .integrators.guided import GuidedPathTracer

            overrides = {}
            if args.dump_sdtree:
                overrides["dumpSDTree"] = True
            mesh = None
            if args.devices > 1:
                from .parallel.mesh import make_mesh

                mesh = make_mesh(args.devices)
            dist = {}
            if args.num_processes > 1:
                # production multi-host: join the global runtime, render
                # this process's seed-disjoint slice of every pass batch,
                # merge with one collective per batch (multihost module)
                from .parallel.multihost import global_merge, \
                    init_distributed

                init_distributed(args.coordinator, args.num_processes,
                                 args.process_id)
                dist = dict(
                    slices=args.num_processes, slice_id=args.process_id,
                    reduce_sum=lambda arrs: global_merge(*arrs))
                overrides.setdefault("faultRetries", 0)
            gpt = GuidedPathTracer(sc, chunk=args.chunk,
                                   overrides=overrides, mesh=mesh, **dist)
            gpt.dump_path = os.path.splitext(out)[0]
            if args.num_processes <= 1 or args.process_id == 0:
                gpt.flush_cb = _make_flush_cb(out, sc.film,
                                              args.flush_timer)
            _warn_unqueried(sc, scene_path)
            img = gpt.render(seed=args.seed, spp_budget=args.spp)
            if args.num_processes > 1 and args.process_id != 0:
                continue  # only the coordinator rank writes the film
        elif itype in ("path", "volpath", "volpath_simple", "direct"):
            from .integrators.driver import make_config, render

            spp = args.spp or int(sc.sampler.get("sampleCount", 16))
            md = 2 if itype == "direct" else None
            cfg = make_config(sc, guiding=False,
                              **({"max_depth": md} if md else {}))
            _warn_unqueried(sc, scene_path)
            if args.devices > 1:
                img = _render_sharded(sc, cfg, spp, args)
            else:
                from .integrators.driver import regen_eligible, render_regen

                if regen_eligible(sc, cfg):
                    img = render_regen(sc, spp=spp, seed=args.seed,
                                       chunk=args.chunk, cfg=cfg)
                else:
                    img = render(sc, spp=spp, seed=args.seed,
                                 chunk=args.chunk, cfg=cfg)
        else:
            raise SystemExit(f"unsupported integrator {itype!r}")

        _write_film(out, np.asarray(img, np.float32), sc.film)
        log(f"wrote {out}")


def _warn_unqueried(sc, scene_path):
    """Unqueried-property warnings (properties.h:46 analog), emitted
    once the integrator/sensor/film params have been consumed."""
    if sc.xml_root is not None:
        from .scene.validate import warn_unused

        warn_unused(sc.xml_root, scene_path)


def _make_flush_cb(out, film, flush_timer):
    """Partial-image flush policy (mitsuba.cpp:92-127): SIGHUP forces a
    write of the in-progress image to the destination; with -r N the
    image is additionally written every N seconds. Returns a callback
    for GuidedPathTracer.flush_cb (called after every pass batch)."""
    import signal
    import time

    from .utils.logging import log

    state = {"hup": False, "last": time.time()}

    if hasattr(signal, "SIGHUP"):
        def _on_hup(signum, frame):
            state["hup"] = True

        try:
            signal.signal(signal.SIGHUP, _on_hup)
        except ValueError:
            pass  # not the main thread

    def cb(img):
        due = flush_timer > 0 and time.time() - state["last"] >= flush_timer
        if state["hup"] or due:
            _write_film(out, np.asarray(img, np.float32), film)
            log(f"flushed partial image to {out}")
            state["hup"] = False
            state["last"] = time.time()

    return cb


def _write_film(out, img, film):
    """Develop to the film plugin's output format: hdrfilm/tiledhdrfilm
    -> EXR (hdrfilm.cpp:536), ldrfilm -> gamma-corrected 8-bit PNG
    (ldrfilm.cpp), mfilm -> matlab/numpy-readable text (mfilm.cpp)."""
    from .io import exr

    ftype = str(film.get("type", "hdrfilm"))
    if ftype == "ldrfilm":
        gamma = float(film.get("gamma", -1))
        if gamma <= 0:  # sRGB
            srgb = np.where(img <= 0.0031308, img * 12.92,
                            1.055 * np.maximum(img, 1e-9) ** (1 / 2.4)
                            - 0.055)
        else:
            srgb = np.maximum(img, 0.0) ** (1.0 / gamma)
        out8 = (np.clip(srgb, 0, 1) * 255 + 0.5).astype(np.uint8)
        from PIL import Image

        Image.fromarray(out8).save(out)
    elif ftype == "mfilm":
        digits = int(film.get("digits", 4))
        with open(out, "w") as f:
            for c in range(img.shape[-1]):
                if c:
                    f.write(",\n")
                rows = [",".join(f"{v:.{digits}g}" for v in row)
                        for row in img[..., c]]
                f.write("[" + ";\n".join(rows) + "]")
    else:
        exr.write(out, img)


def _render_sharded(sc, cfg, spp, args):
    """Data-parallel render over a device mesh (BlockedRenderProcess
    analog: pixel blocks sharded across chips, film psum over ICI)."""
    import jax
    import jax.numpy as jnp

    from .guiding.host import HostSDTree
    from .integrators.wavefront import DeviceScene
    from .parallel.mesh import make_mesh, sharded_render_pass
    from .render.film import Film
    from .render.sensor import make_sensor

    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    W, H = sc.film["width"], sc.film["height"]
    film = Film(W, H, sc.film.get("rfilter", "box"))
    mesh = make_mesh(args.devices)
    sdt = HostSDTree(sc.aabb_min, sc.aabb_max).push()
    chunk = (W * H + args.devices - 1) // args.devices
    rgb_acc = wsum_acc = None
    for s in range(spp):
        key = jax.random.fold_in(jax.random.key(args.seed), s)
        rgb, wsum, _ = sharded_render_pass(
            mesh, dev, cfg, sensor, film, sdt, key, chunk)
        rgb_acc = rgb if rgb_acc is None else rgb_acc + rgb
        wsum_acc = wsum if wsum_acc is None else wsum_acc + wsum
    import numpy as np

    return np.asarray(rgb_acc / jnp.maximum(wsum_acc, 1e-20)[..., None])


if __name__ == "__main__":
    main()
