"""RenderJob / RenderQueue: the job-thread + listener API.

The reference runs each scene in a `RenderJob` thread
(mitsuba/src/librender/renderjob.cpp:25,87-119: preprocess -> render ->
postprocess, exceptions caught and reported as failure) registered with
a `RenderQueue` (renderqueue.cpp) that tracks in-flight jobs, notifies
listeners (the Qt GUI and the Python bindings' queue callbacks,
libpython/render.cpp:226-295: jobStarted / workBegin / workEnd /
refresh / jobFinished) and supports `waitLeft` / `join` / `flush`
(partial-image writeout, also driven by mitsuba.cpp's SIGHUP/-r timer).

TPU-native shape: jobs are host threads; the device work inside each job
is the usual jitted dispatch pipeline. A queue-wide lock serializes
device phases by default — one chip serves one render at a time, and
interleaving two compiled pipelines on the same chip only adds context
thrash — but `serialize_device=False` restores the reference's fully
concurrent jobs (useful for CPU or multi-process deployments).

Events delivered to listeners (duck-typed; missing methods are skipped):
    job_started(job)
    job_refresh(job, image)    # partial image after every pass batch
    job_finished(job, image, success)
"""

from __future__ import annotations

import threading
import time
import traceback

import numpy as np

from ..utils.logging import log


class RenderListener:
    """Optional base class documenting the listener interface
    (RenderListener in renderqueue.h; Python-side queue callbacks in
    libpython/render.cpp:226-255)."""

    def job_started(self, job):
        pass

    def job_refresh(self, job, image):
        pass

    def job_finished(self, job, image, success):
        pass


class RenderQueue:
    """Tracks render jobs and notifies listeners (renderqueue.cpp)."""

    def __init__(self, serialize_device=True):
        self._jobs = set()
        self._listeners = []
        self._cv = threading.Condition()
        self._device_lock = threading.Lock() if serialize_device else None

    # -- listener management (registerListener/unregisterListener) ------
    def register_listener(self, listener):
        with self._cv:
            self._listeners.append(listener)

    def unregister_listener(self, listener):
        with self._cv:
            self._listeners.remove(listener)

    def _notify(self, name, *args):
        for li in list(self._listeners):
            fn = getattr(li, name, None)
            if fn is None:
                continue
            try:
                fn(*args)
            except Exception:  # listener bugs must not kill the job
                log("render listener raised:\n" + traceback.format_exc(),
                    level="warn")

    # -- job bookkeeping -------------------------------------------------
    def add_job(self, job):
        with self._cv:
            self._jobs.add(job)
        self._notify("job_started", job)

    def remove_job(self, job, image, success):
        with self._cv:
            self._jobs.discard(job)
            self._cv.notify_all()
        self._notify("job_finished", job, image, success)

    def wait_left(self, count):
        """Block until at most `count` jobs remain (RenderQueue::waitLeft)."""
        with self._cv:
            self._cv.wait_for(lambda: len(self._jobs) <= count)

    def join(self):
        self.wait_left(0)

    def flush(self):
        """Write every in-flight job's current partial image to its
        destination (RenderQueue::flush, driven by SIGHUP / -r)."""
        for job in list(self._jobs):
            job.flush()


class RenderJob(threading.Thread):
    """One scene render in a host thread (renderjob.cpp:87-119).

    scene: a SceneData (or a path, loaded on the job thread so parsing
    parallelizes across jobs). The integrator is chosen from the scene's
    XML unless `integrator` overrides it. Partial images flow to
    listeners via job_refresh after every guided pass batch."""

    _seq = 0

    def __init__(self, scene, queue=None, seed=0, spp=None,
                 integrator=None, dest=None, defaults=None, chunk=1 << 16):
        RenderJob._seq += 1
        super().__init__(name=f"ren{RenderJob._seq}", daemon=True)
        self.scene = scene
        self.queue = queue if queue is not None else RenderQueue()
        self.seed = seed
        self.spp = spp
        self.integrator = integrator
        self.dest = dest
        self.defaults = defaults
        self.chunk = chunk
        self.image = None  # latest partial or final image (numpy)
        self.success = None
        self.error = None
        self._t0 = None
        # register at construction (renderjob.cpp ctor), not at thread
        # start, so queue.wait_left never races a just-started job
        self.queue.add_job(self)

    # -- partial-image flush (Film::develop + write analog) --------------
    def flush(self):
        img = self.image
        if img is None or self.dest is None:
            return
        from ..io import exr

        exr.write(self.dest, np.asarray(img, np.float32))
        log(f"{self.name}: flushed partial image to {self.dest}")

    def _refresh(self, image):
        self.image = np.asarray(image)
        self.queue._notify("job_refresh", self, self.image)

    def run(self):
        self._t0 = time.time()
        img = None
        try:
            sc = self.scene
            if isinstance(sc, str):
                from ..scene.scene import load_scene

                sc = load_scene(sc, self.defaults)
            itype = self.integrator or sc.integrator.get("type", "path")
            lock = self.queue._device_lock
            ctx = lock if lock is not None else _NullCtx()
            with ctx:
                if itype == "guided_path":
                    from ..integrators.guided import GuidedPathTracer

                    tracer = GuidedPathTracer(sc, chunk=self.chunk)
                    tracer.flush_cb = self._refresh
                    img = np.asarray(
                        tracer.render(seed=self.seed, spp_budget=self.spp))
                else:
                    from ..integrators.driver import (make_config,
                                                      regen_eligible, render,
                                                      render_regen)

                    md = 2 if itype == "direct" else None
                    cfg = make_config(sc, guiding=False,
                                      **({"max_depth": md} if md else {}))
                    spp = self.spp or int(sc.sampler.get("sampleCount", 16))
                    if regen_eligible(sc, cfg):
                        img = np.asarray(render_regen(
                            sc, spp=spp, seed=self.seed, chunk=self.chunk,
                            cfg=cfg))
                    else:
                        img = np.asarray(render(
                            sc, spp=spp, seed=self.seed, chunk=self.chunk,
                            cfg=cfg))
            self.image = img
            if self.dest is not None:
                from ..io import exr

                exr.write(self.dest, np.asarray(img, np.float32))
            self.success = True
        except Exception as e:  # renderjob.cpp:112-116 catches everything
            self.success = False
            self.error = e
            log(f"{self.name}: render failed: "
                + "".join(traceback.format_exception(e)).strip(),
                level="error")
        finally:
            elapsed = time.time() - self._t0
            log(f"{self.name}: {'done' if self.success else 'FAILED'} "
                f"in {elapsed:.1f}s")
            self.queue.remove_job(self, self.image, bool(self.success))


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
