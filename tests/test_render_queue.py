"""RenderJob / RenderQueue job-thread + listener API
(librender/renderjob.cpp:25,87-119, renderqueue.cpp, libpython
queue-callback semantics render.cpp:226-295)."""

import os

import numpy as np

from ppg_tpu.render.queue import RenderJob, RenderListener, RenderQueue
from ppg_tpu.scene.testscenes import mini_cbox


class Recorder(RenderListener):
    def __init__(self):
        self.events = []

    def job_started(self, job):
        self.events.append(("started", job.name))

    def job_refresh(self, job, image):
        self.events.append(("refresh", job.name))

    def job_finished(self, job, image, success):
        self.events.append(("finished", job.name, success))


def test_job_renders_and_notifies(tmp_path):
    sc = mini_cbox(res=16, max_depth=4)
    q = RenderQueue()
    rec = Recorder()
    q.register_listener(rec)
    dest = os.path.join(tmp_path, "out.exr")
    job = RenderJob(sc, q, seed=0, spp=2, integrator="path", dest=dest)
    job.start()
    q.join()
    assert job.success is True
    assert job.image is not None and np.isfinite(job.image).all()
    assert os.path.exists(dest)
    kinds = [e[0] for e in rec.events]
    assert kinds[0] == "started" and kinds[-1] == "finished"
    assert rec.events[-1][2] is True


def test_two_jobs_serialize_on_device_lock():
    sc1 = mini_cbox(res=16, max_depth=3)
    sc2 = mini_cbox(res=16, max_depth=3)
    q = RenderQueue()
    j1 = RenderJob(sc1, q, seed=0, spp=2, integrator="path")
    j2 = RenderJob(sc2, q, seed=1, spp=2, integrator="path")
    j1.start()
    j2.start()
    q.join()
    assert j1.success and j2.success
    assert j1.image.shape == j2.image.shape


def test_failed_job_reports_failure():
    q = RenderQueue()
    rec = Recorder()
    q.register_listener(rec)
    job = RenderJob("/nonexistent/scene.xml", q)
    job.start()
    q.join()
    assert job.success is False
    assert job.error is not None
    assert rec.events[-1][0] == "finished" and rec.events[-1][2] is False


def test_guided_job_emits_refresh_events():
    sc = mini_cbox(res=16, max_depth=4)
    sc.integrator = dict(sc.integrator, type="guided_path",
                         budgetType="spp", budget=8, sppPerPass=4)
    q = RenderQueue()
    rec = Recorder()
    q.register_listener(rec)
    job = RenderJob(sc, q, spp=8)
    job.start()
    q.join()
    assert job.success is True, job.error
    kinds = [e[0] for e in rec.events]
    assert "refresh" in kinds  # partial image after each pass batch


def test_wait_left_bounds_inflight():
    q = RenderQueue()
    jobs = [RenderJob(mini_cbox(res=8, max_depth=2), q, seed=i, spp=1,
                      integrator="path") for i in range(3)]
    for j in jobs:
        j.start()
    q.wait_left(1)
    # at most one job can still be registered now
    assert len(q._jobs) <= 1
    q.join()
    assert all(j.success for j in jobs)
