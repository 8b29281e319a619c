"""Two-PROCESS execution over jax.distributed (the mtssrv /
sched_remote.h analog, VERDICT r3 item 6): spawn two workers, each with
its own 4-device virtual CPU runtime, render one seed-parallel slice
per process, merge films + SD-tree deltas across the process boundary
with an XLA collective, and assert the result equals the single-process
8-device mesh run."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_merge_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "merged.npz"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_NUM_PROCESSES", None)
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-m", "ppg_tpu.parallel.multihost",
               "--coordinator", f"localhost:{port}",
               "--num-processes", "2", "--process-id", str(pid),
               "--platform", "cpu",
               "--out", str(out) if pid == 0 else ""]
        procs.append(subprocess.Popen(
            cmd, cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    for p in procs:
        o, _ = p.communicate(timeout=420)
        assert p.returncode == 0, o.decode()[-3000:]
    got = np.load(out)

    # single-process reference: the same pass on a 2x4 mesh of the
    # current (8-device) runtime, merged with merge_slices
    import jax

    from ppg_tpu.guiding.host import HostSDTree
    from ppg_tpu.integrators.driver import make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.parallel.mesh import make_mesh2, seed_parallel_pass
    from ppg_tpu.render.film import Film
    from ppg_tpu.render.sensor import make_sensor
    from ppg_tpu.scene.testscenes import mini_cbox

    sc = mini_cbox(res=32, max_depth=4)
    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    film = Film(32, 32, "box")
    cfg = make_config(sc, guiding=True, record_vertices=True,
                      is_built=False)
    tree = HostSDTree(sc.aabb_min, sc.aabb_max).push()
    rgb_s, w_s, d_qb, d_sw = seed_parallel_pass(
        make_mesh2(2, 4), dev, cfg, sensor, film, tree,
        jax.random.key(5), (32 * 32 + 3) // 4)

    np.testing.assert_allclose(got["rgb"], np.asarray(rgb_s).sum(0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["wsum"], np.asarray(w_s).sum(0),
                               rtol=1e-6)
    np.testing.assert_allclose(got["d_qb"], np.asarray(d_qb).sum(0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["d_sw"], np.asarray(d_sw).sum(0),
                               rtol=1e-5, atol=1e-6)
