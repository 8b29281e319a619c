"""SD-tree snapshot roundtrip + visualizer smoke test: dump a trained
tree to the bit-compatible .sdt format (guided_path.cpp BlobWriter
layout), read it back, and rasterize a quadtree like the reference
visualizer does."""

import os
import tempfile

import numpy as np


def test_sdt_roundtrip_and_viewer():
    import jax

    from ppg_tpu.guiding import records as R
    from ppg_tpu.guiding import sdtree as G
    from ppg_tpu.guiding.host import HostSDTree
    from ppg_tpu.integrators.driver import make_config
    from ppg_tpu.integrators.wavefront import DeviceScene, trace_paths
    from ppg_tpu.io.sdt import dump_sdtree, read_sdt
    from ppg_tpu.render.sensor import PerspectiveSensor
    from ppg_tpu.scene.testscenes import mini_cbox

    sc = mini_cbox(res=32, max_depth=5)
    dev = DeviceScene.from_scene(sc)
    sensor = PerspectiveSensor(sc.sensor, sc.film)
    host = HostSDTree(sc.aabb_min, sc.aabb_max)
    sdt = host.push()
    cfg = make_config(sc, guiding=True, record_vertices=True, is_built=False)

    import jax.numpy as jnp

    L = 1024
    ids = jnp.arange(L) % (32 * 32)
    pos = jnp.stack([(ids % 32).astype(jnp.float32),
                     (ids // 32).astype(jnp.float32)], -1) + 0.5
    o, d, tmin, tmax = sensor.sample_rays(pos)
    out = trace_paths(dev, cfg, jax.random.key(0), o, d, tmin, tmax,
                      sdtree=sdt)
    recs = R.vertex_records(out["vertices"]["bsdf"], 1.0)
    sdt = G.splat_records(sdt, recs)
    host.pull(sdt)
    host.build()

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.sdt")
        cam = np.eye(4, dtype=np.float32)
        dump_sdtree(path, host, cam)
        cam2, trees = read_sdt(path)
        assert np.allclose(cam2, cam)
        assert len(trees) >= 1
        t0 = trees[0]
        assert t0["stat_weight"] > 0
        assert len(t0["sums"]) >= 1

        # visualizer rasterization + png output
        from ppg_tpu.tools import sdt_viewer

        n = len(t0["sums"])
        img = sdt_viewer.rasterize_dtree(
            t0["sums"].reshape(n, 4), t0["children"].reshape(n, 4), res=64)
        assert img.shape == (64, 64) and np.isfinite(img).all()
        outpng = os.path.join(td, "t.png")
        sdt_viewer.main([path, "-o", outpng, "--select-index", "0"])
        assert os.path.exists(outpng) and os.path.getsize(outpng) > 1000

        # interactive viewer driven headless: pick via display coords,
        # exposure keys, iteration switching, pixel probe
        import matplotlib

        matplotlib.use("Agg")
        path2 = os.path.join(td, "t2.sdt")
        dump_sdtree(path2, host, cam)
        v = sdt_viewer.InteractiveViewer([path, path2], res=32)
        v.fig.canvas.draw()  # realize the 3D projection for picking
        # pick the display location of a known leaf center -> selects it
        from mpl_toolkits.mplot3d import proj3d

        k = len(v.centers) // 2
        xs, ys, _ = proj3d.proj_transform(
            v.centers[k:k + 1, 0], v.centers[k:k + 1, 1],
            v.centers[k:k + 1, 2], v.ax3d.get_proj())
        px, py = v.ax3d.transData.transform(
            np.column_stack([xs, ys]))[0]
        assert v.pick_display(px, py) == k
        assert v.set_exposure(0.5) == 0.5
        assert v.switch_file(1) == 1 and v.switch_file(1) == 0
        val, pct = v.probe(0, 0)
        assert np.isfinite(val) and 0.0 <= pct <= 100.0
        assert v.probe(-1, 0) is None
