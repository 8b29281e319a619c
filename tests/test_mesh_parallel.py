"""Multi-chip sharding on the virtual 8-device CPU mesh: in-slice tile
sharding (ICI psum) and the 2D slice x tiles seed-parallel path with
iteration-boundary merge (the DCN axis)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ppg_tpu.scene.testscenes import mini_cbox


def _setup():
    import jax

    from ppg_tpu.integrators.driver import make_config
    from ppg_tpu.integrators.wavefront import DeviceScene
    from ppg_tpu.render.film import Film
    from ppg_tpu.render.sensor import make_sensor
    from ppg_tpu.guiding.host import HostSDTree

    sc = mini_cbox(res=32, max_depth=4)
    dev = DeviceScene.from_scene(sc)
    sensor = make_sensor(sc.sensor, sc.film)
    film = Film(32, 32, "box")
    cfg = make_config(sc, guiding=True, record_vertices=True,
                      is_built=False)
    tree = HostSDTree(sc.aabb_min, sc.aabb_max).push()
    return sc, dev, sensor, film, cfg, tree


def test_seed_parallel_slices_match_single_mesh():
    import jax

    from ppg_tpu.parallel.mesh import (make_mesh, make_mesh2, merge_slices,
                                       seed_parallel_pass,
                                       sharded_render_pass)

    sc, dev, sensor, film, cfg, tree = _setup()
    key = jax.random.key(5)
    chunk = (32 * 32 + 3) // 4

    m2 = make_mesh2(2, 4)
    rgb_s, w_s, d_qb, d_sw = seed_parallel_pass(
        m2, dev, cfg, sensor, film, tree, key, chunk)
    rgb_s, w_s, d_qb, d_sw = map(np.asarray, (rgb_s, w_s, d_qb, d_sw))
    assert rgb_s.shape[0] == 2 and d_qb.shape[0] == 2
    # each slice is a full-image pass
    assert (w_s.reshape(2, -1).sum(1) > 900).all()
    # slices used different RNG streams
    assert not np.allclose(rgb_s[0], rgb_s[1])
    # training records landed in every slice's delta
    assert (np.abs(d_qb).reshape(2, -1).sum(1) > 0).all()

    rgb2d, w2d, merged = merge_slices(tree, *map(
        np.asarray, (rgb_s, w_s, d_qb, d_sw)))
    np.testing.assert_allclose(rgb2d, rgb_s.sum(0), rtol=1e-6)
    assert float(np.asarray(merged.qb_sum).sum()) > float(
        np.asarray(tree.qb_sum).sum())

    # estimator agreement with the 1D mesh path: variance-derived bound.
    # K independent 1D-mesh passes give an empirical standard error of
    # the per-pass image mean; the 2D-mesh estimate (2 slices = 2
    # passes) must sit within 5 SE of the 1D-mesh mean-of-means —
    # a test that fails for ~5% estimator bias, not only the old 50%.
    m1 = make_mesh(8)
    chunk1 = (32 * 32 + 7) // 8
    means = []
    for rep in range(4):
        rgb1, w1, _ = sharded_render_pass(
            m1, dev, cfg, sensor, film, tree,
            jax.random.fold_in(key, 90 + rep), chunk1)
        means.append(np.asarray(rgb1).sum() / np.asarray(w1).sum())
    means = np.array(means)
    s = means.std(ddof=1)  # SE of a single pass's image mean
    # weight-normalized mean of the merged 2-slice film (2 passes)
    a = np.asarray(rgb2d).sum() / np.asarray(w2d).sum()
    b = means.mean()
    # Var(a-b) = s^2 (1/2 + 1/4): a averages 2 passes, b averages 4
    bound = 5.0 * s * np.sqrt(0.5 + 0.25)
    assert abs(a - b) < max(bound, 0.02 * b), (a, b, s)
