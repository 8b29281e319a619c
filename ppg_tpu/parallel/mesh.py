"""Multi-chip parallel rendering: shard_map over a device mesh.

The reference distributes 32x32 pixel tiles to worker threads through a
central scheduler and funnels results back under a mutex
(librender/renderproc.cpp, libcore/sched.cpp); its cluster mode ships tiles
over TCP (sched_remote.cpp). The TPU-native equivalent has no scheduler at
all: the pixel/sample lane pool is sharded across a jax Mesh ('tiles'
axis = image-space data parallelism, SURVEY §2.2), the scene and SD-tree
arrays are replicated into each chip's HBM (the analog of scheduler
"resources"), and the per-pass SD-tree accumulation and film are combined
with a single psum over ICI — replacing the reference's lock-free atomic
scatter + result funnel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices=None, axis="tiles"):
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(
            f"requested a {n}-device mesh but only {len(devs)} devices are "
            "visible (set XLA_FLAGS=--xla_force_host_platform_device_count "
            "and JAX_PLATFORMS=cpu for virtual-device testing)"
        )
    return Mesh(np.array(devs[:n]), (axis,))


def sharded_render_pass(mesh, scene, cfg, sensor, film, sdtree, key, chunk,
                        spatial_filter="nearest", directional_filter="nearest",
                        learn_fraction=None):
    """One full-image render pass data-parallel over the mesh.

    Every device traces `chunk` camera lanes (a contiguous pixel block),
    splats its training records into a local copy of the building pool, and
    the pass ends with psum over ICI of the film and the tree-accumulation
    deltas. Returns (film_rgb, film_weight, new_sdtree) replicated.
    """
    n_dev = mesh.devices.size
    W, H = sensor.W, sensor.H

    from ..guiding import records as R
    from ..guiding import sdtree as G
    from ..integrators.wavefront import trace_paths

    def shard_fn(shard_ids, shard_key):
        # shard_ids: [chunk] pixel ids owned by this device
        ids = shard_ids[0]
        k = shard_key[0]
        px = (ids % W).astype(jnp.float32)
        py = (ids // W).astype(jnp.float32)
        jit2 = jax.random.uniform(jax.random.fold_in(k, 17), (ids.shape[0], 2))
        pos = jnp.stack([px, py], -1) + jit2
        u_lens = (jax.random.uniform(jax.random.fold_in(k, 19),
                                     (ids.shape[0], 2))
                  if getattr(sensor, "needs_lens_sample", False) else None)
        o, d, tmin, tmax = sensor.sample_rays(pos, u_lens)
        out = trace_paths(scene, cfg, k, o, d, tmin, tmax, sdtree=sdtree,
                          sensor=sensor)
        valid = ids < W * H
        li = jnp.where(valid[..., None], out["li"], 0.0)
        spos = jnp.where(valid[..., None], pos, -100.0)
        rgb, wsum = film.splat(film.zeros(), spos, li)

        # local tree accumulation, then all-reduce the delta over ICI
        if cfg.record_vertices and out["vertices"] is not None:
            stat_w = 0.5 if (cfg.do_nee and not cfg.nee_always) else 1.0
            recs = R.vertex_records(out["vertices"]["bsdf"], stat_w)
            uj = jax.random.uniform(
                jax.random.fold_in(k, 23), (recs["valid"].shape[0], 3)
            )
            new_tree = G.splat_records(
                sdtree, recs, spatial_filter, directional_filter,
                learn_fraction if cfg.is_built else None, uj,
            )
            d_qb = jax.lax.psum(new_tree.qb_sum - sdtree.qb_sum, "tiles")
            d_sw = jax.lax.psum(new_tree.db_statw - sdtree.db_statw, "tiles")
            out_fields = {f: getattr(sdtree, f) for f in G.SDTreeArrays.FIELDS}
            out_fields["qb_sum"] = sdtree.qb_sum + d_qb
            out_fields["db_statw"] = sdtree.db_statw + d_sw
            tree_out = G.SDTreeArrays(s_depth=sdtree.s_depth,
                                      q_depth=sdtree.q_depth, **out_fields)
        else:
            tree_out = sdtree

        rgb = jax.lax.psum(rgb, "tiles")
        wsum = jax.lax.psum(wsum, "tiles")
        return rgb, wsum, tree_out

    total = n_dev * chunk
    ids = jnp.arange(total, dtype=jnp.int32).reshape(n_dev, chunk)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_dev))

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("tiles"), P("tiles")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(ids, keys)


def make_mesh2(n_slices, tiles_per_slice, axes=("slice", "tiles")):
    """2D device mesh for multi-slice rendering: the 'tiles' axis is
    image-space data parallelism inside a slice (collectives ride ICI);
    the 'slice' axis holds seed-parallel replicas whose film/SD-tree
    sums are merged only at iteration boundaries (the only traffic that
    would cross DCN on a multi-slice deployment — SURVEY §2.2.5/§5:
    the reference's TCP cluster mode maps to this axis)."""
    devs = jax.devices()
    need = n_slices * tiles_per_slice
    if len(devs) < need:
        raise RuntimeError(
            f"requested {n_slices}x{tiles_per_slice} devices, have "
            f"{len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_slices, tiles_per_slice),
                axes)


def seed_parallel_pass(mesh2, scene, cfg, sensor, film, sdtree, key, chunk,
                       spatial_filter="nearest",
                       directional_filter="nearest", learn_fraction=None,
                       slice_offset=0):
    """One pass on EVERY slice concurrently: each slice renders the full
    image with an independent RNG stream, tiles sharded inside the
    slice, film + tree deltas psum'd over 'tiles' (ICI) only. Returns
    per-slice stacked (rgb [S,H,W,3], wsum [S,H,W], d_qb [S,...],
    d_sw [S,...]); apply merge_slices at the iteration boundary (the
    only reduction that would cross DCN on multi-slice hardware)."""
    n_slices, n_tiles = mesh2.devices.shape
    W, H = sensor.W, sensor.H

    from ..guiding import records as R
    from ..guiding import sdtree as G
    from ..integrators.wavefront import trace_paths

    def shard_fn(shard_ids, shard_key):
        ids = shard_ids[0, 0]
        k = shard_key[0, 0]
        px = (ids % W).astype(jnp.float32)
        py = (ids // W).astype(jnp.float32)
        jit2 = jax.random.uniform(jax.random.fold_in(k, 17),
                                  (ids.shape[0], 2))
        pos = jnp.stack([px, py], -1) + jit2
        u_lens = (jax.random.uniform(jax.random.fold_in(k, 19),
                                     (ids.shape[0], 2))
                  if getattr(sensor, "needs_lens_sample", False) else None)
        o, d, tmin, tmax = sensor.sample_rays(pos, u_lens)
        out = trace_paths(scene, cfg, k, o, d, tmin, tmax, sdtree=sdtree,
                          sensor=sensor)
        valid = ids < W * H
        li = jnp.where(valid[..., None], out["li"], 0.0)
        spos = jnp.where(valid[..., None], pos, -100.0)
        rgb, wsum = film.splat(film.zeros(), spos, li)

        if cfg.record_vertices and out["vertices"] is not None:
            stat_w = 0.5 if (cfg.do_nee and not cfg.nee_always) else 1.0
            recs = R.vertex_records(out["vertices"]["bsdf"], stat_w)
            uj = jax.random.uniform(
                jax.random.fold_in(k, 23), (recs["valid"].shape[0], 3))
            new_tree = G.splat_records(
                sdtree, recs, spatial_filter, directional_filter,
                learn_fraction if cfg.is_built else None, uj)
            d_qb = jax.lax.psum(new_tree.qb_sum - sdtree.qb_sum, "tiles")
            d_sw = jax.lax.psum(new_tree.db_statw - sdtree.db_statw,
                                "tiles")
        else:
            d_qb = jnp.zeros_like(sdtree.qb_sum)
            d_sw = jnp.zeros_like(sdtree.db_statw)

        rgb = jax.lax.psum(rgb, "tiles")[None]
        wsum = jax.lax.psum(wsum, "tiles")[None]
        return rgb, wsum, d_qb[None], d_sw[None]

    total = n_tiles * chunk
    ids = jnp.arange(total, dtype=jnp.int32).reshape(1, n_tiles, chunk)
    ids = jnp.broadcast_to(ids, (n_slices, n_tiles, chunk))
    # slice_offset lets a multi-host deployment run local 1-slice meshes
    # whose RNG streams line up with a single-process multi-slice mesh
    # (parallel.multihost: slice index = global process id)
    keys = jax.vmap(lambda s: jax.vmap(
        lambda t: jax.random.fold_in(jax.random.fold_in(key, s), t))(
            jnp.arange(n_tiles)))(jnp.arange(n_slices) + slice_offset)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh2,
        in_specs=(P("slice", "tiles"), P("slice", "tiles")),
        out_specs=(P("slice"), P("slice"), P("slice"), P("slice")),
        check_vma=False,
    )
    return fn(ids, keys)


def merge_slices(sdtree, rgb, wsum, d_qb, d_sw):
    """Iteration-boundary merge of seed-parallel slices (one reduction
    over the 'slice' axis — DCN on real multi-slice hardware): films add
    (independent equal-weight sample sets) and the per-slice SD-tree
    accumulation deltas add onto the shared base tree, exactly like the
    reference's lock-free concurrent adds commute (guided_path.cpp:
    59-62)."""
    from ..guiding import sdtree as G

    fields = {f: getattr(sdtree, f) for f in G.SDTreeArrays.FIELDS}
    fields["qb_sum"] = sdtree.qb_sum + d_qb.sum(axis=0)
    fields["db_statw"] = sdtree.db_statw + d_sw.sum(axis=0)
    tree = G.SDTreeArrays(s_depth=sdtree.s_depth, q_depth=sdtree.q_depth,
                          **fields)
    return rgb.sum(axis=0), wsum.sum(axis=0), tree
