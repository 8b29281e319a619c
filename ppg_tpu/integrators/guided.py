"""GuidedPathTracer driver: the spp-doubling training/render loop.

Replicates GuidedPathTracer::render/renderSPP/renderTime/performRenderPasses
(reference guided_path.cpp:1210-1585): per iteration the film is cleared,
the SD-tree refined+reset (host), 2^iter passes rendered (device wavefront,
vertices splatted into the building pool inside jit), per-pass variance
tracked with the 1e4 luminance clamp (:1300-1313), the merge-final and
automatic-budget-extension rules applied (:1360-1423), the tree rebuilt,
and optionally an .sdt snapshot dumped. Final images combine by "discard",
"automatic" (default), or inverse-variance over the last <=4 iterations
(:1567-1582).
"""

from __future__ import annotations

import os
import time
from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..guiding import records as R
from ..guiding import sdtree as G
from ..guiding.host import HostSDTree
from ..render.film import Film
from ..render.sensor import make_sensor
from ..utils import heartbeat
from ..utils.logging import log
from .driver import make_config
from .wavefront import DeviceScene, PTConfig, trace_paths

VAR_CLAMP = 10000.0  # firefly clamp on per-pixel variance (:1310)


def _chunk_step(scene, cfg, sensor, film, chunk, spatial_filter,
                directional_filter, learn_fraction, film_buf, sq_buf,
                sdtree, key, pix_start):
    W = sensor.W
    ids = pix_start + jnp.arange(chunk)
    px = (ids % W).astype(jnp.float32)
    py = (ids // W).astype(jnp.float32)
    jit2 = jax.random.uniform(jax.random.fold_in(key, 17), (chunk, 2))
    pos = jnp.stack([px, py], -1) + jit2
    u_lens = (jax.random.uniform(jax.random.fold_in(key, 19), (chunk, 2))
              if sensor.needs_lens_sample else None)
    o, d, tmin, tmax = sensor.sample_rays(pos, u_lens)
    out = trace_paths(scene, cfg, key, o, d, tmin, tmax, sdtree=sdtree,
                      sensor=sensor)
    li = out["li"]
    valid = ids < W * sensor.H
    if film.rfilter == "box":
        film_buf = film.splat_box_linear(film_buf, pix_start, li, valid)
        sq_buf = film.splat_box_linear(sq_buf, pix_start, li * li, valid)
    else:
        li = jnp.where(valid[..., None], li, 0.0)
        pos = jnp.where(valid[..., None], pos, -100.0)
        film_buf = film.splat(film_buf, pos, li)
        sq_buf = film.splat(sq_buf, pos, li * li)

    if cfg.record_vertices and out["vertices"] is not None:
        stat_w = 0.5 if (cfg.do_nee and not cfg.nee_always) else 1.0
        recs = R.vertex_records(out["vertices"]["bsdf"], stat_w)
        lf = learn_fraction if cfg.is_built else None
        n = recs["valid"].shape[0]
        uj = jax.random.uniform(jax.random.fold_in(key, 23), (n, 3))
        sdtree = G.splat_records(
            sdtree, recs, spatial_filter, directional_filter, lf, uj
        )
        if out["vertices"]["nee"] is not None:
            nrecs = R.nee_records(out["vertices"]["nee"])
            m = nrecs["valid"].shape[0]
            uj2 = jax.random.uniform(jax.random.fold_in(key, 29), (m, 3))
            sdtree = G.splat_records(
                sdtree, nrecs, spatial_filter, directional_filter, lf, uj2
            )
    return film_buf, sq_buf, sdtree, (out["n_rays"], out["n_vertices"])


@partial(
    jax.jit,
    static_argnames=("cfg", "sensor", "film", "chunk", "spatial_filter",
                     "directional_filter", "learn_fraction"),
    donate_argnames=("film_buf", "sq_buf", "sdtree"),
)
def _guided_pass(scene, cfg, sensor, film, chunk, film_buf, sq_buf, sdtree,
                 key, salts, pix_starts, spatial_filter, directional_filter,
                 learn_fraction):
    """One whole training pass (all spp x chunk sub-steps) in ONE
    dispatch: a lax.scan over (salt, pix_start) pairs chains the trace +
    SD-tree splat steps on-device. One program per pass sidesteps the
    TPU-tunnel dispatch pathologies (each host-side dispatch in a
    donation chain costs ~0.5-3 s wall regardless of compute)."""

    def step(carry, xs):
        film_buf, sq_buf, sdtree = carry
        salt, pix_start = xs
        k = jax.random.fold_in(key, salt)
        film_buf, sq_buf, sdtree, counts = _chunk_step(
            scene, cfg, sensor, film, chunk, spatial_filter,
            directional_filter, learn_fraction, film_buf, sq_buf, sdtree,
            k, pix_start)
        return (film_buf, sq_buf, sdtree), counts

    (film_buf, sq_buf, sdtree), counts = jax.lax.scan(
        step, (film_buf, sq_buf, sdtree), (salts, pix_starts))
    return film_buf, sq_buf, sdtree, jax.tree.map(jnp.sum, counts)


def _splat_chunk_records(sdtree, verts, k, cfg, spatial_filter,
                         directional_filter, learn_fraction):
    """Splat one chunk's stacked training records (BSDF vertices + NEE
    vertices at statWeight 0.5, guided_path.cpp:2014) into the building
    tree. Splat jitter draws come from a stream disjoint from
    trace_regen's per-iteration fold_in(k, it) RandBlock keys (it
    ranges over [0, K)): a bare fold_in(k, 23) would reuse the exact
    bits that drove path sampling at iteration 23, correlating records
    with their splat placement."""
    stat_w = 0.5 if (cfg.do_nee and not cfg.nee_always) else 1.0
    recs = R.vertex_records(verts["bsdf"], stat_w)
    lf = learn_fraction if cfg.is_built else None
    kj = jax.random.fold_in(k, 0x7FFFFFFF)
    # splat-time jitter only exists on the legacy path — the fast path
    # (rec carries sp_id) drew it at shade time inside the tracer
    need_uj = "sp_id" not in recs and spatial_filter == "stochastic"
    uj = (jax.random.uniform(jax.random.fold_in(kj, 23),
                             (recs["valid"].shape[0], 3))
          if need_uj else None)
    sdtree = G.splat_records(
        sdtree, recs, spatial_filter, directional_filter, lf, uj)
    if verts["nee"] is not None:
        nrecs = R.nee_records(verts["nee"])
        uj2 = (jax.random.uniform(jax.random.fold_in(kj, 29),
                                  (nrecs["valid"].shape[0], 3))
               if need_uj else None)
        sdtree = G.splat_records(
            sdtree, nrecs, spatial_filter, directional_filter, lf, uj2)
    return sdtree


@partial(
    jax.jit,
    static_argnames=("cfg", "sensor", "L", "K", "n_chunks",
                     "spatial_filter", "directional_filter",
                     "learn_fraction"),
    donate_argnames=("img_buf", "sq_buf", "sdtree"),
)
def _guided_regen_pass(scene, cfg, sensor, img_buf, sq_buf, sdtree, key,
                       salt0, L, spp, K, n_chunks, spatial_filter,
                       directional_filter, learn_fraction):
    """One TRAINING slab (spp samples of every pixel) in ONE dispatch:
    a scan over chunks, each chunk running the regenerative tracer's
    record path (static-K scan with segmented suffix-sum radiance) and
    splatting its stacked vertex/NEE records into the building tree.
    Replaces spp x chunks separate classic dispatches whose donation
    chains stall multi-second each on the TPU tunnel."""
    from .regen import trace_regen

    def add_at(buf, pix_start, vals):
        zeros = (0,) * (buf.ndim - 1)
        cur = jax.lax.dynamic_slice(
            buf, (pix_start,) + zeros, (L,) + buf.shape[1:])
        return jax.lax.dynamic_update_slice(
            buf, cur + vals, (pix_start,) + zeros)

    def step(carry, c):
        img_buf, sq_buf, sdtree = carry
        k = jax.random.fold_in(key, salt0 + c)
        pix_start = c * L
        out, _ = trace_regen(scene, cfg, k, sensor, pix_start, L,
                             jnp.int32(spp), K, sdtree=sdtree)
        counts = (out["n_rays"], out["n_vertices"],
                  jnp.sum(out["done"]))
        img_buf = (add_at(img_buf[0], pix_start, out["rgb"]),
                   add_at(img_buf[1], pix_start, out["w"]))
        sq_buf = (add_at(sq_buf[0], pix_start, out["rgb2"]),
                  add_at(sq_buf[1], pix_start, out["w"]))
        sdtree = _splat_chunk_records(
            sdtree, out["vertices"], k, cfg, spatial_filter,
            directional_filter, learn_fraction)
        return (img_buf, sq_buf, sdtree), counts

    (img_buf, sq_buf, sdtree), counts = jax.lax.scan(
        step, (img_buf, sq_buf, sdtree), jnp.arange(n_chunks))
    return img_buf, sq_buf, sdtree, jax.tree.map(jnp.sum, counts)


@partial(
    jax.jit,
    static_argnames=("cfg", "sensor", "L", "K", "cpd", "spatial_filter",
                     "directional_filter", "learn_fraction", "mesh"),
)
def _guided_mesh_pass(scene, cfg, sensor, sdtree, key, salt0, L, spp, K,
                      cpd, spatial_filter, directional_filter,
                      learn_fraction, mesh):
    """One guided slab data-parallel over a device mesh: the TPU-native
    replacement for the reference's scheduler fan-out (sched.h:351-484,
    renderproc.cpp) in the guided training loop.

    Pixel chunks are sharded over the mesh's 'tiles' axis (global chunk
    c -> device c // cpd); every device runs the SAME per-chunk regen
    pipeline as the single-device pass with the SAME per-chunk RNG keys
    (fold_in(key, salt0 + c)), so a sharded render draws the identical
    sample set — record-free passes match the single-device image
    bit-for-bit, and training passes differ only in splat interleaving.
    Each device splats records into its local tree copy; the pass ends
    with ONE psum over ICI of the film buffers and the additive tree
    accumulators (qb_sum, db_statw) — the analog of the reference's
    lock-free atomic adds, which commute the same way
    (guided_path.cpp:59-62). Adam per-leaf sampling-fraction state is
    not additive: device chains are pmean-averaged at the pass end
    (local-Adam-with-averaging; the reference serializes these updates
    behind a per-leaf spinlock, guided_path.cpp:719-737 — a documented
    deviation).

    Chunks beyond the image tail trace out-of-film pixels into the
    padded region of the flat film buffers (dropped by unflatten);
    padding waste is < 1 device-chunk of lanes. Returns
    (img, w, sq, tree, counts) replicated.
    """
    from jax.sharding import PartitionSpec as P

    from .regen import trace_regen

    n_dev = mesh.devices.size
    Ptot = n_dev * cpd * L
    record = cfg.record_vertices

    def shard_fn(cids):
        cids = cids[0]  # [cpd] global chunk ids owned by this device

        def add_at(buf, pix_start, vals):
            zeros = (0,) * (buf.ndim - 1)
            cur = jax.lax.dynamic_slice(
                buf, (pix_start,) + zeros, (L,) + buf.shape[1:])
            return jax.lax.dynamic_update_slice(
                buf, cur + vals, (pix_start,) + zeros)

        def step(carry, c):
            img, w, sq, tree = carry
            k = jax.random.fold_in(key, salt0 + c)
            out, _ = trace_regen(scene, cfg, k, sensor, c * L, L,
                                 jnp.int32(spp), K, sdtree=tree)
            img = add_at(img, c * L, out["rgb"])
            w = add_at(w, c * L, out["w"])
            sq = add_at(sq, c * L, out["rgb2"])
            if record:
                tree = _splat_chunk_records(
                    tree, out["vertices"], k, cfg, spatial_filter,
                    directional_filter, learn_fraction)
            counts = (out["n_rays"], out["n_vertices"],
                      jnp.sum(out["done"]))
            return (img, w, sq, tree), counts

        init = (jnp.zeros((Ptot, 3)), jnp.zeros(Ptot),
                jnp.zeros((Ptot, 3)), sdtree)
        (img, w, sq, tree), counts = jax.lax.scan(step, init, cids)
        img = jax.lax.psum(img, "tiles")
        w = jax.lax.psum(w, "tiles")
        sq = jax.lax.psum(sq, "tiles")
        counts = jax.tree.map(
            lambda x: jax.lax.psum(jnp.sum(x), "tiles"), counts)
        if record:
            fields = {f: getattr(sdtree, f) for f in G.SDTreeArrays.FIELDS}
            fields["qb_sum"] = sdtree.qb_sum + jax.lax.psum(
                tree.qb_sum - sdtree.qb_sum, "tiles")
            fields["db_statw"] = sdtree.db_statw + jax.lax.psum(
                tree.db_statw - sdtree.db_statw, "tiles")
            if learn_fraction is not None and cfg.is_built:
                for f in ("opt_var", "opt_m1", "opt_m2", "opt_bgrad",
                          "opt_bweight"):
                    fields[f] = jax.lax.pmean(getattr(tree, f), "tiles")
                fields["opt_iter"] = jax.lax.pmax(tree.opt_iter, "tiles")
            tree = G.SDTreeArrays(s_depth=sdtree.s_depth,
                                  q_depth=sdtree.q_depth, **fields)
        else:
            tree = sdtree
        return img, w, sq, tree, counts

    cids = jnp.arange(n_dev * cpd, dtype=jnp.int32).reshape(n_dev, cpd)
    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P("tiles"),),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False)
    return fn(cids)


@partial(
    jax.jit,
    static_argnames=("cfg", "sensor", "L", "n_film", "n_blocks",
                     "n_slots"),
    donate_argnames=("carry",),
)
def _guided_regen_step(scene, cfg, sensor, sdtree, key, salt, pix_start, L,
                       spp, K, carry, it_base, qstart=None, qend=None,
                       n_film=None, n_blocks=1, n_slots=16):
    """One record-free continuation dispatch of the regenerative tracer
    (early-exit while_loop inside trace_regen). The returned carry keeps
    in-flight samples alive across dispatches so nothing is discarded —
    a fixed window would drop a length-biased set of samples
    (built-tree guided RR survives at 0.99, so long paths dominate the
    tail). With qstart/qend/n_film the L lanes serve the whole image as
    a shared pixel queue (see trace_regen) — the production path."""
    from .regen import trace_regen

    k = jax.random.fold_in(key, salt)
    out, carry = trace_regen(scene, cfg, k, sensor, pix_start, L, spp, K,
                             sdtree=sdtree, carry=carry, it_base=it_base,
                             qstart=qstart, qend=qend, n_film=n_film,
                             n_blocks=n_blocks, n_slots=n_slots)
    return out["all_done"], carry


@partial(
    jax.jit,
    static_argnames=("cfg", "sensor", "L", "K", "n_film", "n_blocks",
                     "n_slots", "spatial_filter", "directional_filter",
                     "learn_fraction"),
    donate_argnames=("carry", "sdtree"),
)
def _guided_train_step(scene, cfg, sensor, sdtree, key, pix_start, L,
                       spp, K, carry, it_base, qstart, qend, n_film,
                       n_blocks, n_slots, spatial_filter,
                       directional_filter, learn_fraction):
    """One TRAINING continuation dispatch over the shared pixel queue:
    trace K record-mode iterations (static scan stacking [K, L] vertex
    records — K bounds the record memory, NOT the slab completion; the
    queue drains across dispatches via the carry) and splat the stacked
    records into the building tree inside the same program. Replaces
    the per-slab `_guided_regen_pass` dispatches whose fixed
    lane<->pixel binding left lanes idle from the first finished path
    until the slab's worst-case iteration budget ran out (the 100x+
    training-vs-unguided throughput gap, VERDICT r3 item 3)."""
    from .regen import trace_regen

    out, carry = trace_regen(scene, cfg, key, sensor, pix_start, L, spp,
                             K, sdtree=sdtree, carry=carry,
                             it_base=it_base, qstart=qstart, qend=qend,
                             n_film=n_film, n_blocks=n_blocks,
                             n_slots=n_slots)
    ks = jax.random.fold_in(jax.random.fold_in(key, 0x5A1AD), it_base)
    sdtree = _splat_chunk_records(
        sdtree, out["vertices"], ks, cfg, spatial_filter,
        directional_filter, learn_fraction)
    return out["all_done"], carry, sdtree


@partial(jax.jit, donate_argnames=("img_buf", "sq_buf"))
def _accum_film(img_buf, sq_buf, film):
    """Fold a pixel-queue device film [n_pix + 1, 8] (rgb, rgb^2, count)
    into the flat box-filter buffers (padded to a chunk multiple)."""
    n_pix = film.shape[0] - 1
    pad = img_buf[0].shape[0] - n_pix
    rgb = jnp.concatenate([film[:-1, :3], jnp.zeros((pad, 3))], 0)
    sq = jnp.concatenate([film[:-1, 3:6], jnp.zeros((pad, 3))], 0)
    w = jnp.concatenate([film[:-1, 6], jnp.zeros(pad)], 0)
    img_buf = (img_buf[0] + rgb, img_buf[1] + w)
    sq_buf = (sq_buf[0] + sq, sq_buf[1] + w)
    return img_buf, sq_buf


@partial(jax.jit, static_argnames=("L",),
         donate_argnames=("img_buf", "sq_buf"))
def _accum_regen(img_buf, sq_buf, carry, pix_start, L):
    """Fold a finished chunk's lane-pool accumulators into the flat film
    buffers with contiguous dynamic-slice adds."""

    def add(buf, vals):
        zeros = (0,) * (buf.ndim - 1)
        cur = jax.lax.dynamic_slice(
            buf, (pix_start,) + zeros, (L,) + buf.shape[1:])
        return jax.lax.dynamic_update_slice(
            buf, cur + vals, (pix_start,) + zeros)

    w = carry["done"].astype(jnp.float32)
    img_buf = (add(img_buf[0], carry["acc"]), add(img_buf[1], w))
    sq_buf = (add(sq_buf[0], carry["acc2"]), add(sq_buf[1], w))
    return img_buf, sq_buf


class GuidedPathTracer:
    def __init__(self, sc, chunk=1 << 16, overrides=None, mesh=None,
                 slices=None, slice_id=None, reduce_sum=None):
        """`mesh`: optional jax.sharding.Mesh with a 'tiles' axis — the
        guided training loop then runs data-parallel over it (pixel
        chunks sharded, film + SD-tree accumulators psum'd over ICI,
        host refine/build between iterations on the replicated tree);
        see _guided_mesh_pass. None = single device.

        `slices`: optional int P — split every pass batch into P
        seed-disjoint slices merged at the batch boundary (the
        production multi-host path, see _render_sliced). slice_id=None
        renders all P slices in this process; slice_id=i renders only
        slice i and `reduce_sum(list_of_arrays) -> list` performs the
        cross-process sum (parallel.multihost.global_merge under
        jax.distributed). In distributed mode every process must run
        the same schedule, so set faultRetries=0 there (a one-sided
        retry would desynchronize the per-batch collective)."""
        from .. import enable_compilation_cache

        enable_compilation_cache()
        self.mesh = mesh
        self.n_slices = int(slices) if slices else None
        self.slice_id = slice_id
        self.reduce_sum = reduce_sum
        ip = dict(sc.integrator)
        ip.update(overrides or {})
        self.sc = sc
        self.chunk = chunk
        # training scheduling: "queue" = shared pixel queue, records
        # splatted per continuation dispatch (production); "slab" = one
        # dispatch per spp slab with fixed lane<->pixel binding (kept
        # for the estimator-equivalence tests and as a fallback);
        # "classic" = the per-bounce wavefront body (smallest programs —
        # the escape hatch for days when the tunnel's remote_compile
        # helper OOMs on the fused machine-mode programs, see STATUS.md
        # round 5). PPG_TRAIN_MODE overrides.
        self.train_mode = os.environ.get("PPG_TRAIN_MODE", "queue")
        self.nee = str(ip.get("nee", "never"))
        self.sample_combination = str(ip.get("sampleCombination", "automatic"))
        self.spatial_filter = str(ip.get("spatialFilter", "nearest"))
        self.directional_filter = str(ip.get("directionalFilter", "nearest"))
        self.loss = str(ip.get("bsdfSamplingFractionLoss", "none"))
        self.sd_tree_max_mb = int(ip.get("sdTreeMaxMemory", -1))
        self.s_tree_threshold = int(ip.get("sTreeThreshold", 12000))
        self.d_tree_threshold = float(ip.get("dTreeThreshold", 0.01))
        self.bsdf_fraction = float(ip.get("bsdfSamplingFraction", 0.5))
        self.spp_per_pass = int(ip.get("sppPerPass", 4))
        self.budget_type = str(ip.get("budgetType", "seconds"))
        self.budget = float(ip.get("budget", 300.0))
        self.dump_sdtree = bool(ip.get("dumpSDTree", False))
        self.dump_path = None

        self.base_cfg = make_config(sc, guiding=True, record_vertices=True)
        self._upload_scene()
        # device-fault recovery (VERDICT r3 §5: graceful degradation):
        # how many times a crashed-TPU-worker iteration is retried after
        # a backend reset + scene re-upload before the error propagates
        self.fault_retries = int(ip.get("faultRetries", 2))
        self._faulted = False  # set by _device_retry when a fault occurred
        self.sensor = make_sensor(sc.sensor, sc.film)
        self.film = Film(
            sc.film["width"], sc.film["height"], sc.film.get("rfilter", "box")
        )
        self.host_tree = HostSDTree(sc.aabb_min, sc.aabb_max)
        # fixed device capacities + descent trip counts: keeps SDTreeArrays
        # shapes identical across refinement iterations so XLA compiles each
        # render config ONCE (a fresh compile costs ~25-30 s; growing
        # through pow2 buckets every iteration dominated whole renders)
        self.tree_caps = {"S": 1 << 13, "T": 1 << 12, "Q": 1 << 16}
        self.tree_depths = None  # depth ladder (multiples of 4) — few
        # recompiles as trees deepen, but shallow early descents stay cheap

        self.stats = []  # per-call telemetry: seconds, variance, ttuv, stuv
        self._warned_mesh = False  # one-shot mesh-fallback warning
        self.tree_stats = []  # per-iteration SD-tree distribution stats
        # partial-image flush hook (mitsuba.cpp:92-127 SIGHUP / -r timer):
        # called with the developed partial image after every pass batch
        self.flush_cb = None

    def _push(self):
        return self.host_tree.push(
            min_caps=self.tree_caps, fixed_depths=self.tree_depths)

    def _upload_scene(self):
        from .driver import ensure_subsurface

        self.scene_dev = DeviceScene.from_scene(self.sc)
        self.scene_dev = ensure_subsurface(self.sc, self.scene_dev)

    # -- device-fault recovery (failure detection / graceful degradation) ---
    def _recover_device(self):
        """After a TPU worker crash every live device buffer and loaded
        executable is gone (jax raises JaxRuntimeError UNAVAILABLE on
        any touch). Reset the JAX backend, wait for the device to answer
        a probe run in a SUBPROCESS (an in-process probe would hang this
        thread on the dead tunnel), then re-upload the scene. The SD-tree
        re-uploads from the host mirror at the next _push(). Plays the
        role of the reference scheduler's failed-worker requeue
        (sched.cpp / sched_remote.cpp connection-loss handling)."""
        import subprocess
        import sys as _sys

        import jax.extend.backend as _eb

        for wait in (5, 15, 30, 60, 120, 240, 480):
            try:
                r = subprocess.run(
                    [_sys.executable, "-c",
                     "import jax; jax.devices(); print('ok')"],
                    timeout=240, capture_output=True)
                if b"ok" in r.stdout:
                    break
            except subprocess.TimeoutExpired:
                pass
            log(f"  device still down; next probe in {wait}s",
                level="warn")
            time.sleep(wait)
        _eb.clear_backends()
        jax.clear_caches()
        self._upload_scene()

    def _device_retry(self, fn):
        """Run `fn` (a closure over HOST state only — it must create its
        own device buffers, e.g. via self._push()), retrying after
        device faults up to self.fault_retries times."""
        retries = getattr(self, "fault_retries", 2)  # driver-oracle
        # probes bypass __init__
        for attempt in range(retries + 1):
            try:
                return fn()
            except jax.errors.JaxRuntimeError as e:
                if attempt >= retries:
                    raise
                self._faulted = True
                log(f"  TPU fault: {str(e)[:160]} — recovering "
                    f"(retry {attempt + 1}/{self.fault_retries})",
                    level="warn")
                self._recover_device()

    # -- nee schedule (doNeeWithSpp, :1331-1340) ----------------------------
    def _do_nee(self, spp_rendered):
        if self.nee == "never":
            return False
        if self.nee == "kickstart":
            return spp_rendered < 128
        return True

    def _cfg(self, is_built, do_nee, is_final):
        # shade-time splat-target precompute (regen.shade_hit): only the
        # spatial box filter still needs the per-record multi-target
        # resolution at splat time
        precompute = (not is_final
                      and self.spatial_filter in ("nearest", "stochastic"))
        return replace(
            self.base_cfg,
            do_nee=do_nee,
            nee_always=self.nee == "always",
            guiding=True,
            is_built=is_built,
            record_vertices=not is_final,
            learn_fraction=self.loss != "none" and is_built,
            bsdf_fraction=self.bsdf_fraction,
            splat_spatial=self.spatial_filter if precompute else "",
            splat_dir=self.directional_filter if precompute else "",
        )

    # -- one performRenderPasses call ---------------------------------------
    def _zeros(self):
        if self.film.rfilter == "box":
            return self.film.zeros_flat(self.chunk)
        return self.film.zeros()

    def _to_image_buffers(self, buf):
        if self.film.rfilter == "box":
            return self.film.unflatten(buf)
        return buf

    def _regen_ok(self, cfg):
        return (not cfg.record_vertices and not cfg.has_media
                and not cfg.has_subsurf and not cfg.has_sss
                and cfg.sampler == "independent"
                and self.film.rfilter == "box")

    def _mesh_ok(self, cfg):
        # mesh passes go through the regen tracer inside shard_map
        ok = (self.mesh is not None and not cfg.has_media
              and not cfg.has_subsurf and not cfg.has_sss
              and cfg.sampler == "independent"
              and self.film.rfilter == "box")
        if self.mesh is not None and not ok and not self._warned_mesh:
            self._warned_mesh = True
            why = ("participating media" if cfg.has_media else
                   "subsurface" if cfg.has_subsurf else
                   f"sampler '{cfg.sampler}'" if cfg.sampler
                   != "independent" else
                   f"rfilter '{self.film.rfilter}'")
            log(f"GuidedPathTracer(mesh=...) falling back to "
                f"single-device passes: {why} is outside the shard_map "
                f"regen fast path (see _guided_mesh_pass)", level="warn")
        return ok

    def _render_passes_mesh(self, n_passes, sdtree, cfg, img_buf, sq_buf,
                            base):
        """Mesh-parallel body of _render_passes: training slabs and the
        record-free final pass both go through _guided_mesh_pass. One
        dispatch covers a whole slab; K bounds the early-exit while
        inside trace_regen (no carry-continuation chunking here — the
        single-TPU tunnel watchdog that motivates it does not apply to
        a real multi-chip deployment, and virtual-device tests run on
        CPU)."""
        from .regen import iterations_for

        W, H = self.film.W, self.film.H
        n_chunks = (W * H + self.chunk - 1) // self.chunk
        n_dev = self.mesh.devices.size
        cpd = (n_chunks + n_dev - 1) // n_dev
        flatP = img_buf[0].shape[0]
        n_rays = n_verts = n_samples = 0
        N = n_passes * self.spp_per_pass
        lf = self.loss if self.loss != "none" else None
        if cfg.record_vertices:
            slab0 = max(1, min(self.spp_per_pass, 8))
            done = 0
            slab_i = 0
            while done < N:
                slab = min(N - done, slab0)
                K = iterations_for(slab, cfg.max_depth, cfg.rr_depth,
                                   built_rr=cfg.is_built and cfg.guiding)
                img, w, sq, sdtree, counts = _guided_mesh_pass(
                    self.scene_dev, cfg, self.sensor, sdtree, base,
                    np.int32(slab_i * n_dev * cpd), self.chunk,
                    np.int32(slab), int(K), cpd, self.spatial_filter,
                    self.directional_filter, lf, self.mesh)
                img_buf = (img_buf[0] + img[:flatP], img_buf[1] + w[:flatP])
                sq_buf = (sq_buf[0] + sq[:flatP], sq_buf[1] + w[:flatP])
                n_rays += int(np.asarray(counts[0]))
                n_verts += int(np.asarray(counts[1]))
                n_samples += int(np.asarray(counts[2]))
                jax.block_until_ready(img_buf[0])
                done += slab
                slab_i += 1
        else:
            K = iterations_for(N, cfg.max_depth, cfg.rr_depth,
                               built_rr=cfg.is_built and cfg.guiding)
            img, w, sq, sdtree, counts = _guided_mesh_pass(
                self.scene_dev, cfg, self.sensor, sdtree, base,
                np.int32(0), self.chunk, np.int32(N), int(K), cpd,
                self.spatial_filter, self.directional_filter, lf,
                self.mesh)
            img_buf = (img_buf[0] + img[:flatP], img_buf[1] + w[:flatP])
            sq_buf = (sq_buf[0] + sq[:flatP], sq_buf[1] + w[:flatP])
            n_rays += int(np.asarray(counts[0]))
            n_verts += int(np.asarray(counts[1]))
            n_samples += int(np.asarray(counts[2]))
        return sdtree, img_buf, sq_buf, n_rays, n_verts, n_samples

    def _regen_train_ok(self, cfg):
        # regen training: near-full traversal utilization on big BVH
        # scenes, and — with the shade-time splat-target precompute
        # (cfg.splat_spatial) — a splat that is pure bincounts, so it
        # wins on brute-force-sized scenes too (the classic per-bounce
        # pass previously won there only because the splat's per-record
        # tree walks dominated)
        return (not cfg.has_media and not cfg.has_subsurf
                and not cfg.has_sss
                and cfg.sampler == "independent"
                and self.film.rfilter == "box")

    def _render_buffers(self, n_passes, sdtree, cfg, img_buf, sq_buf, base):
        """The scheduling core of one pass batch: renders `n_passes`
        passes into (img_buf, sq_buf) with training records splatted
        into `sdtree`, picking the fastest eligible execution path
        (mesh shard_map / regenerative queue / slab / classic).
        Returns (sdtree, img_buf, sq_buf, n_rays, n_verts, n_samples)."""
        W, H = self.film.W, self.film.H
        n_chunks = (W * H + self.chunk - 1) // self.chunk
        n_rays = n_verts = n_samples = 0
        if self._mesh_ok(cfg):
            sdtree, img_buf, sq_buf, n_rays, n_verts, n_samples = \
                self._render_passes_mesh(n_passes, sdtree, cfg, img_buf,
                                         sq_buf, base)
        elif self._regen_ok(cfg):
            # record-free batches go through the regenerative tracer: the
            # while_loop inside trace_regen exits as soon as every lane's
            # spp samples complete, so K only bounds ONE dispatch under
            # the TPU watchdog; the carried lane pool continues in-flight
            # samples across dispatches until all_done (no length-biased
            # discards — built-tree guided RR keeps 99% of paths alive
            # past rr_depth)
            from .regen import iterations_for

            N = n_passes * self.spp_per_pass
            n_pix = W * H
            total_K = n_chunks * iterations_for(
                N, cfg.max_depth, cfg.rr_depth,
                built_rr=cfg.is_built and cfg.guiding)
            K = np.int32(min(total_K, 4000))
            n_blocks = max(1, (N + 7) // 8)
            n_slots = int(min(
                np.ceil(n_pix * n_blocks / self.chunk) + 4, 96))
            # slot-full stalls bound the useful iterations per dispatch
            # at n_slots blocks per lane; extra dispatches continue
            max_disp = total_K // int(K) + N // 8 + 8
            carry = None
            for i in range(max_disp):
                done_f, carry = _guided_regen_step(
                    self.scene_dev, cfg, self.sensor, sdtree, base,
                    np.int32(i), np.int32(0), self.chunk,
                    np.int32(N), K, carry, np.int32(i * int(K)),
                    qstart=np.int32(0), qend=np.int32(n_pix * n_blocks),
                    n_film=n_pix + 1, n_blocks=n_blocks, n_slots=n_slots)
                if bool(done_f):
                    break
            img_buf, sq_buf = _accum_film(img_buf, sq_buf, carry["film"])
            n_rays += int(np.asarray(carry["n_rays"]))
            n_verts += int(np.asarray(carry["vsum"]))
            n_samples += int(np.asarray(carry["film"])[:-1, 6].sum())
        elif self._regen_train_ok(cfg) and self.train_mode == "queue":
            # TRAINING over the shared pixel queue (same scheduling as
            # the record-free production path): chained dispatches of K
            # record-mode iterations, records splatted inside each
            # dispatch, lag-1 all_done sync so the tunnel round-trip
            # overlaps the next dispatch. K bounds the [K, L] stacked
            # record memory (~70 B/lane/iter), not slab completion.
            from .regen import iterations_for

            N = n_passes * self.spp_per_pass
            n_pix = W * H
            total_K = n_chunks * iterations_for(
                N, cfg.max_depth, cfg.rr_depth,
                built_rr=cfg.is_built and cfg.guiding)
            K = int(min(total_K, 96))
            n_blocks = max(1, (N + 7) // 8)
            n_slots = int(min(
                np.ceil(n_pix * n_blocks / self.chunk) + 4, 96))
            # generous: a machine dispatch advances ~K/MACHINE_ITER_MULT
            # classic-equivalents, and the banked-record while_loop
            # makes post-done dispatches ~free (1 iteration each)
            max_disp = 2 * (total_K // K) + N // 8 + 16
            lf = self.loss if self.loss != "none" else None
            lf = lf if cfg.is_built else None
            carry = None
            prev_done = None
            for i in range(max_disp):
                done_f, carry, sdtree = _guided_train_step(
                    self.scene_dev, cfg, self.sensor, sdtree, base,
                    np.int32(0), self.chunk, np.int32(N), K, carry,
                    np.int32(i * K), qstart=np.int32(0),
                    qend=np.int32(n_pix * n_blocks), n_film=n_pix + 1,
                    n_blocks=n_blocks, n_slots=n_slots,
                    spatial_filter=self.spatial_filter,
                    directional_filter=self.directional_filter,
                    learn_fraction=lf)
                if prev_done is not None and bool(prev_done):
                    break
                prev_done = done_f
            log(f"    training: {i + 1}/{max_disp} dispatches "
                f"(K={K}, n_blocks={n_blocks}, n_slots={n_slots})")
            img_buf, sq_buf = _accum_film(img_buf, sq_buf, carry["film"])
            n_rays += int(np.asarray(carry["n_rays"]))
            n_verts += int(np.asarray(carry["vsum"]))
            n_samples += int(np.asarray(carry["film"])[:-1, 6].sum())
        elif self._regen_train_ok(cfg) and self.train_mode != "classic":
            # TRAINING through the regenerative record path: one dispatch
            # per spp slab covering all chunks (scan inside the jit with
            # the SD-tree chained through the carry); slab size bounds
            # the stacked-record memory ([K, L] per chunk, transient)
            from .regen import iterations_for

            N = n_passes * self.spp_per_pass
            slab0 = max(1, min(self.spp_per_pass, 8))
            done = 0
            slab_i = 0
            lf = self.loss if self.loss != "none" else None
            while done < N:
                slab = min(N - done, slab0)
                K = iterations_for(slab, cfg.max_depth, cfg.rr_depth,
                                   built_rr=cfg.is_built and cfg.guiding)
                img_buf, sq_buf, sdtree, counts = _guided_regen_pass(
                    self.scene_dev, cfg, self.sensor, img_buf, sq_buf,
                    sdtree, base, np.int32(slab_i * n_chunks),
                    self.chunk, np.int32(slab), int(K), n_chunks,
                    self.spatial_filter, self.directional_filter, lf)
                n_rays += int(np.asarray(counts[0]))
                n_verts += int(np.asarray(counts[1]))
                n_samples += int(np.asarray(counts[2]))
                # sync each slab: pipelined donation-chained dispatches
                # stall multi-second on the TPU tunnel
                jax.block_until_ready(img_buf[0])
                heartbeat.beat()
                done += slab
                slab_i += 1
        else:
            n_sub = self.spp_per_pass * n_chunks
            pix_starts = np.tile(
                np.arange(n_chunks, dtype=np.int32) * self.chunk,
                self.spp_per_pass)
            for p in range(n_passes):
                salts = np.int32(p * n_sub) + np.arange(n_sub, dtype=np.int32)
                img_buf, sq_buf, sdtree, counts = _guided_pass(
                    self.scene_dev, cfg, self.sensor, self.film,
                    self.chunk, img_buf, sq_buf, sdtree, base,
                    salts, pix_starts,
                    self.spatial_filter, self.directional_filter,
                    self.loss if self.loss != "none" else None,
                )
                n_rays += int(np.asarray(counts[0]))
                n_verts += int(np.asarray(counts[1]))
                n_samples += n_sub * self.chunk
                # sync each pass: pipelined donation-chained dispatches
                # stall multi-second on the TPU tunnel
                jax.block_until_ready(img_buf)
                heartbeat.beat()
        return sdtree, img_buf, sq_buf, n_rays, n_verts, n_samples

    def _render_sliced(self, n_passes, base_tree, cfg, seed_base):
        """Seed-disjoint slice split of one pass batch — the production
        multi-HOST path (sched_remote.h:50-238 / mtssrv.cpp:289-408
        roles): slice s renders its share of the passes from the SAME
        post-refine base tree with a slice-salted RNG stream; the
        batch's film sums, tree-accumulator deltas (qb_sum / db_statw —
        additive, like the reference's lock-free concurrent splats,
        guided_path.cpp:59-62) and ray counters are summed across
        slices, and the Adam learn-fraction chains are averaged (the
        same pmean rule as the in-host 'tiles' axis, _guided_mesh_pass).

        slice_id=None renders EVERY slice in this process (the referee
        / single-host semantics — bit-identical merge math to the
        distributed run); slice_id=i renders only slice i locally and
        `reduce_sum` (e.g. parallel.multihost.global_merge under
        jax.distributed) sums the per-process partials — the only
        traffic that crosses the host boundary, once per pass batch,
        exactly where the reference pays its TCP round trip."""
        from ..guiding.sdtree import SDTreeArrays

        P = self.n_slices
        opt_fields = [f for f in SDTreeArrays.FIELDS
                      if f.startswith("opt_")]
        base_qb = np.asarray(base_tree.qb_sum)
        base_sw = np.asarray(base_tree.db_statw)
        d_qb = np.zeros_like(base_qb)
        d_sw = np.zeros_like(base_sw)
        opt_acc = {f: None for f in opt_fields}
        img_acc = [np.zeros_like(np.asarray(b)) for b in self._zeros()]
        sq_acc = [np.zeros_like(a) for a in img_acc]
        counts = np.zeros(3, np.float64)
        sids = range(P) if self.slice_id is None else [self.slice_id]
        for sid in sids:
            n_sid = n_passes // P + (1 if sid < n_passes % P else 0)
            tree_s = base_tree
            if n_sid:
                key = jax.random.fold_in(jax.random.key(seed_base),
                                         104729 + sid)
                tree_s, img_s, sq_s, r, v, s = self._render_buffers(
                    n_sid, base_tree, cfg, self._zeros(), self._zeros(),
                    key)
                for a, b in zip(img_acc, img_s):
                    a += np.asarray(b)
                for a, b in zip(sq_acc, sq_s):
                    a += np.asarray(b)
                counts += (r, v, s)
                d_qb += np.asarray(tree_s.qb_sum) - base_qb
                d_sw += np.asarray(tree_s.db_statw) - base_sw
            for f in opt_fields:
                a = np.asarray(getattr(tree_s, f), np.float64) / P
                opt_acc[f] = a if opt_acc[f] is None else opt_acc[f] + a
        if self.reduce_sum is not None:
            flat = self.reduce_sum(
                [d_qb, d_sw, counts] + img_acc + sq_acc
                + [opt_acc[f] for f in opt_fields])
            d_qb, d_sw, counts = flat[0], flat[1], flat[2]
            k = 3
            img_acc = flat[k:k + len(img_acc)]
            k += len(img_acc)
            sq_acc = flat[k:k + len(sq_acc)]
            k += len(sq_acc)
            opt_acc = dict(zip(opt_fields, flat[k:]))
        fields = {f: getattr(base_tree, f) for f in SDTreeArrays.FIELDS}
        fields["qb_sum"] = base_qb + d_qb
        fields["db_statw"] = base_sw + d_sw
        for f in opt_fields:
            dt = np.asarray(getattr(base_tree, f)).dtype
            m = opt_acc[f]
            fields[f] = (np.rint(m).astype(dt)
                         if np.issubdtype(dt, np.integer)
                         else m.astype(dt))
        tree = SDTreeArrays(s_depth=base_tree.s_depth,
                            q_depth=base_tree.q_depth, **fields)
        return (tree, tuple(img_acc), tuple(sq_acc),
                int(counts[0]), int(counts[1]), float(counts[2]))

    def _render_passes(self, n_passes, sdtree, is_built, do_nee, is_final,
                       film_buf, seed_base):
        W, H = self.film.W, self.film.H
        cfg = self._cfg(is_built, do_nee, is_final)
        t0 = time.time()
        if self.n_slices:
            sdtree, img_buf, sq_buf, n_rays, n_verts, n_samples = \
                self._render_sliced(n_passes, sdtree, cfg, seed_base)
        else:
            sdtree, img_buf, sq_buf, n_rays, n_verts, n_samples = \
                self._render_buffers(n_passes, sdtree, cfg, self._zeros(),
                                     self._zeros(),
                                     jax.random.key(seed_base))
        jax.block_until_ready(img_buf)
        seconds = time.time() - t0

        # variance of the pass batch (:1300-1313)
        N = n_passes * self.spp_per_pass
        img2d = self._to_image_buffers(img_buf)
        sq2d = self._to_image_buffers(sq_buf)
        img_sum = np.asarray(img2d[0])
        sq_sum = np.asarray(sq2d[0])
        local_var = sq_sum - img_sum * img_sum / max(N, 1)
        lum = (
            0.212671 * local_var[..., 0]
            + 0.715160 * local_var[..., 1]
            + 0.072169 * local_var[..., 2]
        )
        variance = float(np.minimum(lum, VAR_CLAMP).sum()) / (W * H * max(N - 1, 1))

        if film_buf is not None:
            film_buf = (film_buf[0] + img_buf[0], film_buf[1] + img_buf[1])
        ttuv = seconds * variance
        stuv = N * variance
        # avgPathLength registry entry (guided_path.cpp:1010,2147-2148)
        avg_len = n_verts / n_samples if n_samples else 0.0
        self.stats.append(dict(seconds=seconds, passes=n_passes, spp=N,
                               variance=variance, ttuv=ttuv, stuv=stuv,
                               n_rays=n_rays, avg_path_length=avg_len,
                               is_final=bool(is_final),
                               training=bool(cfg.record_vertices)))
        log(f"  {seconds:.2f}s, {n_passes} passes, var {variance:.6f}, "
            f"TTUV {ttuv:.6f}, STUV {stuv:.6f}, "
            f"avgPathLength {avg_len:.2f}, "
            f"{n_rays / max(seconds, 1e-9) / 1e6:.1f} Mrays/s")
        image = img_sum / np.maximum(np.asarray(img2d[1])[..., None], 1e-20)
        if self.flush_cb is not None:
            self.flush_cb(image)
        return sdtree, film_buf, image, variance

    # -- checkpoint/resume (RenderJob resume role; lets a render survive
    #    a killed process — e.g. the tunnel-wedge watchdog — by resuming
    #    at the last completed iteration boundary) -------------------------
    def _save_checkpoint(self, path, state):
        import pickle
        import tempfile

        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                                   suffix=".ckpt")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(state, f, protocol=4)
        os.replace(tmp, path)

    def _load_checkpoint(self, path):
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)

    # -- the full render loop ------------------------------------------------
    def render(self, seed=0, spp_budget=None, checkpoint=None):
        """checkpoint: optional path — the render state (film sums,
        host SD-tree, iteration counters, inversevar stacks) is written
        atomically after every completed iteration, and an existing
        file resumes the loop at that boundary. Deterministic: resumed
        renders reproduce the uninterrupted result (per-iteration seeds
        derive from the iteration index)."""
        if self.budget_type != "spp" and spp_budget is None:
            # time budget: estimated via wall clock like renderTime
            return self._render_time(seed)
        budget = int(spp_budget if spp_budget is not None else self.budget)
        n_passes = int(np.ceil(budget / self.spp_per_pass))

        sdtree = None
        is_built = False
        passes_rendered = 0
        it = 0
        images, variances = [], []
        film_buf = self._zeros()
        cur_var_at_end = np.inf
        final_image = None

        if checkpoint and os.path.exists(checkpoint):
            try:
                st = self._load_checkpoint(checkpoint)
                if st.get("seed") == seed and st.get("budget") == budget:
                    it = st["it"]
                    passes_rendered = st["passes_rendered"]
                    is_built = st["is_built"]
                    film_buf = tuple(st["film_buf"])
                    images = list(st["images"])
                    variances = list(st["variances"])
                    cur_var_at_end = st["cur_var_at_end"]
                    self.host_tree = st["host_tree"]
                    log(f"resumed checkpoint: iteration {it}, "
                        f"{passes_rendered}/{n_passes} passes")
                else:
                    log("checkpoint seed/budget mismatch — starting fresh",
                        level="warn")
            except Exception as e:  # corrupt checkpoint: start fresh
                log(f"checkpoint load failed ({e}) — starting fresh",
                    level="warn")

        while passes_rendered < n_passes:
            spp_rendered = passes_rendered * self.spp_per_pass
            do_nee = self._do_nee(spp_rendered)

            remaining = n_passes - passes_rendered
            passes_this_iter = min(remaining, 1 << it)
            # merge-final rule (:1372-1374)
            if remaining - passes_this_iter < 2 * passes_this_iter:
                passes_this_iter = remaining
            is_final = passes_this_iter >= remaining
            log(f"ITERATION {it}, {passes_this_iter} passes "
                f"(final={is_final}, nee={do_nee}, built={is_built})")

            # resetSDTree (:1108-1113)
            if sdtree is not None:
                self.host_tree.pull(sdtree)
            self.host_tree.refine_and_reset(
                it, self.spp_per_pass, self.s_tree_threshold,
                self.d_tree_threshold, self.sd_tree_max_mb,
            )

            def _iter_device(pti=passes_this_iter, ib=is_built,
                             dn=do_nee, fin=is_final, sb=seed * 7919 + it):
                # closure over HOST state only: a device-fault retry
                # re-pushes the post-refine host tree and re-renders the
                # iteration from scratch (film/tree device buffers of the
                # failed attempt are dead anyway)
                fb = self._zeros()
                sdt = self._push()
                return self._render_passes(pti, sdt, ib, dn, fin, fb, sb)

            sdtree, film_buf, image, variance = self._device_retry(
                _iter_device)
            passes_rendered += passes_this_iter
            if self.sample_combination == "inversevar":
                images.append(image)
                variances.append(variance)

            # variance extrapolation (guided_path.cpp:1383-1391): divide by
            # the PRE-subtraction remaining (which still includes this
            # iteration's passes), THEN subtract
            last_var = cur_var_at_end
            cur_var_at_end = (
                passes_this_iter * variance / remaining if remaining > 0 else 0.0
            )
            remaining -= passes_this_iter

            if (
                self.sample_combination == "automatic"
                and remaining > 0
                and (remaining < passes_this_iter
                     or (spp_rendered > 256 and cur_var_at_end > last_var))
            ):
                log(f"FINAL {remaining} passes")

                def _ext_device(rem=remaining, sdt0=sdtree, fb0=film_buf,
                                ib=is_built, dn=do_nee,
                                sb=seed * 7919 + 1000 + it):
                    # first attempt continues the live tree/film; a retry
                    # re-pushes from host (this iteration's training
                    # records are lost to the fault — benign: the
                    # extension is final, the next build is never sampled)
                    sdt, fb = sdt0, fb0
                    if sdt is None or self._faulted:
                        fb = self._zeros()
                        sdt = self._push()
                    return self._render_passes(rem, sdt, ib, dn, True,
                                               fb, sb)

                self._faulted = False
                sdtree, film_buf, image, variance = self._device_retry(
                    _ext_device)
                passes_rendered += remaining
                if self.sample_combination == "inversevar":
                    images.append(image)
                    variances.append(variance)

            # buildSDTree (:1115-1189) + distribution statistics report
            try:
                self.host_tree.pull(sdtree)
            except jax.errors.JaxRuntimeError as e:
                # graceful degradation: the iteration's rendered image is
                # already on the host; only its training records are lost.
                # Recover the device and rebuild from whatever (possibly
                # partial) sums landed before the fault.
                log(f"  TPU fault during tree pull: {str(e)[:120]} — "
                    "this iteration's remaining training records are "
                    "lost; continuing", level="warn")
                self._recover_device()
            self.host_tree.build()
            ds = self.host_tree.distribution_stats()
            self.tree_stats.append(ds)
            log("  SD-tree: %d d-trees (s-depth %d, ~%.1f MB); "
                "depth %g/%.2f/%g, mean %.3g/%.3g/%.3g, "
                "nodes %g/%.1f/%g, statWeight %g/%.4g/%g (min/avg/max)" % (
                    ds["n_dtrees"], ds["stree_depth"],
                    ds["approx_memory_mb"],
                    ds["depth"]["min"], ds["depth"]["avg"],
                    ds["depth"]["max"],
                    ds["mean_radiance"]["min"], ds["mean_radiance"]["avg"],
                    ds["mean_radiance"]["max"],
                    ds["nodes"]["min"], ds["nodes"]["avg"],
                    ds["nodes"]["max"],
                    ds["stat_weight"]["min"], ds["stat_weight"]["avg"],
                    ds["stat_weight"]["max"]))
            sdtree = self._push()
            is_built = True

            if self.dump_sdtree and passes_rendered < n_passes:
                self._dump(it)
            it += 1

            if checkpoint:
                # post-build boundary: the next loop iteration starts
                # with refine_and_reset(it) exactly as it would have
                self._save_checkpoint(checkpoint, dict(
                    seed=seed, budget=budget, it=it,
                    passes_rendered=passes_rendered, is_built=is_built,
                    film_buf=tuple(np.asarray(b) for b in film_buf),
                    images=[np.asarray(im) for im in images],
                    variances=list(variances),
                    cur_var_at_end=cur_var_at_end,
                    host_tree=self.host_tree))

        if self.sample_combination == "inversevar":
            k = min(len(images), 4)
            w = 1.0 / np.maximum(np.array(variances[-k:]), 1e-20)
            w /= w.sum()
            final_image = sum(
                wi * im for wi, im in zip(w, images[-k:])
            ).astype(np.float32)
        else:
            final_image = np.asarray(Film.develop(self._to_image_buffers(film_buf)))
        self.sdtree = sdtree
        return final_image

    def _render_time(self, seed):
        """renderTime (guided_path.cpp:1434-1514): wall-clock budget,
        passesThisIteration = 2^iter, with the automatic final extension
        looping whole pass batches until the budget runs out."""
        n_seconds = self.budget
        sdtree = None
        is_built = False
        passes_rendered = 0
        it = 0
        images, variances = [], []
        film_buf = self._zeros()
        cur_var_at_end = np.inf
        start = time.time()
        elapsed = 0.0

        was_final = False
        while elapsed < n_seconds:
            spp_rendered = passes_rendered * self.spp_per_pass
            do_nee = self._do_nee(spp_rendered)
            # remainingTime is captured BEFORE the iteration renders
            # (guided_path.cpp:1457), so the extrapolation below divides by
            # the budget still open at iteration start
            remaining_time = n_seconds - elapsed
            passes_this_iter = 1 << it
            log(f"ITERATION {it}, {passes_this_iter} passes (time budget)")

            iter_start = time.time()
            if sdtree is not None:
                self.host_tree.pull(sdtree)
            self.host_tree.refine_and_reset(
                it, self.spp_per_pass, self.s_tree_threshold,
                self.d_tree_threshold, self.sd_tree_max_mb,
            )

            def _iter_device(pti=passes_this_iter, ib=is_built,
                             dn=do_nee, sb=seed * 7919 + it):
                fb = self._zeros()
                sdt = self._push()
                return self._render_passes(pti, sdt, ib, dn, False, fb, sb)

            sdtree, film_buf, image, variance = self._device_retry(
                _iter_device)
            passes_rendered += passes_this_iter
            if self.sample_combination == "inversevar":
                images.append(image)
                variances.append(variance)

            seconds_iter = time.time() - iter_start
            # extrapolation order matches guided_path.cpp:1475-1481: divide
            # by the iteration-start remainingTime, THEN subtract secondsIter
            last_var = cur_var_at_end
            cur_var_at_end = (
                seconds_iter * variance / remaining_time
                if remaining_time > 0 else 0.0
            )
            remaining_time -= seconds_iter

            if (
                self.sample_combination == "automatic"
                and remaining_time > 0
                and (remaining_time < seconds_iter
                     or (spp_rendered > 256 and cur_var_at_end > last_var))
            ):
                log(f"FINAL {remaining_time:.1f} seconds")
                was_final = True
                # do-while (:1494-1500): always at least one extension batch
                while True:
                    sdtree, film_buf, image, variance = self._render_passes(
                        passes_this_iter, sdtree, is_built, do_nee, True,
                        film_buf, seed_base=seed * 7919 + 1000 * it
                        + passes_rendered,
                    )
                    passes_rendered += passes_this_iter
                    if time.time() - start >= n_seconds:
                        break

            try:
                self.host_tree.pull(sdtree)
            except jax.errors.JaxRuntimeError as e:
                log(f"  TPU fault during tree pull: {str(e)[:120]} — "
                    "this iteration's remaining training records are "
                    "lost; continuing", level="warn")
                self._recover_device()
            self.host_tree.build()
            sdtree = self._push()
            is_built = True
            if self.dump_sdtree and not was_final:
                self._dump(it)
            it += 1
            elapsed = time.time() - start

        if self.sample_combination == "inversevar":
            k = min(len(images), 4)
            w = 1.0 / np.maximum(np.array(variances[-k:]), 1e-20)
            w /= w.sum()
            final = sum(wi * im for wi, im in zip(w, images[-k:]))
            final_image = final.astype(np.float32)
        else:
            final_image = np.asarray(Film.develop(self._to_image_buffers(film_buf)))
        self.sdtree = sdtree
        return final_image

    def _dump(self, it):
        from ..io.sdt import dump_sdtree

        if self.dump_path is None:
            return
        path = f"{self.dump_path}-{it:02d}.sdt"
        cam = np.asarray(self.sc.sensor.get("to_world", np.eye(4)))
        dump_sdtree(path, self.host_tree, cam)
