"""Persistent-wavefront path tracer with lane-owned path regeneration.

The classic wavefront (wavefront.trace_paths) traces one camera sample
per lane through a fixed-length bounce scan: lanes whose paths die early
(RR, absorption, escape) idle for the remaining bounces — on cbox ~half
of every bounce's width is dead, on deep-bounce interior scenes far
more. Here each lane OWNS one pixel of the chunk and serves all `spp`
samples of that pixel back-to-back: the scan runs K iterations where an
iteration = {regenerate finished lanes with their pixel's next camera
sample, intersect every lane's pending ray, accumulate emitter/env hits
(one-sample-MIS weighted), shade + NEE + sample the next direction}.
Utilization stays near 1 until the tail of the sample queue drains.

Because lane l only ever renders pixel pix_start + l, the film update is
the same contiguous dynamic-slice add as the classic path — no scatter,
no sort. Sample counts are exact: a lane stops regenerating after spp
starts, and a sample still in flight when K runs out is DISCARDED
(contribution and weight), keeping the estimator unbiased; size K so
the discard count is negligible (see `iterations_for`).

The per-iteration shade stage replicates wavefront.trace_paths' body
(the reference implementation of the Li() semantics,
guided_path.cpp:1712-2157) — the two must stay in sync; the equal-spp
agreement test in tests/test_regen.py enforces it. Scope: surface
scenes (no participating media), independent sampler, guiding on or off
(vertex/NEE records use per-lane SEGMENTED suffix sums of the slot
stream, the regenerative analog of recordRadiance over stored
vertices).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..accel.traverse import (BRUTE_MAX, any_hit, bvh_state_init,
                              bvh_state_reset, bvh_step_factory,
                              closest_hit)
from ..bsdf import bsdf as B
from ..core.vecmath import build_frame, dot, to_local, to_world
from ..emitters import area as E
from ..emitters import envmap as EV
from ..scene.scene import (MAT_COATING, MAT_MASK, MAT_NULL,
                           MAT_ROUGHCOATING)
from ..scene.textures import sample_atlas
from .wavefront import (DeviceScene, PTConfig, SHADOW_EPS, _sample_emitters,
                        decode_row, fetch_row, mi_weight)


def iterations_for(spp, max_depth, rr_depth=5, mean_len=None,
                   built_rr=False):
    """Iteration budget so that sample discards are negligible: spp x
    (expected path length) + a drain tail for the last samples.

    `built_rr` marks guided rendering with a BUILT tree, whose RR
    survival is clamped to 0.99 (guided_path.cpp:2124-2142): the mean
    path length is then set by the depth cap (or ~rr_depth + 100 when
    maxDepth is unlimited), not by throughput decay."""
    cap = (512 if built_rr else 16) if max_depth < 0 \
        else min(max_depth - 1, 64)
    if mean_len is None:
        extra = 100.0 if built_rr else 3.0
        mean_len = min(rr_depth + extra, cap + 1)
    tail = min(cap + 1, 64) + 8
    return int(spp * mean_len + tail)


# budgeted segment machine (see trace_regen.machine_body): traversal
# steps per window, and independent gather groups per window step.
# Swept on kitchen (1M tris, 64k lanes) with the shared pixel queue:
# SEG_B 8/10/12/16 -> 1.98/2.13/2.14/2.00 Mrays/s. The per-iteration
# cost decomposes as ~15 ms fixed (completion processing + queue) +
# ~0.84 ms per traversal step; mean walk length is ~6 steps (measured
# visits/ray: camera 5.2 internal + 1.2 leaf), so windows shorter than
# ~10 re-run the expensive completion phase for too few finished walks
# and longer windows idle finished lanes against the fixed cost.
# MACHINE_GROUPS 1/2/4/8 all within noise (the interleaved-gather win
# measured in isolation does not survive inside the full window body),
# so the sub-pool split is disabled by default.
SEG_B = int(os.environ.get("PPG_SEG_B", "12"))
MACHINE_GROUPS = 1
# machine iterations per classic bounce-iteration budget: a bounce takes
# ~1-2 windows (closest walk + shadow walk at SEG_B steps each)
MACHINE_ITER_MULT = 2

# pixel-queue mode: per-lane slot-buffer depth. A lane flushes one slot
# entry per COMPLETED pixel (all spp samples done) and claims the next
# pixel from a global queue head; slots drain into the device film by a
# single scatter at dispatch end. A lane that completes more than
# QUEUE_SLOTS pixels inside one dispatch stalls (resumes next dispatch).
QUEUE_SLOTS = 16


def init_carry(L, machine_sd=None, n_film=None, qstart=0,
               n_slots=QUEUE_SLOTS):
    """Fresh lane-pool state for trace_regen continuation dispatches.
    `machine_sd` (the BVH stack depth) adds the segment-machine fields:
    per-lane traversal state, current-segment interval, pending NEE
    contribution and the queued bounce ray. `n_film` switches on
    pixel-queue mode: lanes claim pixels from a shared queue head
    (starting at `qstart`) instead of a fixed lane<->pixel binding, and
    completed pixels accumulate into a device film [n_film, 8] holding
    (rgb sum, rgb^2 sum, sample count, pad); the reference's analog is
    the block queue of BlockedRenderProcess (renderproc.cpp), rebuilt
    here as a lane-level work queue so the wavefront never idles on the
    long-path tail of a fixed assignment (measured 28% -> ~90% lane
    occupancy on kitchen)."""
    f3 = lambda: jnp.zeros((L, 3), jnp.float32)
    c = dict(
        started=jnp.zeros(L, jnp.int32), done=jnp.zeros(L, jnp.int32),
        acc=f3(), acc2=f3(), cur=f3(),
        alive=jnp.zeros(L, bool), fresh=jnp.zeros(L, bool),
        o=f3(), d=jnp.tile(jnp.asarray([[0.0, 0, 1]], jnp.float32), (L, 1)),
        p_prev=f3(), thr=f3(), eta=jnp.ones(L),
        wo_pdf_prev=jnp.zeros(L), delta_prev=jnp.zeros(L, bool),
        depth=jnp.zeros(L, jnp.int32), n_rays=jnp.int32(0),
        # avgPathLength accumulator (guided_path.cpp:1010,2147-2148):
        # sum of shade counts of completed samples
        vsum=jnp.int32(0),
    )
    if machine_sd is not None:
        c.update(
            tst=bvh_state_init(L, machine_sd, jnp.zeros(L, bool)),
            tmin=jnp.zeros(L), tmax=jnp.full(L, 3.4e38),
            seg_shadow=jnp.zeros(L, bool), l_nee=f3(),
            qo=f3(), qd=f3(), qalive=jnp.zeros(L, bool),
            sh_budget=jnp.zeros(L, jnp.int32),
            # telemetry: machine iterations run, cumulative alive lanes,
            # cumulative completed walks (occupancy diagnostics)
            mi=jnp.int32(0), mi_alive=jnp.int32(0), mi_walks=jnp.int32(0),
        )
    if n_film is not None:
        c.update(
            pix=jnp.full(L, -1, jnp.int32),
            qhead=jnp.asarray(qstart, jnp.int32),
            slot_pix=jnp.full((L, n_slots), -1, jnp.int32),
            slot_acc=jnp.zeros((L, n_slots, 8), jnp.float32),
            slot_i=jnp.zeros(L, jnp.int32),
            film=jnp.zeros((n_film, 8), jnp.float32),
        )
    return c


class _RandBlock:
    """One fused uniform draw per iteration: each request takes a column
    slab of a single [L, n] matrix drawn with ONE fold_in + threefry
    call (a dozen separate tagged draws per iteration spend a
    significant share of the body in key hashing). The column count is
    computed statically from the config flags, so the layout is
    identical across traces."""

    def __init__(self, key, it, L, n_cols):
        self.next = 0
        self.u = jax.random.uniform(jax.random.fold_in(key, it),
                                    (L, n_cols))

    def take(self, k=1, flat=False):
        a = self.next
        self.next = a + k
        assert self.next <= self.u.shape[1], "rand column budget"
        cols = self.u[:, a:a + k]
        return cols[:, 0] if flat else cols


def _record_queue_loop(run_body, carry0, K_m, it0, lane_spp, n_slots,
                       qend):
    """Record-mode queue dispatch as an early-exit while_loop with
    BANKED per-iteration outputs: iteration k's (slot, fresh, vert)
    rows land at bank index k via dynamic_update, so the segmented
    suffix-sum radiance over the bank is identical to the static
    scan's stacked outs (untouched rows are zeros: slot adds nothing,
    fresh=False passes segments through, vert.valid=False splats
    nothing). The loop exits the moment the queue is drained and every
    lane retired — a static scan pays the FULL traversal cost (SEG_B
    BVH row-gathers x remaining iterations) for every post-done
    iteration, and the driver's lag-1 all_done sync guarantees at
    least one whole post-done dispatch per pass batch."""
    shapes = jax.eval_shape(run_body, carry0, jnp.int32(0))[1]
    outs0 = jax.tree.map(
        lambda s: jnp.zeros((K_m,) + s.shape, s.dtype), shapes)

    def cond(st):
        c, k, _ = st
        can_work = (c["pix"] >= 0) & ~(
            (c["done"] >= lane_spp(c["pix"])) & (c["slot_i"] >= n_slots))
        return (k < K_m) & (
            jnp.any(can_work)
            | ((c["qhead"] < qend) & jnp.any(c["pix"] < 0)))

    def body_w(st):
        c, k, outs = st
        c2, o = run_body(c, it0 + k)
        outs = jax.tree.map(
            lambda buf, x: jax.lax.dynamic_update_index_in_dim(
                buf, x, k, 0), outs, o)
        return c2, k + 1, outs

    carry, _, outs = jax.lax.while_loop(
        cond, body_w, (carry0, jnp.int32(0), outs0))
    return carry, outs


def trace_regen(scene: DeviceScene, cfg: PTConfig, key, sensor, pix_start,
                L, spp, K, sdtree=None, carry=None, it_base=0,
                qstart=None, qend=None, n_film=None, n_blocks=1,
                n_slots=QUEUE_SLOTS):
    """Render up to `spp` samples for pixels [pix_start, pix_start + L)
    with an L-lane pool over K iterations.

    Pixel-queue mode (`n_film` not None): instead of the fixed
    lane<->pixel binding, lanes claim pixels from the shared queue
    [qstart, qend) — when a lane finishes all `spp` samples of its
    pixel it banks (rgb, rgb^2, count) into a per-lane slot buffer and
    claims the queue head, so the pool stays saturated instead of
    draining on the longest-path lanes. Slots scatter into the carry's
    device film [n_film, 8] once per dispatch. The returned `out` is
    then diagnostic only — read carry["film"] after all_done.

    `n_blocks` splits each pixel's spp into that many queue items
    (sample blocks of ceil(spp / n_blocks)): the drain tail at queue
    exhaustion then lasts one BLOCK's duration instead of a full
    pixel's, at the cost of more flush traffic — qend must be given in
    item units (n_pix * n_blocks). Blocks of one pixel may run on
    different lanes concurrently; the film scatter sums them.

    Continuation: pass the returned `carry` (and a bumped `it_base`, so
    randomness never repeats) to keep tracing the same chunk in further
    dispatches — the driver stops when done == spp everywhere, so K can
    stay small and idle-tail waste is bounded by one dispatch. Training
    records of a path spanning a dispatch boundary lose the tail light
    beyond the boundary (bounded by choosing K >= typical path length;
    the classic loop's fixed bounce cap truncates the same way).

    Returns dict(rgb [L,3] summed radiance, w [L] completed-sample
    counts, n_rays, started/done diagnostics, vertices: None or stacked
    [K, L] training records when cfg.record_vertices) and the carry.
    """
    if cfg.has_media:
        raise NotImplementedError("regen tracer: media scenes use "
                                  "wavefront.trace_paths")
    if cfg.sampler != "independent":
        raise NotImplementedError("regen tracer: QMC samplers use "
                                  "wavefront.trace_paths")
    f3 = lambda: jnp.zeros((L, 3), jnp.float32)
    guide = cfg.guiding and sdtree is not None
    if guide:
        from ..guiding import sdtree as G

    use_queue = n_film is not None
    ids = pix_start + jnp.arange(L)
    px = (ids % sensor.W).astype(jnp.float32)
    py = (ids // sensor.W).astype(jnp.float32)
    pos_base = jnp.stack([px, py], -1)

    # sample-block partitioning of queue items (see trace_regen doc):
    # item = pixel * n_blocks + block, each block ceil(spp / n_blocks)
    # samples (the last block takes the remainder)
    B_blk = (spp + n_blocks - 1) // n_blocks

    def _lane_spp(item):
        b = jnp.maximum(item, 0) % n_blocks
        return jnp.clip(spp - b * B_blk, 0, B_blk)

    def _item_pix(item):
        return jnp.maximum(item, 0) // n_blocks

    def queue_flush(c):
        """Bank every lane whose item completed all its samples into
        its next free slot; the banked lane drops its item (pix = -1)
        and resets its per-item accumulators."""
        pix, started, done = c["pix"], c["started"], c["done"]
        acc, acc2 = c["acc"], c["acc2"]
        flush = ((pix >= 0) & ~c["alive"] & (done >= _lane_spp(pix))
                 & (c["slot_i"] < n_slots))
        oh = flush[:, None] & (jnp.arange(n_slots)[None, :]
                               == c["slot_i"][:, None])
        slot_pix = jnp.where(oh, _item_pix(pix)[:, None], c["slot_pix"])
        entry = jnp.concatenate(
            [acc, acc2, done.astype(jnp.float32)[:, None],
             jnp.zeros((L, 1), jnp.float32)], -1)
        slot_acc = jnp.where(oh[..., None], entry[:, None, :], c["slot_acc"])
        f1 = flush[:, None]
        return dict(
            pix=jnp.where(flush, -1, pix),
            started=jnp.where(flush, 0, started),
            done=jnp.where(flush, 0, done),
            acc=jnp.where(f1, 0.0, acc), acc2=jnp.where(f1, 0.0, acc2),
            slot_pix=slot_pix, slot_acc=slot_acc,
            slot_i=c["slot_i"] + flush.astype(jnp.int32),
            qhead=c["qhead"])

    def queue_claim(q):
        """Hand queue-head pixels to pixel-less lanes (dense ranks via
        cumsum keep assignments unique and deterministic)."""
        claim = q["pix"] < 0
        rank = jnp.cumsum(claim.astype(jnp.int32)) - 1
        newp = q["qhead"] + rank
        ok = claim & (newp < qend)
        q = dict(q)
        q["pix"] = jnp.where(ok, newp, q["pix"])
        q["qhead"] = jnp.minimum(
            q["qhead"] + jnp.sum(claim.astype(jnp.int32)), qend)
        return q

    def regen_inputs(carry):
        """Section-1 bookkeeping shared by both bodies: returns (q,
        want, pos) where q carries the post-flush/claim per-pixel state
        (started/done/acc/acc2 + queue fields) and pos the pixel corner
        for camera-sample regeneration."""
        if use_queue:
            q = queue_claim(queue_flush(carry))
            want = ((q["pix"] >= 0) & ~carry["alive"]
                    & (q["started"] < _lane_spp(q["pix"])))
            rpix = _item_pix(q["pix"])
            pxq = (rpix % sensor.W).astype(jnp.float32)
            pyq = (rpix // sensor.W).astype(jnp.float32)
            pos = jnp.stack([pxq, pyq], -1)
        else:
            q = dict(started=carry["started"], done=carry["done"],
                     acc=carry["acc"], acc2=carry["acc2"])
            want = ~carry["alive"] & (carry["started"] < spp)
            pos = pos_base
        return q, want, pos

    def queue_out(q):
        return {k: q[k] for k in ("pix", "qhead", "slot_pix", "slot_acc",
                                  "slot_i")} if use_queue else {}
    # shades per path: maxDepth-1 like the classic loop (rRec.depth starts
    # at 1, sampling while depth < maxDepth); unlimited -> RR terminates
    max_shades = jnp.int32(2**30 if cfg.max_depth < 0 else cfg.max_depth - 1)

    n_emitter_slots = (scene.emitters.num + (1 if cfg.has_env else 0)
                       + scene.delta.num)

    lens = getattr(sensor, "needs_lens_sample", False)
    n_rand_cols = (2 + (2 if lens else 0) + (1 if cfg.has_mask else 0)
                   + (1 if cfg.has_blend else 0)
                   + (1 if cfg.has_coating else 0) + 3 + (2 if cfg.do_nee
                   else 0) + 1)
    if cfg.guiding and sdtree is not None and cfg.is_built:
        from ..guiding import sdtree as _G

        n_rand_cols += _G.MAX_Q_DEPTH + 2
    # shade-time splat-target precompute: stochastic jitters come from a
    # dedicated fold (NOT the shared rand block — widening the block
    # would change every column of the threefry draw and desync the
    # path sampling from the record-free/legacy configs)
    precompute_splat = (cfg.record_vertices and guide
                        and cfg.splat_spatial != "")

    def splat_targets(it, salt, rec, p_rec, d_rec, dtree_id, voxel, valid):
        """Resolve a record's splat targets at SHADE time (the fast
        path of guiding.sdtree.splat_records): the spatial leaf
        (jittered for the stochastic filter, Vertex::commit
        guided_path.cpp:1746-1762) and the BUILDING-tree directional
        cell. The building pool's topology is frozen during an
        iteration, so these walks — once per real vertex at wavefront
        width — replace the same walks over the 10-100x larger stacked
        record stream at splat time."""
        if cfg.splat_spatial == "stochastic":
            kj = jax.random.fold_in(jax.random.fold_in(key, 0x5B1A7), it)
            uj = jax.random.uniform(jax.random.fold_in(kj, salt),
                                    (valid.shape[0], 3))
            pj = jnp.clip(p_rec + (uj - 0.5) * voxel, sdtree.aabb_min,
                          sdtree.aabb_min + sdtree.aabb_size)
            sp_id, _ = G.lookup(sdtree, pj)
        else:
            sp_id = dtree_id
        sp_id = jnp.maximum(jnp.where(valid, sp_id, 0), 0)
        pc = G.dir_to_canonical(d_rec)
        pc = jnp.where(jnp.isfinite(pc), pc, 0.0)
        root = sdtree.db_root[sp_id]
        # 2-level packed building-tree walks (descend_cell_packed):
        # half the sequential gathers of the per-level originals
        node, quad, dep = G.descend_cell_packed(sdtree.qb_pack2, root, pc,
                                                None, sdtree.q_depth)
        rec["sp_id"] = sp_id
        if cfg.splat_dir == "box":
            # 4-corner box targets (sdtree.dtree_box_targets4): exact
            # overlap weights, fixed-trip walks — no dynamic stack
            cell4, w4 = G.dtree_box_targets4_packed(sdtree.qb_pack2, root,
                                                    pc, dep,
                                                    sdtree.q_depth)
            rec["cell4"] = cell4
            rec["w4"] = w4
        else:
            rec["cell"] = node * 4 + quad
        return rec

    def shade_hit(rng, it, alive, fresh, o, d, thr, eta, depth,
                  wo_pdf_prev, delta_prev, p_prev, cur,
                  tri2, t2, bu2, bv2, defer_shadow=False, row=None):
        """Sections 2+3 of the per-bounce body: emitter/env-hit MIS
        accumulation, surface shading, next-direction sampling, NEE and
        RR, for the lanes flagged `alive` (others inert). Shared by the
        classic per-bounce body and the budgeted segment machine (which
        passes defer_shadow=True: the NEE shadow ray is NOT traced here
        — its pre-visibility contribution and segment are returned for
        the machine to resolve across traversal windows). `row` lets
        the machine pass an already-gathered shade-table row (shared
        with the shadow-blocker phase); its contents only matter on
        lanes where tri2 >= 0."""

        hit = (tri2 >= 0) & alive
        escaped = alive & (tri2 < 0)
        tri2s = jnp.maximum(tri2, 0)
        if row is None:
            row = fetch_row(scene, tri2s)
        sh_n, geo_n, mid, eid, rad, uv, _med, dpdu, dpdv = decode_row(
            row, bu2, bv2)
        front = dot(sh_n, -d) > 0
        le = jnp.where((hit & (eid >= 0) & front)[..., None], rad, 0.0)
        if cfg.has_env:
            le = le + jnp.where(escaped[..., None],
                                EV.eval_env(scene.env, d), 0.0)
        hit_emitter = jnp.any(le > 0, axis=-1)
        p2 = o + t2[..., None] * d

        # MIS against NEE for non-fresh segments (guided_path.cpp:2083-2110)
        if cfg.do_nee:
            em_pdf = jnp.where(
                hit_emitter & ~delta_prev & ~fresh,
                E.pdf_direct(scene.emitters, jnp.where(hit, eid, -1), p2,
                             sh_n, p_prev, n_slots=n_emitter_slots),
                0.0)
            if cfg.has_env:
                em_pdf = jnp.where(
                    escaped & hit_emitter & ~delta_prev & ~fresh,
                    EV.pdf_direct(scene.env, d) / n_emitter_slots,
                    em_pdf)
        else:
            em_pdf = jnp.zeros(L)
        w_mis = jnp.where(fresh, 1.0, mi_weight(wo_pdf_prev, em_pdf))
        if cfg.hide_emitters:
            w_mis = jnp.where(fresh, 0.0, w_mis)
        slot = thr * le * w_mis[..., None]
        cur = cur + jnp.where(alive[..., None], slot, 0.0)
        n_rays_it = jnp.sum(alive.astype(jnp.int32))

        # -- 3. shade the hit (mirrors wavefront.body) --------------------
        can_shade = hit & (depth < max_shades)
        wi_dot_geo = -dot(geo_n, d)
        wi_dot_sh = -dot(sh_n, d)
        act = can_shade
        if cfg.strict_normals:
            act = act & (wi_dot_geo * wi_dot_sh >= 0)

        params = B.gather_params(scene.mats, mid)

        if cfg.has_vertexcolors:
            w0c = (1.0 - bu2 - bv2)[..., None]
            vcol = (row[:, 30:33] * w0c + row[:, 33:36] * bu2[..., None]
                    + row[:, 36:39] * bv2[..., None])
        else:
            vcol = None

        if cfg.has_wireframe:
            wf_tri = scene.geom.tri[tri2s]
        else:
            wf_tri = None

        duv = None
        if cfg.has_tex and cfg.has_tex_ewa \
                and hasattr(sensor, "dir_differentials"):
            # full uv Jacobian from transferred camera ray differentials
            # (EWA path, mipmap.h:640-713); bounce lanes get zero
            # gradients -> base-level lookups
            from ..scene.textures import uv_differentials

            duv = uv_differentials(sensor, d, t2, geo_n, dpdu, dpdv,
                                   fresh)
            foot_uv = None
        elif cfg.has_tex and hasattr(sensor, "footprint"):
            # primary (fresh) lanes carry camera ray differentials ->
            # MIP level; bounce lanes sample the base level (matching
            # the reference path tracer's camera-only differentials)
            foot_w = jnp.where(fresh, sensor.footprint(t2), 0.0)
            foot_uv = jnp.stack(
                [foot_w / jnp.maximum(
                    jnp.linalg.norm(dpdu, axis=-1), 1e-12),
                 foot_w / jnp.maximum(
                     jnp.linalg.norm(dpdv, axis=-1), 1e-12)], -1)
        else:
            foot_uv = None

        def tex_override(pr):
            if not cfg.has_tex:
                return pr
            n_slots_tex = scene.tex.vcflag.shape[0]
            fields = [("reflectance", "tex_reflectance")]
            if cfg.has_tex_opacity:
                fields.append(("opacity", "tex_opacity"))
            for field, tslot in fields:
                tid = pr[tslot]
                val = sample_atlas(scene.tex, tid + 1, uv, foot_uv,
                                   duv=duv)
                if cfg.has_vertexcolors:
                    is_vc = scene.tex.vcflag[
                        jnp.clip(tid + 1, 0, n_slots_tex - 1)]
                    val = jnp.where(is_vc[..., None], vcol, val)
                if cfg.has_wireframe:
                    from ..scene.textures import wireframe_color

                    is_wf = scene.tex.wfp[
                        jnp.clip(tid + 1, 0, n_slots_tex - 1), 0] >= 0
                    wcol = wireframe_color(scene.tex, tid + 1, wf_tri,
                                           bu2, bv2)
                    val = jnp.where(is_wf[..., None], wcol, val)
                pr[field] = jnp.where((tid >= 0)[..., None], val, pr[field])
            return pr

        params = tex_override(params)
        sh_n_s = sh_n
        if cfg.has_bump:
            from ..scene.textures import perturb_normal

            sh_n_s = perturb_normal(
                scene.tex, params["tex_bump"] + 1, params["bump_is_normal"],
                uv, sh_n, dpdu, dpdv)
        smooth, delta_only, _, transmissive = B.lane_flags(params)

        if cfg.has_mask:
            is_mask = params["mtype"] == MAT_MASK
            opacity = params["opacity"]
            prob = jnp.clip(
                opacity[..., 0] * 0.212671 + opacity[..., 1] * 0.715160
                + opacity[..., 2] * 0.072169, 1e-6, 1.0 - 1e-6)
            u_m = rng.take(flat=True)
            go_nested = is_mask & (u_m < prob)
            pass_thru = is_mask & (u_m >= prob)
            mid_n = jnp.where(is_mask, jnp.maximum(params["nested"], 0), mid)
            params_n = tex_override(B.gather_params(scene.mats, mid_n))
            params = jax.tree.map(
                lambda a, b: jnp.where(
                    is_mask.reshape(is_mask.shape + (1,) * (a.ndim - 1)),
                    a, b),
                params_n, params)
            sm_n, do_n, _, _ = B.lane_flags(params)
            smooth = jnp.where(is_mask, sm_n, smooth)
            delta_only = jnp.where(is_mask, do_n, delta_only)
            transmissive = transmissive | is_mask
            f_scale = jnp.where(is_mask[..., None], opacity, 1.0)
            p_scale = jnp.where(is_mask, prob, 1.0)
        else:
            is_mask = pass_thru = go_nested = None
            f_scale = p_scale = opacity = prob = None

        def mask_sample(wo_t, w_t, pdf_t, delta_t, eta_t, wi_local):
            if not cfg.has_mask:
                return wo_t, w_t, pdf_t, delta_t, eta_t
            w_t = jnp.where(
                go_nested[..., None],
                w_t * opacity / jnp.maximum(prob, 1e-9)[..., None], w_t)
            pdf_t = jnp.where(go_nested, pdf_t * prob, pdf_t)
            wo_t = jnp.where(pass_thru[..., None], -wi_local, wo_t)
            w_t = jnp.where(
                pass_thru[..., None],
                (1.0 - opacity) / jnp.maximum(1.0 - prob, 1e-9)[..., None],
                w_t)
            pdf_t = jnp.where(pass_thru, 1.0 - prob, pdf_t)
            delta_t = delta_t | pass_thru
            eta_t = jnp.where(pass_thru, 1.0, eta_t)
            return wo_t, w_t, pdf_t, delta_t, eta_t

        if cfg.has_blend:
            from ..scene.scene import MAT_BLEND

            is_blend = params["mtype"] == MAT_BLEND
            w_bl = params["blend_w"]
            mid_a = jnp.where(is_blend, jnp.maximum(params["nested"], 0), mid)
            mid_b = jnp.where(is_blend, jnp.maximum(params["nested2"], 0), mid)
            params_a = tex_override(B.gather_params(scene.mats, mid_a))
            params_b = tex_override(B.gather_params(scene.mats, mid_b))
            u_bl = rng.take(flat=True)
            pick_b2 = is_blend & (u_bl < w_bl)
            params = jax.tree.map(
                lambda pa, pb, pr: jnp.where(
                    pick_b2.reshape(pick_b2.shape + (1,) * (pa.ndim - 1)), pb,
                    jnp.where(
                        is_blend.reshape(
                            is_blend.shape + (1,) * (pa.ndim - 1)), pa, pr)),
                params_a, params_b, params)
            sm_a, do_a, _, tr_a = B.lane_flags(params_a)
            sm_b, do_b, _, tr_b = B.lane_flags(params_b)
            smooth = jnp.where(is_blend, sm_a | sm_b, smooth)
            delta_only = jnp.where(is_blend, do_a & do_b, delta_only)
            transmissive = jnp.where(is_blend, tr_a | tr_b, transmissive)
        else:
            is_blend = None

        if cfg.has_coating:
            from ..bsdf import layered as LY

            is_coat = ((params["mtype"] == MAT_COATING)
                       | (params["mtype"] == MAT_ROUGHCOATING))
            is_rough_coat = params["mtype"] == MAT_ROUGHCOATING
            mid_c = jnp.where(is_coat, jnp.maximum(params["nested"], 0), mid)
            params_c = tex_override(B.gather_params(scene.mats, mid_c))
            sm_c, do_c, _, tr_c = B.lane_flags(params_c)
            smooth = jnp.where(is_coat, sm_c | is_rough_coat, smooth)
            delta_only = jnp.where(is_coat, do_c & ~is_rough_coat, delta_only)
            transmissive = jnp.where(is_coat, tr_c, transmissive)
            u_coat = rng.take(1)
        else:
            is_coat = None

        def eval_b(wi_l, wo_l):
            f = B.eval_bsdf(params, wi_l, wo_l, present=scene.mats.present)
            if cfg.has_blend:
                fa = B.eval_bsdf(params_a, wi_l, wo_l,
                                 present=scene.mats.present)
                fb = B.eval_bsdf(params_b, wi_l, wo_l,
                                 present=scene.mats.present)
                fmix = (1 - w_bl)[..., None] * fa + w_bl[..., None] * fb
                f = jnp.where(is_blend[..., None], fmix, f)
            if cfg.has_coating:
                fc, _ = LY.eval_pdf(params, params_c, wi_l, wo_l,
                                    present=scene.mats.present)
                f = jnp.where(is_coat[..., None], fc, f)
            return f * f_scale if cfg.has_mask else f

        def pdf_b(wi_l, wo_l):
            q = B.pdf_bsdf(params, wi_l, wo_l, present=scene.mats.present)
            if cfg.has_blend:
                qa = B.pdf_bsdf(params_a, wi_l, wo_l,
                                present=scene.mats.present)
                qb = B.pdf_bsdf(params_b, wi_l, wo_l,
                                present=scene.mats.present)
                q = jnp.where(is_blend, (1 - w_bl) * qa + w_bl * qb, q)
            if cfg.has_coating:
                _, qc = LY.eval_pdf(params, params_c, wi_l, wo_l,
                                    present=scene.mats.present)
                q = jnp.where(is_coat, qc, q)
            return q * p_scale if cfg.has_mask else q

        def coat_fix(wo_t, w_t, pdf_t, delta_t, eta_t, wi_local, ua):
            if not cfg.has_coating:
                return wo_t, w_t, pdf_t, delta_t, eta_t
            u4 = jnp.concatenate([ua, u_coat], -1)
            wo_c2, w_c2, pdf_c2, d_c2, e_c2 = LY.sample(
                params, params_c, wi_local, u4, present=scene.mats.present)
            return (jnp.where(is_coat[..., None], wo_c2, wo_t),
                    jnp.where(is_coat[..., None], w_c2, w_t),
                    jnp.where(is_coat, pdf_c2, pdf_t),
                    jnp.where(is_coat, d_c2, delta_t),
                    jnp.where(is_coat, e_c2, eta_t))

        def blend_fix(wo_t, w_t, pdf_t, wi_local):
            if not cfg.has_blend:
                return w_t, pdf_t
            fmix = eval_b(wi_local, wo_t)
            pmix = pdf_b(wi_local, wo_t)
            w_mix = jnp.where(
                pmix[..., None] > 0,
                fmix / jnp.maximum(pmix, 1e-38)[..., None], 0.0)
            w_t = jnp.where(is_blend[..., None], w_mix, w_t)
            pdf_t = jnp.where(is_blend, pmix, pdf_t)
            return w_t, pdf_t

        s_ax, t_ax = build_frame(sh_n_s)
        wi = to_local(s_ax, t_ax, sh_n_s, -d)

        if guide:
            dtree_id, voxel = G.lookup(sdtree, p2)
            has_tree = smooth
            dtree_id = jnp.where(has_tree, dtree_id, -1)
            if cfg.learn_fraction:
                frac = G.sampling_fraction(sdtree, dtree_id)
                frac = jnp.where(has_tree, frac, cfg.bsdf_fraction)
            else:
                frac = jnp.full(L, cfg.bsdf_fraction)
        else:
            dtree_id = jnp.full(L, -1, jnp.int32)
            voxel = jnp.ones((L, 3), jnp.float32)
            frac = jnp.full(L, cfg.bsdf_fraction)

        u_bsdf = rng.take(3)
        if guide and cfg.is_built:
            use_guide_mix = (dtree_id >= 0) & ~delta_only
            pick_bsdf = u_bsdf[:, 0] < frac
            ua = jnp.stack(
                [jnp.clip(u_bsdf[:, 0] / jnp.maximum(frac, 1e-9),
                          0.0, 1.0 - 1e-7),
                 u_bsdf[:, 1], u_bsdf[:, 2]], -1)
            wo_a, w_a, pdf_a, delta_a, eta_a = coat_fix(
                *mask_sample(
                    *B.sample_bsdf(params, wi, ua,
                                   present=scene.mats.present), wi),
                wi, ua)
            if cfg.has_blend:
                w_a, pdf_a = blend_fix(wo_a, w_a, pdf_a, wi)
            u_tree = rng.take(G.MAX_Q_DEPTH + 2)
            # fused sample+pdf walk: bsdf-picked lanes point-descend
            # their own sampled direction in the SAME gather chain the
            # tree-picked lanes cdf-walk (one chain per bounce, not two);
            # the per-dtree scalars come from ONE d_meta row gather
            is_point = pick_bsdf | ~use_guide_mix
            wo_world_a = to_world(s_ax, t_ax, sh_n_s, wo_a)
            d_root, d_uni, _ = G.dtree_meta(sdtree, dtree_id)
            d_tree, dtree_pdf = G.sample_pdf_dir(
                sdtree, jnp.maximum(dtree_id, 0), u_tree, is_point,
                G.dir_to_canonical(wo_world_a), root=d_root,
                uniform=d_uni)
            wo_b = to_local(s_ax, t_ax, sh_n_s, d_tree)

            wo = jnp.where(is_point[..., None], wo_a, wo_b)
            sampled_delta = jnp.where(use_guide_mix, delta_a & pick_bsdf,
                                      delta_a)
            eta_s = jnp.where(use_guide_mix & ~pick_bsdf, 1.0, eta_a)

            bsdf_pdf = pdf_b(wi, wo)
            f_cos = eval_b(wi, wo)
            wo_world = to_world(s_ax, t_ax, sh_n_s, wo)
            wo_pdf = frac * bsdf_pdf + (1 - frac) * dtree_pdf
            wo_pdf = jnp.where(sampled_delta, pdf_a * frac, wo_pdf)
            dtree_pdf = jnp.where(sampled_delta, 0.0, dtree_pdf)
            bsdf_pdf = jnp.where(sampled_delta, pdf_a, bsdf_pdf)
            value = jnp.where(
                sampled_delta[..., None], w_a * pdf_a[..., None], f_cos)
            bsdf_weight = jnp.where(
                wo_pdf[..., None] > 0,
                value / jnp.maximum(wo_pdf, 1e-38)[..., None], 0.0)
            bsdf_weight = jnp.where(use_guide_mix[..., None],
                                    bsdf_weight, w_a)
            wo_pdf = jnp.where(use_guide_mix, wo_pdf, pdf_a)
            bsdf_pdf = jnp.where(use_guide_mix, pdf_a, bsdf_pdf)
            dtree_pdf = jnp.where(use_guide_mix, dtree_pdf, 0.0)
        else:
            wo, bsdf_weight, bsdf_pdf, sampled_delta, eta_s = coat_fix(
                *mask_sample(
                    *B.sample_bsdf(params, wi, u_bsdf,
                                   present=scene.mats.present), wi),
                wi, u_bsdf)
            if cfg.has_blend:
                bsdf_weight, bsdf_pdf = blend_fix(wo, bsdf_weight,
                                                  bsdf_pdf, wi)
            wo_pdf = bsdf_pdf
            dtree_pdf = jnp.zeros(L)
        wo_world = to_world(s_ax, t_ax, sh_n_s, wo)

        # -- NEE ----------------------------------------------------------
        nee_rec = None
        if cfg.do_nee:
            u_nee = rng.take(2)
            ref_n = jnp.where(transmissive[..., None], 0.0, sh_n_s)
            ds, _ = _sample_emitters(scene, cfg, p2, ref_n, u_nee)
            nee_ok = act & smooth & (ds["pdf"] > 0)
            wo_nee = to_local(s_ax, t_ax, sh_n_s, ds["d"])
            if cfg.strict_normals:
                nee_ok = nee_ok & (dot(geo_n, ds["d"]) * wo_nee[..., 2] > 0)
            f_nee = eval_b(wi, wo_nee)
            bsdf_pdf_nee = pdf_b(wi, wo_nee)
            if guide and cfg.is_built:
                dtree_pdf_nee = G.pdf_dir2(
                    sdtree, jnp.maximum(dtree_id, 0), ds["d"],
                    root=d_root, uniform=d_uni)
                wo_pdf_nee = jnp.where(
                    (dtree_id >= 0) & ~delta_only,
                    frac * bsdf_pdf_nee + (1 - frac) * dtree_pdf_nee,
                    bsdf_pdf_nee)
            else:
                dtree_pdf_nee = jnp.zeros(L)
                wo_pdf_nee = bsdf_pdf_nee
            so = p2 + jnp.sign(wi_dot_geo)[..., None] * geo_n * scene.eps
            sh_tmax = jnp.where(
                nee_ok, ds["dist"] * (1 - SHADOW_EPS) - scene.eps, -1.0)
            if defer_shadow:
                # machine mode: the caller traces the shadow segment
                # across windows; return the pre-visibility contribution
                w_mis_n = jnp.where(ds["discrete"], 1.0,
                                    mi_weight(ds["pdf"], wo_pdf_nee))
                l_nee = thr * ds["value"] * f_nee * w_mis_n[..., None]
                l_nee = jnp.where(nee_ok[..., None], l_nee, 0.0)
                n_rays_it = n_rays_it + jnp.sum(
                    (act & smooth).astype(jnp.int32))
                nee_so, nee_d = so, ds["d"]
                nee_tmax = jnp.where(nee_ok, sh_tmax, -1.0)
            elif cfg.has_mask or cfg.has_null:
                # evalTransmittance walk through null/mask ENull lobes
                # (scene.cpp:619-679); see wavefront.shadow_transmittance
                from .wavefront import shadow_transmittance

                max_inter = (jnp.full(L, -1, jnp.int32)
                             if cfg.max_depth < 0 else
                             jnp.int32(cfg.max_depth) - (depth + 1) - 1)
                t_sh = shadow_transmittance(
                    scene, cfg, so, ds["d"], jnp.maximum(sh_tmax, 0.0),
                    None, jax.random.fold_in(key, it), nee_ok,
                    max_inter=max_inter)
                nee_ok = nee_ok & jnp.any(t_sh > 0, -1)
            else:
                occluded = any_hit(scene.geom, so, ds["d"],
                                   jnp.full(L, 0.0), sh_tmax)
                nee_ok = nee_ok & ~occluded
                t_sh = None
            if not defer_shadow:
                w_mis_n = jnp.where(ds["discrete"], 1.0,
                                    mi_weight(ds["pdf"], wo_pdf_nee))
                l_nee = thr * ds["value"] * f_nee * w_mis_n[..., None]
                if t_sh is not None:
                    l_nee = l_nee * t_sh
                l_nee = jnp.where(nee_ok[..., None], l_nee, 0.0)
                cur = cur + l_nee
                n_rays_it = n_rays_it + jnp.sum(
                    (act & smooth).astype(jnp.int32))
                nee_so = nee_d = None
                nee_tmax = None
            if cfg.record_vertices:
                nee_valid = nee_ok & (dtree_id >= 0)
                nee_rec = dict(
                    radiance=l_nee,
                    throughput=(thr * f_nee
                                / jnp.maximum(ds["pdf"], 1e-38)[..., None]),
                    bsdf_val=f_nee, wo_pdf=ds["pdf"], bsdf_pdf=bsdf_pdf_nee,
                    dtree_pdf=dtree_pdf_nee, valid=nee_valid)
                if precompute_splat:
                    nee_rec = splat_targets(it, 29, nee_rec, p2, ds["d"],
                                            dtree_id, voxel, nee_valid)
                else:
                    nee_rec.update(p=p2, d=ds["d"], dtree_id=dtree_id,
                                   voxel=voxel)
        else:
            l_nee = jnp.zeros((L, 3), jnp.float32)
            nee_so = nee_d = None
            nee_tmax = None

        # -- continue the path ---------------------------------------------
        nonzero = jnp.any(bsdf_weight > 0, axis=-1) & (wo_pdf > 0)
        act_c = act & nonzero
        if cfg.strict_normals:
            act_c = act_c & (dot(geo_n, wo_world) * wo[..., 2] > 0)

        # ENull transitions (guided_path.cpp:2045-2075): a sampled
        # pass-through (null BSDF, or the mask's 1-opacity lobe) carries
        # the LAST REAL scatter's MIS state forward — otherwise the
        # emitter hit beyond the panel scores weight 1 (delta) while NEE
        # also samples it, double-counting (the reference pairs the hit
        # against NEE via rayIntersectAndLookForEmitter's null walk)
        null_trans = jnp.zeros(L, bool)
        if cfg.has_null:
            null_trans = params["mtype"] == MAT_NULL
        if cfg.has_mask:
            null_trans = null_trans | pass_thru
        null_trans = null_trans & act_c

        thr2 = thr * bsdf_weight
        eta2 = eta * eta_s
        o2 = p2 + jnp.sign(dot(geo_n, wo_world))[..., None] * geo_n * scene.eps
        depth2 = depth + 1  # rRec.depth of the shade just done

        # russian roulette (guided_path.cpp:2124-2142); the reference's
        # ENull branch `continue`s before the RR block, so pass-through
        # transitions are never roulette-terminated
        rr_on = (depth2 >= cfg.rr_depth) & ~null_trans
        if cfg.guiding:
            has_tree_rr = (dtree_id >= 0) & ~sampled_delta
            if cfg.is_built:
                sp_tree = jnp.full(L, 0.99)
            else:
                sp_tree = jnp.clip(jnp.max(thr2, axis=-1) * eta2 * eta2,
                                   0.1, 0.99)
            sp = jnp.where(has_tree_rr, sp_tree, 1.0)
        else:
            sp = jnp.minimum(jnp.max(thr2, axis=-1) * eta2 * eta2, 0.95)
        u_rr = rng.take(flat=True)
        sp_eff = jnp.where(rr_on, sp, 1.0)
        alive2 = act_c & (u_rr < sp_eff)
        thr2 = thr2 / jnp.maximum(sp_eff, 1e-9)[..., None]

        # vertex record for this shade (committed via segmented suffix sum)
        if cfg.record_vertices:
            v_valid = act_c & (dtree_id >= 0) & (wo_pdf > 0)
            if not cfg.learn_fraction:
                v_valid = v_valid & ~sampled_delta
            vert = dict(
                throughput=thr2,
                bsdf_val=bsdf_weight * wo_pdf[..., None],
                wo_pdf=wo_pdf, bsdf_pdf=bsdf_pdf, dtree_pdf=dtree_pdf,
                is_delta=sampled_delta, valid=v_valid)
            if precompute_splat:
                vert = splat_targets(it, 23, vert, o2, wo_world, dtree_id,
                                     voxel, v_valid)
            else:
                vert.update(p=o2, d=wo_world, dtree_id=dtree_id,
                            voxel=voxel)
        else:
            vert = None

        return dict(
            cur=cur, slot=slot, n_rays_it=n_rays_it, alive2=alive2,
            thr2=thr2, eta2=eta2, o2=o2, wo_world=wo_world, depth2=depth2,
            keep_mis=null_trans, wo_pdf=wo_pdf, sampled_delta=sampled_delta,
            p2=p2, vert=vert, nee_rec=nee_rec, l_nee=l_nee,
            nee_so=nee_so, nee_d=nee_d, nee_tmax=nee_tmax)


    def body(carry, it):
        rng = _RandBlock(key, it, L, n_rand_cols)
        # -- 1. regenerate finished lanes with their next camera sample --
        q, want, pos1 = regen_inputs(carry)
        jit2 = rng.take(2)
        u_lens = rng.take(2) if lens else None
        o_c, d_c, tmin_c, tmax_c = sensor.sample_rays(pos1 + jit2, u_lens)
        w1 = want[..., None]

        o = jnp.where(w1, o_c, carry["o"])
        d = jnp.where(w1, d_c, carry["d"])
        tmin = jnp.where(want, tmin_c, 0.0)
        tmax = jnp.where(want, tmax_c, 3.4e38)
        thr = jnp.where(w1, 1.0, carry["thr"])
        eta = jnp.where(want, 1.0, carry["eta"])
        wo_pdf_prev = jnp.where(want, 0.0, carry["wo_pdf_prev"])
        delta_prev = jnp.where(want, False, carry["delta_prev"])
        depth = jnp.where(want, 0, carry["depth"])
        fresh = want | (carry["fresh"] & carry["alive"])
        cur = jnp.where(w1, 0.0, carry["cur"])
        p_prev = jnp.where(w1, o_c, carry["p_prev"])
        started = q["started"] + want.astype(jnp.int32)
        alive = carry["alive"] | want

        # -- 2. intersect every pending ray -------------------------------
        tri2, t2, bu2, bv2 = closest_hit(
            scene.geom, o, d, tmin, jnp.where(alive, tmax, -1.0))
        R = shade_hit(rng, it, alive, fresh, o, d, thr, eta, depth,
                      wo_pdf_prev, delta_prev, p_prev, cur,
                      tri2, t2, bu2, bv2)
        cur = R["cur"]
        alive2 = R["alive2"]
        l_nee = R["l_nee"]

        # -- commit finished samples ----------------------------------------
        died = alive & ~alive2
        acc = q["acc"] + jnp.where(died[..., None], cur, 0.0)
        # per-sample squared accumulation for the variance estimator
        # (performRenderPasses' squaredImage, guided_path.cpp:1288-1319)
        acc2 = q["acc2"] + jnp.where(died[..., None], cur * cur, 0.0)
        done = q["done"] + died.astype(jnp.int32)

        keep_mis = R["keep_mis"]  # ENull transition: MIS state survives
        new_carry = dict(
            started=started, done=done, acc=acc, acc2=acc2, cur=cur,
            alive=alive2, fresh=fresh & keep_mis,
            o=jnp.where(alive2[..., None], R["o2"], o),
            d=jnp.where(alive2[..., None], R["wo_world"], d),
            p_prev=jnp.where((alive2 & ~keep_mis)[..., None], R["p2"],
                             p_prev),
            thr=R["thr2"], eta=R["eta2"],
            wo_pdf_prev=jnp.where(keep_mis, wo_pdf_prev, R["wo_pdf"]),
            delta_prev=jnp.where(keep_mis, delta_prev,
                                 R["sampled_delta"]),
            depth=R["depth2"],
            n_rays=carry["n_rays"] + R["n_rays_it"],
            vsum=carry["vsum"] + jnp.sum(jnp.where(died, R["depth2"], 0)),
            **queue_out(q),
        )
        hit_light = jnp.where(alive[..., None], R["slot"], 0.0)
        outs = dict(slot=hit_light + (l_nee if cfg.do_nee else 0.0),
                    fresh=fresh, vert=R["vert"], nee=R["nee_rec"])
        if cfg.record_vertices and cfg.nee_always:
            outs["hitlight"] = hit_light
        return new_carry, outs

    def machine_body(carry, it):
        """Budgeted segment machine (record-free): one iteration = a
        SEG_B-step traversal window over every lane's CURRENT segment
        (camera/bounce closest-hit or NEE shadow walk), then masked
        completion processing. Lanes advance independently — a lane
        whose walk ends switches segment the same iteration while
        neighbours keep stepping — so traversal utilization tracks the
        MEAN walk length instead of the wavefront max (profiled 10-32%
        worst-lane utilization on 1M-triangle scenes). The window is
        issued as MACHINE_GROUPS independent sub-pool steps per
        iteration: the row gathers of different groups overlap in the
        memory system (~2x lower effective ns/lane, measured).

        The NEE shadow walk doubles as the reference's evalTransmittance
        null/mask chain (scene.cpp:619-679): a blocker with an ENull
        lobe multiplies the pending contribution by its discrete
        transmittance and the walk restarts past it, so mask/null
        scenes get exact attenuated NEE without a separate pass."""
        rng = _RandBlock(key, it, L, n_rand_cols)
        # -- 1. regenerate lanes with no sample in flight ------------------
        q, want, pos1 = regen_inputs(carry)
        jit2 = rng.take(2)
        u_lens = rng.take(2) if lens else None
        o_c, d_c, tmin_c, tmax_c = sensor.sample_rays(pos1 + jit2, u_lens)
        w1 = want[..., None]
        o = jnp.where(w1, o_c, carry["o"])
        d = jnp.where(w1, d_c, carry["d"])
        tmin = jnp.where(want, tmin_c, carry["tmin"])
        tmax = jnp.where(want, tmax_c, carry["tmax"])
        thr = jnp.where(w1, 1.0, carry["thr"])
        eta = jnp.where(want, 1.0, carry["eta"])
        wo_pdf_prev = jnp.where(want, 0.0, carry["wo_pdf_prev"])
        delta_prev = jnp.where(want, False, carry["delta_prev"])
        depth = jnp.where(want, 0, carry["depth"])
        fresh = want | (carry["fresh"] & carry["alive"])
        cur = jnp.where(w1, 0.0, carry["cur"])
        p_prev = jnp.where(w1, o_c, carry["p_prev"])
        started = q["started"] + want.astype(jnp.int32)
        alive = carry["alive"] | want
        seg_shadow = jnp.where(want, False, carry["seg_shadow"])
        tst = bvh_state_reset(carry["tst"], want, want)
        n_new = jnp.sum(want.astype(jnp.int32))

        # -- 2. traversal window ------------------------------------------
        stopm = None if mask_walk else seg_shadow
        G = MACHINE_GROUPS if L % MACHINE_GROUPS == 0 else 1
        Lg = L // G
        if G > 1:
            def win(i, subs):
                return tuple(stp(s) for stp, s in zip(steps, subs))

            # the state's `it` counter is 0-d: shared, not sliced
            sl = lambda a, g: a if jnp.ndim(a) == 0 else \
                jax.lax.slice_in_dim(a, g * Lg, (g + 1) * Lg)
            subs, steps = [], []
            for g in range(G):
                subs.append(jax.tree.map(lambda a: sl(a, g), tst))
                steps.append(bvh_step_factory(
                    scene.geom, sl(o, g), sl(d, g), sl(tmin, g),
                    sl(tmax, g),
                    stopm=None if stopm is None else sl(stopm, g)))
            subs = jax.lax.fori_loop(0, SEG_B, win, tuple(subs))
            tst = jax.tree.map(
                lambda *xs: xs[0] if jnp.ndim(xs[0]) == 0
                else jnp.concatenate(xs, axis=0), *subs)
        else:
            step = bvh_step_factory(scene.geom, o, d, tmin, tmax,
                                    stopm=stopm)
            tst = jax.lax.fori_loop(0, SEG_B, lambda _i, s: step(s), tst)
        seg_done = alive & (tst["cur"] < 0)

        # ONE shade-table gather serves both completion phases: the
        # shadow-blocker decode (sd lanes) and the bounce-hit shade (bd
        # lanes) read disjoint lanes of the same [T,30] row fetch, and
        # that fetch is the single most expensive op of the fixed
        # per-iteration cost (~2.3 ms at 64k lanes on 1M-row tables)
        rowm = fetch_row(scene, jnp.maximum(tst["best_i"], 0))

        # -- 3. shadow-segment completion ---------------------------------
        sd = seg_done & seg_shadow
        sh_hit = sd & (tst["best_i"] >= 0)
        l_nee = carry["l_nee"]
        sh_budget = carry["sh_budget"]
        if mask_walk and cfg.do_nee:
            # nearest blocker: ENull lobes transmit (null: x1, mask:
            # x(1 - opacity) at the hit uv), anything else blocks.
            # Without NEE no shadow segments ever exist, so the whole
            # phase (incl. its material/atlas lookups) compiles away.
            _, _, midw, _, _, uvw, _, _, _ = decode_row(
                rowm, tst["best_u"], tst["best_v"])
            mrow = _stg(scene.mats.packed, midw)
            mtw = jax.lax.bitcast_convert_type(mrow[:, 0], jnp.int32)
            passthru = (((mtw == MAT_NULL) | (mtw == MAT_MASK))
                        & (sh_budget != 0))
            opac = mrow[:, 23:26]
            if cfg.has_tex and cfg.has_tex_opacity:
                tidw = jax.lax.bitcast_convert_type(mrow[:, 34], jnp.int32)
                tval = sample_atlas(scene.tex, tidw + 1, uvw, None)
                opac = jnp.where((tidw >= 0)[..., None], tval, opac)
            l_nee = jnp.where((sh_hit & (mtw == MAT_MASK))[..., None],
                              l_nee * (1.0 - opac), l_nee)
            l_nee = jnp.where((sh_hit & ~passthru)[..., None], 0.0, l_nee)
            cont = sh_hit & passthru & jnp.any(l_nee > 0, -1)
            tmin = jnp.where(cont, tst["best_t"] + scene.eps, tmin)
            sh_budget = jnp.where(cont, sh_budget - 1, sh_budget)
            tst = bvh_state_reset(tst, cont, cont)
        else:
            l_nee = jnp.where(sh_hit[..., None], 0.0, l_nee)
            cont = jnp.zeros(L, bool)
        resolved = sd & ~cont
        cur = cur + jnp.where(resolved[..., None], l_nee, 0.0)
        to_bounce = resolved & carry["qalive"]
        dies_sh = resolved & ~carry["qalive"]
        o = jnp.where(to_bounce[..., None], carry["qo"], o)
        d = jnp.where(to_bounce[..., None], carry["qd"], d)
        tmin = jnp.where(to_bounce, 0.0, tmin)
        tmax = jnp.where(to_bounce, 3.4e38, tmax)
        seg_shadow = seg_shadow & ~resolved
        tst = bvh_state_reset(tst, to_bounce, to_bounce)
        n_new = n_new + jnp.sum(to_bounce.astype(jnp.int32))

        # -- 4. bounce-segment completion: shade --------------------------
        bd = seg_done & ~sd
        R = shade_hit(rng, it, bd, fresh, o, d, thr, eta, depth,
                      wo_pdf_prev, delta_prev, p_prev, cur,
                      jnp.where(bd, tst["best_i"], -1), tst["best_t"],
                      tst["best_u"], tst["best_v"], defer_shadow=True,
                      row=rowm)
        cur = R["cur"]
        if cfg.do_nee:
            has_nee = bd & (R["nee_tmax"] > 0) & jnp.any(R["l_nee"] > 0, -1)
            l_nee = jnp.where(bd[..., None], R["l_nee"], l_nee)
            seg_shadow = seg_shadow | has_nee
            o = jnp.where(has_nee[..., None], R["nee_so"], o)
            d = jnp.where(has_nee[..., None], R["nee_d"], d)
            tmin = jnp.where(has_nee, 0.0, tmin)
            tmax = jnp.where(has_nee, R["nee_tmax"], tmax)
            sh_budget = jnp.where(
                bd,
                (-1 if cfg.max_depth < 0
                 else jnp.int32(cfg.max_depth) - R["depth2"] - 1),
                sh_budget)
        else:
            has_nee = jnp.zeros(L, bool)
        qo = jnp.where(bd[..., None], R["o2"], carry["qo"])
        qd = jnp.where(bd[..., None], R["wo_world"], carry["qd"])
        qalive = jnp.where(bd, R["alive2"], carry["qalive"])
        direct_b = bd & ~has_nee & R["alive2"]
        o = jnp.where(direct_b[..., None], R["o2"], o)
        d = jnp.where(direct_b[..., None], R["wo_world"], d)
        tmin = jnp.where(direct_b, 0.0, tmin)
        tmax = jnp.where(direct_b, 3.4e38, tmax)
        dies_bd = bd & ~has_nee & ~R["alive2"]
        tst = bvh_state_reset(tst, has_nee | direct_b, has_nee | direct_b)
        n_new = (n_new + jnp.sum(direct_b.astype(jnp.int32))
                 + R["n_rays_it"] - jnp.sum(bd.astype(jnp.int32)))

        # record stream (training): one vertex row per shade, one slot
        # row per iteration — the same (slot, fresh, vert) stream shape
        # as the classic body, so the segmented suffix-sum radiance and
        # the splat path apply unchanged. Machine-record mode is gated
        # to nee=never (trace_regen): with NEE the pending l_nee would
        # resolve at a LATER iteration than its vertex's row and the
        # own-NEE exclusion of guided_path.cpp's vertex ordering would
        # need cross-iteration corrections.
        if cfg.record_vertices:
            outs = dict(slot=jnp.where(bd[..., None], R["slot"], 0.0),
                        fresh=fresh, vert=R["vert"], nee=R["nee_rec"])
        else:
            outs = None

        # -- 5. path-state updates for shaded lanes ------------------------
        keep = R["keep_mis"]
        thr = jnp.where(bd[..., None], R["thr2"], thr)
        eta = jnp.where(bd, R["eta2"], eta)
        depth = jnp.where(bd, R["depth2"], depth)
        wo_pdf_prev = jnp.where(
            bd, jnp.where(keep, wo_pdf_prev, R["wo_pdf"]), wo_pdf_prev)
        delta_prev = jnp.where(
            bd, jnp.where(keep, delta_prev, R["sampled_delta"]), delta_prev)
        p_prev = jnp.where((bd & ~keep)[..., None], R["p2"], p_prev)
        fresh = jnp.where(bd, fresh & keep, fresh)

        # -- 6. commit finished samples ------------------------------------
        died = dies_sh | dies_bd
        alive2 = alive & ~died
        acc = q["acc"] + jnp.where(died[..., None], cur, 0.0)
        acc2 = q["acc2"] + jnp.where(died[..., None], cur * cur, 0.0)
        done = q["done"] + died.astype(jnp.int32)
        new_carry = dict(
            started=started, done=done, acc=acc, acc2=acc2, cur=cur,
            alive=alive2, fresh=fresh & alive2,
            o=o, d=d, tmin=tmin, tmax=tmax, p_prev=p_prev,
            thr=thr, eta=eta, wo_pdf_prev=wo_pdf_prev,
            delta_prev=delta_prev, depth=depth,
            n_rays=carry["n_rays"] + n_new,
            vsum=carry["vsum"] + jnp.sum(jnp.where(died, depth, 0)),
            tst=tst, seg_shadow=seg_shadow, l_nee=l_nee,
            qo=qo, qd=qd, qalive=qalive, sh_budget=sh_budget,
            mi=carry["mi"] + 1,
            mi_alive=carry["mi_alive"] + jnp.sum(alive.astype(jnp.int32)),
            mi_walks=carry["mi_walks"] + jnp.sum(seg_done.astype(jnp.int32)),
            **queue_out(q),
        )
        return new_carry, outs

    big_scene = (scene.geom.num_tris > BRUTE_MAX or cfg.force_machine)
    # training (record) mode rides the segment machine too when there is
    # no NEE: the (slot, fresh, vert) stream it emits per iteration is
    # suffix-sum compatible with the classic body's, and on BVH scenes
    # the machine's budgeted windows track MEAN walk length instead of
    # the wavefront-max of the classic run-to-completion closest_hit
    # (kitchen training measured ~4x fewer row gathers per bounce)
    use_machine = (not cfg.force_classic and big_scene
                   and (not cfg.record_vertices or not cfg.do_nee))
    if use_machine:
        from ..core.vecmath import small_table_gather as _stg

        mask_walk = cfg.has_mask or cfg.has_null
        carry0 = carry if carry is not None else init_carry(
            L, machine_sd=scene.geom.stack_depth, n_film=n_film,
            qstart=qstart, n_slots=n_slots)
    else:
        carry0 = carry if carry is not None else init_carry(
            L, n_film=n_film, qstart=qstart, n_slots=n_slots)
    if use_queue:
        # the film is only touched by the dispatch-end slot scatter —
        # keep it out of the loop carry
        carry0 = dict(carry0)
        film = carry0.pop("film")
    if not cfg.record_vertices:
        # no stacked per-iteration outputs needed: run the whole chunk in
        # ONE dispatch with an early-exit while_loop (every scan-style
        # continuation dispatch pays a host-sync RTT on the TPU tunnel).
        # The while body runs a BLK-iteration inner scan: a bare while
        # iteration pays ~2 ms of loop/cond overhead on TPU, so the
        # termination check is amortized — but each extra block past
        # all-done is pure waste, so BLK shrinks when the per-iteration
        # body is expensive (BVH scenes: ~100x the small-scene body).
        BLK = 64 if scene.geom.num_tris <= 1024 else 8
        run_body = machine_body if use_machine else body
        # the caller sizes K in classic bounce-iterations; a machine
        # iteration is one traversal window (~1/3 bounce incl. the
        # shadow walk), so the bound scales — the loop still exits the
        # moment every sample completes
        if use_machine:
            # it_base scales with K so continuation dispatches keep
            # disjoint per-iteration rng streams
            K_eff, it0 = K * MACHINE_ITER_MULT, it_base * MACHINE_ITER_MULT
        else:
            K_eff, it0 = K, it_base

        if use_queue:
            def w_cond(st):
                c, it = st
                # a lane can make progress unless it is flush-stalled
                # (item done, slot buffer full); a fresh claim is
                # possible while the queue has items and a lane is free
                can_work = (c["pix"] >= 0) & ~(
                    (c["done"] >= _lane_spp(c["pix"]))
                    & (c["slot_i"] >= n_slots))
                return (it < it0 + K_eff) & (
                    jnp.any(can_work)
                    | ((c["qhead"] < qend) & jnp.any(c["pix"] < 0)))
        else:
            def w_cond(st):
                c, it = st
                return (it < it0 + K_eff) & ~jnp.all(c["done"] >= spp)

        def w_body(st):
            c, it = st
            c2, _ = jax.lax.scan(run_body, c, it + jnp.arange(BLK))
            return (c2, it + BLK)

        carry, _ = jax.lax.while_loop(
            w_cond, w_body, (carry0, jnp.int32(it0)))
        outs = None
    elif use_machine:
        # machine-record scan: a machine iteration advances most lanes
        # one full bounce (mean walk ~6 steps < SEG_B), but walks longer
        # than one window need a second iteration — size the static scan
        # ~25% past the classic per-bounce budget so record-tail
        # truncation stays in the classic path's measured <1% regime.
        # In QUEUE mode K IS the scan length: the queue drains across
        # continuation dispatches, so slab-completion sizing is moot and
        # K instead bounds the [K, L] stacked-record memory (it_base
        # spacing of K per dispatch keeps rng streams disjoint since
        # MACHINE_ITER_MULT >= 2 > 5/4).
        K_m = int(K) if use_queue else int(K) * 5 // 4 + 8
        it0_m = it_base * MACHINE_ITER_MULT
        if use_queue:
            carry, outs = _record_queue_loop(
                machine_body, carry0, K_m, it0_m, _lane_spp, n_slots,
                qend)
        else:
            carry, outs = jax.lax.scan(
                machine_body, carry0, it0_m + jnp.arange(K_m))
    elif use_queue:
        carry, outs = _record_queue_loop(
            body, carry0, int(K), it_base, _lane_spp, n_slots, qend)
    else:
        carry, outs = jax.lax.scan(body, carry0, it_base + jnp.arange(K))

    vertices = None
    if cfg.record_vertices:
        # Segmented EXCLUSIVE suffix sum of the per-iteration light stream
        # S[k] = H[k] (emitter/env hits at k's intersect) + N[k] (NEE at
        # k's shade), reset at `fresh` segment starts. The vertex shaded
        # at iteration k sees rad[k] = sum_{j>k, same path} S[j]: that is
        # exactly the classic loop's own(l_hit) + later-slots rule, since
        # its own segment's emitter hit lands at iteration k+1. For
        # nee=always the classic rule drops the own l_hit, so subtract
        # the in-segment H[k+1].
        slots = outs["slot"]          # [K, L, 3]
        fresh = outs["fresh"]         # [K, L] segment starts

        def suffix_step(nxt, xs):
            s, fr = xs
            out = nxt  # exclusive: light strictly after this iteration
            nxt2 = jnp.where(fr[..., None], 0.0, s + nxt)
            return nxt2, out

        _, later = jax.lax.scan(
            suffix_step, jnp.zeros_like(slots[0]),
            (slots, fresh), reverse=True)
        rad = later
        if cfg.nee_always:
            h = outs["hitlight"]
            h_next = jnp.concatenate(
                [jnp.where(fresh[1:][..., None], 0.0, h[1:]),
                 jnp.zeros_like(h[:1])], axis=0)
            rad = rad - h_next
        vert = outs["vert"]
        vert["radiance"] = rad
        vertices = dict(bsdf=vert, nee=outs["nee"])

    if use_queue:
        # final flush of pixels that completed on the last iteration,
        # then one scatter of the banked slots into the film. Slot
        # pixels are globally unique (a pixel is owned by one lane until
        # flushed exactly once); empty slots route to the padded
        # dump row n_film - 1 — callers size n_film = n_pix + 1.
        carry = dict(carry, **queue_flush(carry))
        idx = carry["slot_pix"].ravel()
        idx = jnp.where(idx < 0, n_film - 1, idx)
        film = film.at[idx].add(carry["slot_acc"].reshape(-1, 8))
        carry["film"] = film
        carry["slot_pix"] = jnp.full((L, n_slots), -1, jnp.int32)
        carry["slot_i"] = jnp.zeros(L, jnp.int32)
        all_done = (carry["qhead"] >= qend) & jnp.all(carry["pix"] < 0)
    else:
        all_done = jnp.all(carry["done"] >= spp)
    out = dict(rgb=carry["acc"], rgb2=carry["acc2"],
               w=carry["done"].astype(jnp.float32),
               n_rays=carry["n_rays"], n_vertices=carry["vsum"],
               started=carry["started"],
               done=carry["done"], all_done=all_done,
               vertices=vertices)
    if "mi" in carry:
        out.update(mi=carry["mi"], mi_alive=carry["mi_alive"],
                   mi_walks=carry["mi_walks"])
    return out, carry
