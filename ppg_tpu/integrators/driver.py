"""Render drivers: chunked wavefront rendering into film buffers.

The reference parallelizes over 32x32 pixel blocks pulled by worker
threads (librender/renderproc.cpp); on TPU the image is a flat lane pool
processed in fixed-size chunks inside jit, each chunk = one wavefront
launch. Chunking bounds the SoA path-state memory, the film is a
scatter-add target donated across chunk calls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..render.film import Film
from ..render.sensor import make_sensor
from ..utils import heartbeat
from .wavefront import DeviceScene, PTConfig, trace_paths


def make_config(sc, **overrides) -> PTConfig:
    import numpy as np

    from ..scene.scene import (MAT_COATING, MAT_MASK, MAT_NULL,
                               MAT_ROUGHCOATING)

    ip = sc.integrator
    nee = str(ip.get("nee", "never"))
    kw = dict(
        max_depth=int(ip.get("maxDepth", -1)),
        rr_depth=int(ip.get("rrDepth", 5)),
        strict_normals=bool(ip.get("strictNormals", False)),
        hide_emitters=bool(ip.get("hideEmitters", False)),
        do_nee=nee != "never",
        nee_always=nee == "always",
        bsdf_fraction=float(ip.get("bsdfSamplingFraction", 0.5)),
        has_env=sc.env_emitter is not None,
        has_tex=bool(sc.textures is not None and sc.textures.specs),
        has_tex_ewa=bool(
            sc.textures is not None
            and any(s.otype == "bitmap"
                    and str(s.props.get("filterType", "ewa")).lower()
                    == "ewa"
                    for s in sc.textures.specs)
        ),
        has_tex_opacity=bool(
            sc.materials is not None
            and np.any(np.asarray(sc.materials.tex_opacity) >= 0)
        ),
        has_mask=bool(
            sc.materials is not None
            and np.any(np.asarray(sc.materials.mtype) == MAT_MASK)
        ),
        has_null=bool(
            sc.materials is not None
            and np.any(np.asarray(sc.materials.mtype) == MAT_NULL)
        ),
        has_media=bool(getattr(sc, "media", None)),
        has_hetero=bool(any(m.get("hetero") for m in
                            getattr(sc, "media", None) or ())),
        has_bump=bool(
            sc.materials is not None
            and np.any(np.asarray(sc.materials.tex_bump) >= 0)
        ),
        has_blend=bool(
            sc.materials is not None
            and np.any(np.asarray(sc.materials.nested2) >= 0)
        ),
        has_coating=bool(
            sc.materials is not None
            and np.any(np.isin(np.asarray(sc.materials.mtype),
                               (MAT_COATING, MAT_ROUGHCOATING)))
        ),
        has_vertexcolors=getattr(sc, "colors", None) is not None,
        has_wireframe=bool(
            sc.textures is not None
            and any(s.otype == "wireframe" for s in sc.textures.specs)
        ),
        has_subsurf=bool(any(
            r.get("kind", "dipole") == "dipole"
            for r in getattr(sc, "subsurfaces", None) or ())),
        has_sss=bool(any(
            r.get("kind", "dipole") == "singlescatter"
            for r in getattr(sc, "subsurfaces", None) or ())),
        sampler=str(sc.sampler.get("type", "independent")),
    )
    kw.update(overrides)
    return PTConfig(**kw)


@partial(jax.jit, static_argnames=("cfg", "sensor", "film", "chunk"),
         donate_argnames=("buffers",))
def _render_chunk(scene, cfg, sensor, film, chunk, buffers, key, pix_start,
                  sdtree=None, sample_idx=0):
    W = sensor.W
    ids = pix_start + jnp.arange(chunk)
    px = (ids % W).astype(jnp.float32)
    py = (ids // W).astype(jnp.float32)
    if cfg.sampler != "independent":
        from ..render import samplers as S

        jit2 = S.draw(cfg.sampler, ids, sample_idx, 0, key, (chunk, 2))
    else:
        jit2 = jax.random.uniform(jax.random.fold_in(key, 17), (chunk, 2))
    pos = jnp.stack([px, py], -1) + jit2
    u_lens = (jax.random.uniform(jax.random.fold_in(key, 19), (chunk, 2))
              if sensor.needs_lens_sample else None)
    o, d, tmin, tmax = sensor.sample_rays(pos, u_lens)
    out = trace_paths(scene, cfg, key, o, d, tmin, tmax, sdtree=sdtree,
                      sensor=sensor,
                      pixel_ids=ids, sample_idx=sample_idx)
    li = out["li"]
    valid = ids < W * sensor.H
    if film.rfilter == "box":
        buffers = film.splat_box_linear(buffers, pix_start, li, valid)
    else:
        li = jnp.where(valid[..., None], li, 0.0)
        pos = jnp.where(valid[..., None], pos, -100.0)
        buffers = film.splat(buffers, pos, li)
    return buffers, out["vertices"]


@partial(jax.jit,
         static_argnames=("cfg", "sensor", "L", "n_film", "n_blocks",
                          "n_slots"),
         donate_argnames=("carry",))
def _regen_dispatch(scene, cfg, key, salt, sensor, pix_start, L, spp, K,
                    carry, it_base, qstart=None, qend=None, n_film=None,
                    n_blocks=1, n_slots=16):
    # K is a traced while_loop bound here (cfg.record_vertices must be
    # False — the record-stacking scan needs a static K). The per-chunk
    # key derivation (fold_in) happens INSIDE the jit: an eager fold_in
    # per dispatch costs a device round-trip on the TPU tunnel (~10+ ms)
    # and serializes the dispatch pipeline. Callers pass plain numpy
    # scalars for salt/pix_start/spp/K/it_base for the same reason.
    # qstart/qend/n_film switch on pixel-queue mode (see trace_regen).
    from .regen import trace_regen

    key = jax.random.fold_in(key, salt)
    return trace_regen(scene, cfg, key, sensor, pix_start, L, spp, K,
                       carry=carry, it_base=it_base,
                       qstart=qstart, qend=qend, n_film=n_film,
                       n_blocks=n_blocks, n_slots=n_slots)


def regen_eligible(sc, cfg):
    """The regenerative tracer covers box-filter, independent-sampler,
    media-free, record-free renders; everything else uses the classic
    fixed-bounce wavefront."""
    return (not cfg.has_media and not cfg.has_subsurf
            and not cfg.has_sss
            and cfg.sampler == "independent"
            and str(sc.film.get("rfilter", "box")) == "box"
            and not cfg.record_vertices)


def render_regen(sc, spp, seed=0, chunk=1 << 16, cfg=None, scene_dev=None,
                 K=None, queue=True):
    """Render with the persistent-wavefront regenerative tracer
    (integrators/regen.py). Requires the box rfilter (jitter within
    the pixel), independent sampler, and a media-free scene — callers
    fall back to render() otherwise.

    queue=True (default): the whole image is one shared pixel queue
    served by a `chunk`-lane pool — lanes that finish a pixel's spp
    claim the next unrendered pixel, so occupancy stays near 1 until
    the global tail (measured 3x+ over the fixed binding on kitchen).
    queue=False keeps the legacy fixed lane<->pixel chunks (used by the
    equal-seed agreement tests)."""
    dev = scene_dev if scene_dev is not None else DeviceScene.from_scene(sc)
    cfg = cfg or make_config(sc, guiding=False)
    W, H = sc.film["width"], sc.film["height"]
    sensor = make_sensor(sc.sensor, sc.film)
    n_pix = W * H
    base = jax.random.key(seed)
    spp_t = np.int32(spp)

    def run(key, salt, **kw):
        return _regen_dispatch(dev, cfg, key, salt, **kw)

    if queue:
        n_chunks = (n_pix + chunk - 1) // chunk
        # per-dispatch watchdog bound: capped so one dispatch stays well
        # under the TPU kernel watchdog; the while_loop exits early on
        # queue exhaustion, extra dispatches continue the carry
        need = n_chunks * (spp * 24 + 64)
        K = K or min(need, 4000)
        # sample-block items shorten the drain tail to ~one block's
        # duration (8 samples x path length) at queue exhaustion; a lane
        # that banks QUEUE_SLOTS blocks stalls until the next dispatch
        # drains its slots, so budget extra dispatches for that
        n_blocks = max(1, (spp + 7) // 8)
        # size the slot buffers for the expected items per lane so a
        # dispatch almost never stalls on full slots
        n_slots = int(min(np.ceil(n_pix * n_blocks / chunk) + 4, 96))
        max_disp = need // K + spp // 8 + 8
        carry = None
        prev_done = None
        for i in range(max_disp):
            out, carry = run(
                base, np.int32(i), sensor=sensor, pix_start=np.int32(0),
                L=chunk, spp=spp_t, K=np.int32(K), carry=carry,
                it_base=np.int32(i * K), qstart=np.int32(0),
                qend=np.int32(n_pix * n_blocks), n_film=n_pix + 1,
                n_blocks=n_blocks, n_slots=n_slots)
            # overlapped termination check: sync the PREVIOUS dispatch's
            # all_done while this one computes — a per-dispatch host
            # round-trip on the TPU tunnel (~30 ms) otherwise serializes
            # the pipeline (the r2->r3 cbox throughput regression).
            # all_done is monotone and a post-done dispatch is a cheap
            # no-op, so lagging the check one dispatch is safe.
            if prev_done is not None and bool(prev_done):
                break
            prev_done = out["all_done"]
            heartbeat.beat()
        film = np.asarray(carry["film"])[:n_pix]
        rgb = film[:, :3].reshape(H, W, 3)
        wsum = film[:, 6].reshape(H, W)
        return rgb / np.maximum(wsum, 1e-20)[..., None]

    # legacy fixed-binding path: one dispatch chain per pixel chunk
    K = K or (spp * 24 + 64)
    rgb = np.zeros((((n_pix + chunk - 1) // chunk) * chunk, 3), np.float32)
    wsum = np.zeros(rgb.shape[0], np.float32)
    max_disp = (spp * 24) // K + 8
    K_t = np.int32(K)
    for c in range((n_pix + chunk - 1) // chunk):
        carry = None
        out = prev_done = None
        for i in range(max_disp):
            out, carry = run(
                base, np.int32(c * max_disp + i),
                sensor=sensor, pix_start=np.int32(c * chunk),
                L=chunk, spp=spp_t, K=K_t, carry=carry,
                it_base=np.int32(i * K))
            # overlapped termination check: sync the PREVIOUS dispatch's
            # all_done while this one computes (all_done is monotone and
            # a post-done dispatch is a cheap no-op)
            if prev_done is not None and bool(prev_done):
                break
            prev_done = out["all_done"]
        rgb[c * chunk:(c + 1) * chunk] = np.asarray(out["rgb"])
        wsum[c * chunk:(c + 1) * chunk] = np.asarray(out["w"])
        heartbeat.beat()
    rgb = rgb[:n_pix].reshape(H, W, 3)
    wsum = wsum[:n_pix].reshape(H, W)
    return rgb / np.maximum(wsum, 1e-20)[..., None]


def ensure_subsurface(sc, dev):
    """Populate dev.subsurf with the dipole irradiance point cloud and
    dev.sss with the singlescatter constants (cached on the scene; a
    no-op for scenes without subsurfaces)."""
    rows = getattr(sc, "subsurfaces", None)
    if not rows:
        return dev
    if any(r.get("kind", "dipole") == "dipole" for r in rows):
        cached = getattr(sc, "_subsurf_cache", None)
        if cached is None:
            from ..subsurface import build_subsurface

            cached = build_subsurface(sc, dev)
            sc._subsurf_cache = cached
        dev.subsurf = cached
    if any(r.get("kind", "dipole") == "singlescatter" for r in rows):
        cached = getattr(sc, "_sss_cache", None)
        if cached is None:
            from ..singlescatter import build_sss

            cached = build_sss(sc, dev)
            sc._sss_cache = cached
        dev.sss = cached
    return dev


def render(sc, spp, seed=0, chunk=1 << 16, cfg=None, scene_dev=None,
           squared=False):
    """Render `spp` samples per pixel; returns float32 [H,W,3] (and the
    squared-sample accumulation when squared=True, for variance tracking)."""
    dev = scene_dev if scene_dev is not None else DeviceScene.from_scene(sc)
    dev = ensure_subsurface(sc, dev)
    cfg = cfg or make_config(sc, guiding=False)
    W, H = sc.film["width"], sc.film["height"]
    sensor = make_sensor(sc.sensor, sc.film)
    film = Film(W, H, sc.film.get("rfilter", "box"))
    is_box = film.rfilter == "box"
    buffers = film.zeros_flat(chunk) if is_box else film.zeros()

    n_chunks = (W * H + chunk - 1) // chunk
    base = jax.random.key(seed)
    for s in range(spp):
        for c in range(n_chunks):
            key = jax.random.fold_in(jax.random.fold_in(base, s), c)
            buffers, _ = _render_chunk(
                dev, cfg, sensor, film, chunk, buffers, key,
                jnp.int32(c * chunk), sample_idx=jnp.int32(s),
            )
        jax.block_until_ready(buffers)
        heartbeat.beat()
    if is_box:
        buffers = film.unflatten(buffers)
    img = np.asarray(Film.develop(buffers))
    return img
