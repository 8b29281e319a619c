"""ppg_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of practical path guiding.

Wavefront path tracer + learned SD-tree guiding with the capabilities of
Tom94/practical-path-guiding (Mitsuba GuidedPathTracer), re-designed for
TPU hardware. See SURVEY.md at the repo root for the reference map.
"""
__version__ = "0.1.0"

import os as _os


def enable_compilation_cache(path=None):
    """Persistent XLA compilation cache: renderer programs are large
    (25-60 s compiles for the fused guided-pass scan) and identical
    across runs of the same scene config, so disk caching removes most
    of a render's warmup. Called by the CLI/bench/GuidedPathTracer;
    set PPG_TPU_NO_COMPILATION_CACHE=1 to opt out."""
    if _os.environ.get("PPG_TPU_NO_COMPILATION_CACHE"):
        return
    import jax

    path = path or _os.environ.get(
        "PPG_TPU_COMPILATION_CACHE",
        _os.path.expanduser("~/.cache/ppg_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs: run uncached
        pass
