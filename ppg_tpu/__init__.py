"""ppg_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of practical path guiding.

Wavefront path tracer + learned SD-tree guiding with the capabilities of
Tom94/practical-path-guiding (Mitsuba GuidedPathTracer), re-designed for
TPU hardware. See SURVEY.md at the repo root for the reference map.
"""
__version__ = "0.1.0"
