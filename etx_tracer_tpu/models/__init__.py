"""Integrators ("model families"): path tracing, BDPT, VCM, debug AOVs.

TPU-native counterparts of the reference's rt/integrators/: instead of
per-pixel megakernel loops on a thread pool, each integrator is a jitted
wavefront step over SoA ray-state arrays, iterated with `lax.while_loop`.
"""

from etx_tracer_tpu.models import path_tracing  # noqa: F401
