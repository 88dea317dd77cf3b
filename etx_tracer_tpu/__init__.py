"""etx-tracer-tpu: a TPU-native physically-based spectral ray tracing framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of etx-tracer
(reference: serhii-rieznik/etx-tracer): path tracing / BDPT / VCM integrators,
full-spectral rendering, a rich BSDF set, volumetric media, subsurface
scattering and area/environment/directional/atmosphere emitters.

Unlike the reference (CPU megakernel over Embree + dormant CUDA/OptiX
wavefront kernels), everything here is designed TPU-first:

- wavefront rendering over SoA ray queues (fixed shapes, `lax.while_loop`),
- ray/triangle intersection + BVH traversal as batched vector ops and
  Pallas kernels,
- film accumulation as scatter-adds on sharded arrays,
- multi-chip scaling via `jax.sharding.Mesh` + `shard_map` with XLA
  collectives (psum over films) instead of task schedulers/atomics.
"""

__version__ = "0.1.0"

from etx_tracer_tpu.core import math as cmath  # noqa: F401
